/* TEST-ONLY minimal libacars/hash shim for the compiled demod oracle. */
#ifndef _FAKE_LIBACARS_hash_H
#define _FAKE_LIBACARS_hash_H
#include <stdbool.h>
#include <stdint.h>
typedef struct la_hash la_hash;
typedef uint32_t (la_hash_func)(void const *key);
typedef bool (la_hash_compare_func)(void const *key1, void const *key2);
typedef void (la_hash_key_destroy_func)(void *key);
typedef void (la_hash_value_destroy_func)(void *value);
#endif
