/* TEST-ONLY minimal libacars/dict shim for the compiled demod oracle. */
#ifndef _FAKE_LIBACARS_dict_H
#define _FAKE_LIBACARS_dict_H
#include <libacars/libacars.h>
typedef struct { int id; void *val; } la_dict;
#endif
