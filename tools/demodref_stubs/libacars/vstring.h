/* TEST-ONLY minimal libacars/vstring shim for the compiled demod oracle. */
#ifndef _FAKE_LIBACARS_vstring_H
#define _FAKE_LIBACARS_vstring_H
#include <libacars/libacars.h>
typedef struct la_vstring la_vstring;
#endif
