/* TEST-ONLY minimal libacars/reassembly shim for the compiled demod oracle. */
#ifndef _FAKE_LIBACARS_reassembly_H
#define _FAKE_LIBACARS_reassembly_H
#include <libacars/libacars.h>
typedef struct la_reasm_ctx la_reasm_ctx;
la_reasm_ctx *la_reasm_ctx_new(void);
#endif
