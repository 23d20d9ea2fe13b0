/* Minimal test-only stub of libacars' vstring API, just enough to
 * compile the reference's asn1c runtime for differential testing. */
#ifndef LA_VSTRING_H
#define LA_VSTRING_H
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
typedef struct { char *str; size_t len, allocated; } la_vstring;
static inline la_vstring *la_vstring_new(void) {
    la_vstring *v = calloc(1, sizeof *v);
    v->allocated = 64; v->str = calloc(1, v->allocated);
    return v;
}
static inline void la_vstring_destroy(la_vstring *v, int destroy_buffer) {
    if (!v) return;
    if (destroy_buffer) free(v->str);
    free(v);
}
static inline void la_vstring_append_buffer(la_vstring *v, const void *buf, size_t size) {
    if (v->len + size + 1 > v->allocated) {
        while (v->len + size + 1 > v->allocated) v->allocated *= 2;
        v->str = realloc(v->str, v->allocated);
    }
    memcpy(v->str + v->len, buf, size);
    v->len += size; v->str[v->len] = 0;
}
static inline void la_vstring_append_sprintf(la_vstring *v, const char *fmt, ...) {
    va_list ap; va_start(ap, fmt);
    va_list ap2; va_copy(ap2, ap);
    int n = vsnprintf(NULL, 0, fmt, ap);
    va_end(ap);
    if (n > 0) {
        char *s = malloc((size_t)n + 1);
        vsnprintf(s, (size_t)n + 1, fmt, ap2);
        la_vstring_append_buffer(v, s, (size_t)n);
        free(s);
    }
    va_end(ap2);
}
#endif
