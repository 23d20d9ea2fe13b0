/* TEST-ONLY minimal libacars/list shim for the compiled demod oracle:
 * the struct layout matters (decode.c dereferences ->data). */
#ifndef _FAKE_LIBACARS_list_H
#define _FAKE_LIBACARS_list_H
typedef struct la_list la_list;
struct la_list {
    void *data;
    la_list *next;
};
la_list *la_list_next(la_list const *l);
void la_list_foreach(la_list *l, void (*cb)(void *, void *), void *ctx);
#endif
