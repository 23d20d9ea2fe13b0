/* TEST-ONLY minimal glib shim: just enough GAsyncQueue surface for
 * decode.c; the real functions are stubbed in demod_ref_wrapper.c to
 * capture pushed frames instead of queueing them. */
#ifndef _FAKE_GLIB_H
#define _FAKE_GLIB_H
typedef void *gpointer;
typedef int gint;
typedef unsigned int guint;
typedef struct _GAsyncQueue GAsyncQueue;
GAsyncQueue *g_async_queue_new(void);
void g_async_queue_push(GAsyncQueue *queue, gpointer data);
gpointer g_async_queue_pop(GAsyncQueue *queue);
gint g_async_queue_length(GAsyncQueue *queue);
#endif
