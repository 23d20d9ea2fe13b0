/* TEST-ONLY ctypes wrapper that compiles the reference's ENTIRE
 * demod + burst-decode chain (demod.c, decode.c, chebyshev.c,
 * bitstream.c, rs.c, libfec) into a shared library and drives it the
 * way main() does (dumpvdl2.c:1148-1170): real barriers, a real
 * process_samples thread per channel, process_buf_short feeding.
 * glib / libacars are replaced by capture stubs so every frame the
 * reference decoder emits (metadata + octets) is recorded for the
 * differential tests in tests/test_demod_diff.py.  Never shipped. */
#define _GNU_SOURCE
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <glib.h>
#include "dumpvdl2.h"
#include "decode.h"
#include "avlc.h"
#include "output-common.h"

/* ------------------------------------------------- globals main() owns */
pthread_barrier_t demods_ready, samples_ready;
dumpvdl2_config_t Config;
int do_exit = 0;
extern float *sbuf;                  /* defined in demod.c */

/* ------------------------------------------------------- util.c subset */
void *xcalloc(size_t nmemb, size_t size, char const *file, int line,
              char const *func) {
    (void)file; (void)line; (void)func;
    void *ptr = calloc(nmemb, size);
    if (ptr == NULL) abort();
    return ptr;
}

void *xrealloc(void *ptr, size_t size, char const *file, int line,
               char const *func) {
    (void)file; (void)line; (void)func;
    ptr = realloc(ptr, size);
    if (ptr == NULL) abort();
    return ptr;
}

octet_string_t *octet_string_new(void *buf, size_t len) {
    octet_string_t *s = calloc(1, sizeof(octet_string_t));
    s->buf = buf;
    s->len = len;
    return s;
}

void octet_string_destroy(octet_string_t *s) {
    if (s != NULL) {
        free(s->buf);
        free(s);
    }
}

/* ------------------------------------------- capture of decoded frames */
#define MAX_EVTS 1024
#define FRAME_BUF (1 << 20)

typedef struct {
    float frame_pwr_dbfs, nf_pwr_dbfs, ppm_error;
    uint32_t datalen_octets, synd_weight;
    int32_t num_fec_corrections, idx, frame_len;
} capture_evt_t;

static capture_evt_t evts[MAX_EVTS];
static uint8_t frame_bytes[FRAME_BUF];
static size_t frame_pos;
static int n_evts;
static pthread_mutex_t cap_lock = PTHREAD_MUTEX_INITIALIZER;

/* glib stubs: the decoder queue becomes a capture sink */
GAsyncQueue *g_async_queue_new(void) { return (GAsyncQueue *)1; }
gpointer g_async_queue_pop(GAsyncQueue *q) { (void)q; return NULL; }
gint g_async_queue_length(GAsyncQueue *q) { (void)q; return 0; }

void g_async_queue_push(GAsyncQueue *q, gpointer data) {
    (void)q;
    avlc_frame_qentry_t *e = data;
    pthread_mutex_lock(&cap_lock);
    if (n_evts < MAX_EVTS && e != NULL && e->metadata != NULL) {
        capture_evt_t *c = &evts[n_evts++];
        c->frame_pwr_dbfs = e->metadata->frame_pwr_dbfs;
        c->nf_pwr_dbfs = e->metadata->nf_pwr_dbfs;
        c->ppm_error = e->metadata->ppm_error;
        c->datalen_octets = e->metadata->datalen_octets;
        c->synd_weight = e->metadata->synd_weight;
        c->num_fec_corrections = e->metadata->num_fec_corrections;
        c->idx = e->metadata->idx;
        c->frame_len = -1;
        if (e->frame != NULL && e->frame->buf != NULL
                && frame_pos + e->frame->len <= FRAME_BUF) {
            memcpy(frame_bytes + frame_pos, e->frame->buf, e->frame->len);
            frame_pos += e->frame->len;
            c->frame_len = (int32_t)e->frame->len;
        }
    }
    pthread_mutex_unlock(&cap_lock);
}

/* libacars / framework stubs referenced by decode.c's decoder thread
 * (never called here, but the symbols must resolve at load time) */
void la_proto_tree_destroy(la_proto_node *n) { (void)n; }
la_reasm_ctx *la_reasm_ctx_new(void) { return NULL; }
la_list *la_list_next(la_list const *l) { (void)l; return NULL; }
void la_list_foreach(la_list *l, void (*cb)(void *, void *), void *ctx) {
    (void)l; (void)cb; (void)ctx;
}
reasm_ctx *reasm_ctx_new() { return NULL; }
la_proto_node *avlc_parse(avlc_frame_qentry_t *q, uint32_t *msg_type,
                          reasm_contexts *rc) {
    (void)q; (void)msg_type; (void)rc; return NULL;
}
output_qentry_t *output_qentry_copy(output_qentry_t const *q) {
    (void)q; return NULL;
}

/* --------------------------------------------------------- driver API */
#define REF_MAX_SBUF (1 << 22)

static vdl2_channel_t *chan;
static pthread_t demod_tid;

int ref_demod_start(uint32_t centerfreq, uint32_t freq,
                    uint32_t sample_rate, uint32_t oversample) {
    Config.max_ppm = 0;
    sbuf = calloc(REF_MAX_SBUF, sizeof(float));
    if (sbuf == NULL) return -1;
    sincosf_lut_init();
    input_lpf_init(sample_rate);
    demod_sync_init();
    rs_init();
    avlc_decoder_init();
    chan = vdl2_channel_init(centerfreq, freq, sample_rate, oversample);
    if (pthread_barrier_init(&demods_ready, NULL, 2) != 0) return -2;
    if (pthread_barrier_init(&samples_ready, NULL, 2) != 0) return -2;
    if (pthread_create(&demod_tid, NULL, process_samples, chan) != 0)
        return -3;
    return 0;
}

/* Feed interleaved S16_LE IQ; nbytes must fit in REF_MAX_SBUF/2 int16s.
 * Blocks until the demod thread finished the previous buffer (barrier
 * discipline identical to process_iq_file, dumpvdl2.c:323-358). */
int ref_demod_feed_s16(uint8_t *buf, uint32_t nbytes) {
    if (nbytes / 2 > REF_MAX_SBUF) return -1;
    process_buf_short(buf, nbytes, NULL);
    return 0;
}

/* Wait until the demod thread has consumed the last buffer (it parks
 * on demods_ready again), then report captures. */
/* TERMINAL: feed one zero generation, then wait for the demod
 * thread to finish it (it parks on the next samples_ready).  After
 * flushing, no further ref_demod_feed_s16 calls are allowed —
 * mirrors main()'s post-EOF barrier wait (dumpvdl2.c:1170). */
int ref_demod_flush(void) {
    static uint8_t zeros[4];
    process_buf_short(zeros, sizeof(zeros), NULL);
    pthread_barrier_wait(&demods_ready);
    return n_evts;
}

int ref_demod_n_frames(void) { return n_evts; }

int ref_demod_get_frame(int i, capture_evt_t *out) {
    if (i < 0 || i >= n_evts) return -1;
    *out = evts[i];
    return 0;
}

int ref_demod_get_frame_bytes(int i, uint8_t *out, int cap) {
    if (i < 0 || i >= n_evts) return -1;
    size_t pos = 0;
    for (int k = 0; k < i; k++)
        if (evts[k].frame_len > 0) pos += (size_t)evts[k].frame_len;
    int len = evts[i].frame_len;
    if (len < 0 || len > cap) return -2;
    memcpy(out, frame_bytes + pos, (size_t)len);
    return len;
}

/* Demod state peeks for the noise-floor differential test */
double ref_demod_mag_nf(void) { return chan == NULL ? -1.0 : chan->mag_nf; }
double ref_demod_mag_lp(void) { return chan == NULL ? -1.0 : chan->mag_lp; }
