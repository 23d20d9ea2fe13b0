/* TEST-ONLY stub standing in for the reference's dumpvdl2.h so that
 * rs.c, bitstream.c and crc.c compile in isolation for the
 * differential L2 oracle (see tools/build_l2ref.sh).  Provides only
 * the constants/macros/types those three translation units consume;
 * never shipped or linked into the framework. */
#ifndef L2REF_STUB_H
#define L2REF_STUB_H

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define RS_K 249
#define RS_N 255

#define debug_print(level, ...) do { } while(0)
#define debug_print_buf_hex(level, buf, len, ...) do { } while(0)

static inline void *xcalloc_stub(size_t nmemb, size_t size) {
    void *p = calloc(nmemb, size);
    if (p == NULL) abort();
    return p;
}
#define XCALLOC(nmemb, size) xcalloc_stub((nmemb), (size))
#define XFREE(ptr) do { free(ptr); ptr = NULL; } while(0)
#define NEW(type, x) type *(x) = XCALLOC(1, sizeof(type))
#define ONES(x) ~(~0u << (x))

typedef struct {
    uint8_t *buf;
    uint32_t start, end, len, descrambler_pos;
} bitstream_t;

bitstream_t *bitstream_init(uint32_t len);
int bitstream_append_msbfirst(bitstream_t *bs, uint8_t const *bytes,
                              uint32_t numbytes, uint32_t numbits);
int bitstream_append_lsbfirst(bitstream_t *bs, uint8_t const *bytes,
                              uint32_t numbytes, uint32_t numbits);
int bitstream_read_lsbfirst(bitstream_t *bs, uint8_t *bytes,
                            uint32_t numbytes, uint32_t numbits);
int bitstream_read_word_msbfirst(bitstream_t *bs, uint32_t *ret,
                                 uint32_t numbits);
int bitstream_copy_next_frame(bitstream_t *src, bitstream_t *dst);
void bitstream_descramble(bitstream_t *bs, uint16_t *lfsr);
void bitstream_reset(bitstream_t *bs);
void bitstream_destroy(bitstream_t *bs);

int rs_init(void);
int rs_verify(uint8_t *data, int fec_octets);
uint16_t crc16_ccitt(uint8_t *data, uint32_t len, uint16_t crc_init);

#endif
