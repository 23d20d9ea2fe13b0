/* TEST-ONLY ctypes wrapper around the reference's L2 primitives
 * (rs.c rs_verify, bitstream.c descrambler/unstuffer, crc.c) for the
 * differential oracle in tests/test_l2_diff.py.  Mirrors how
 * decode.c:259-380 drives them; never shipped with the framework. */
#include <stdint.h>
#include <string.h>
#include "dumpvdl2.h"

int ref_rs_init(void) {
    return rs_init();
}

/* In-place RS(255,249) errors+erasures decode; returns corrected count
 * or -1, exactly rs_verify (rs.c:32-49). */
int ref_rs_verify(uint8_t *data, int fec_octets) {
    return rs_verify(data, fec_octets);
}

uint16_t ref_crc16(uint8_t *data, uint32_t len, uint16_t init) {
    return crc16_ccitt(data, len, init);
}

/* Descramble nbits bits (one bit per byte) in place with the VDL2
 * LFSR from the given IV, via the reference bitstream machinery. */
int ref_descramble(uint8_t *bits, uint32_t nbits, uint16_t iv) {
    bitstream_t *bs = bitstream_init(nbits + 8);
    if (bs == NULL) return -1;
    for (uint32_t i = 0; i < nbits; i++)
        if (bitstream_append_msbfirst(bs, &bits[i], 1, 1) < 0) {
            bitstream_destroy(bs);
            return -1;
        }
    uint16_t lfsr = iv;
    bitstream_descramble(bs, &lfsr);
    memcpy(bits, bs->buf, nbits);
    bitstream_destroy(bs);
    return 0;
}

/* HDLC unstuff + flag framing over a bit vector, driving
 * bitstream_copy_next_frame the way decode.c:345-371 does.
 * Output: frame octets appended into out (LSB-first packing), per-frame
 * octet counts into frame_lens.  Returns the number of frames, or
 * -1 = unstuff error, -2 = truncated octets, -3 = internal error. */
int ref_unstuff_frames(const uint8_t *bits, uint32_t nbits,
                       uint8_t *out, int32_t *frame_lens, int max_frames) {
    bitstream_t *src = bitstream_init(nbits + 8);
    bitstream_t *dst = bitstream_init(nbits + 8);
    if (src == NULL || dst == NULL) return -3;
    for (uint32_t i = 0; i < nbits; i++)
        if (bitstream_append_msbfirst(src, &bits[i], 1, 1) < 0) return -3;
    int ret, nframes = 0;
    uint32_t pos = 0;
    while ((ret = bitstream_copy_next_frame(src, dst)) >= 0) {
        uint32_t flen = dst->end - dst->start;
        if (flen % 8 != 0) {
            bitstream_destroy(src); bitstream_destroy(dst);
            return -2;
        }
        uint32_t octets = flen / 8;
        if (nframes >= max_frames) break;
        if (octets > 0 &&
                bitstream_read_lsbfirst(dst, out + pos, octets, 8) < 0) {
            bitstream_destroy(src); bitstream_destroy(dst);
            return -3;
        }
        frame_lens[nframes++] = (int32_t)octets;
        pos += octets;
        if (ret == 0) break;
    }
    bitstream_destroy(src);
    bitstream_destroy(dst);
    return ret < 0 ? -1 : nframes;
}
