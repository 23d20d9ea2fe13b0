/* Native host-side L2 tail: HDLC bit-unstuffing and CRC-16-CCITT.
 *
 * These are the only inherently sequential per-burst operations left on
 * the host after the device L2 decode (fec/l2_tpu.py); at the
 * 256-channel target the Python loop becomes measurable, so they are
 * implemented natively (the reference's equivalents are
 * bitstream.c:109-150 and crc.c).  Semantics mirror
 * dumpvdl2_tpu/link/unstuff.py EXACTLY — the Python implementation
 * stays as the executable spec and both are differentially fuzzed
 * against the reference C in tests/test_l2_diff.py / test_native.py.
 *
 * Built by dumpvdl2_tpu/native/__init__.py with the system C compiler
 * into a per-user cache; everything degrades to the Python path when
 * no toolchain is present.
 */
#include <stdint.h>
#include <stddef.h>

/* Unstuff a descrambled burst payload into frames.
 *
 * src:        bit vector (one bit per byte), n bits
 * out_bits:   caller buffer, at least n bytes
 * lens:       per-frame bit counts (bits written back-to-back in
 *             out_bits), at most max_frames entries
 * Returns the number of frames produced; *err is set to 1 when the
 * stream ended in an invalid stuffing sequence AFTER those frames
 * (seven consecutive ones, or a flag before 8 accumulated bits).
 */
int l2h_unstuff_frames(const uint8_t *src, int32_t n, uint8_t *out_bits,
                       int32_t *lens, int32_t max_frames, int32_t *err) {
    int32_t pos = 0, nframes = 0, total = 0;
    *err = 0;
    while (pos < n) {
        int32_t ones = 0, len = 0, closed = 0;
        uint8_t *dst = out_bits + total;
        while (pos < n) {
            uint8_t bit = src[pos++];
            if (bit == 0 && ones == 5) {        /* stuffed zero */
                ones = 0;
                continue;
            }
            if (bit == 1) {
                ones++;
                if (ones > 6) {                 /* 7 consecutive ones */
                    *err = 1;
                    return nframes;
                }
            }
            dst[len++] = bit;
            if (bit == 0) {
                if (ones == 6) {                /* flag byte complete */
                    if (len == 8) {             /* opening flag */
                        len = 0;
                        ones = 0;
                        continue;
                    }
                    if (len < 8) {              /* flag at stream start */
                        *err = 1;
                        return nframes;
                    }
                    len -= 8;                   /* strip trailing flag */
                    closed = 1;
                    break;
                }
                ones = 0;
            }
        }
        if (nframes < max_frames) {
            lens[nframes++] = len;
            total += len;
        }
        if (!closed)
            break;
    }
    return nframes;
}

/* CRC-16-CCITT, reflected polynomial 0x8408 (crc.c equivalent). */
uint16_t l2h_crc16_ccitt(const uint8_t *data, int32_t len,
                         uint16_t crc_init) {
    static uint16_t table[256];
    static int have_table = 0;
    if (!have_table) {
        for (int b = 0; b < 256; b++) {
            uint16_t crc = (uint16_t)b;
            for (int i = 0; i < 8; i++)
                crc = (crc & 1) ? (uint16_t)((crc >> 1) ^ 0x8408)
                                : (uint16_t)(crc >> 1);
            table[b] = crc;
        }
        have_table = 1;
    }
    uint16_t crc = crc_init;
    for (int32_t i = 0; i < len; i++)
        crc = (uint16_t)((crc >> 8) ^ table[(crc ^ data[i]) & 0xFF]);
    return crc;
}

/* Descramble helper (x^15+x+1 LFSR keystream XOR), for completeness of
 * the native L2 tail; the device path normally handles this. */
void l2h_descramble(uint8_t *bits, int32_t n, uint16_t iv) {
    uint16_t lfsr = iv;
    for (int32_t i = 0; i < n; i++) {
        uint8_t fb = (uint8_t)((lfsr ^ (lfsr >> 14)) & 1);
        lfsr = (uint16_t)((lfsr >> 1) | (fb << 14));
        bits[i] ^= fb;
    }
}
