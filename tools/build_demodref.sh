#!/bin/sh
# Build the TEST-ONLY compiled demod oracle: the reference's demod.c +
# decode.c + chebyshev.c + bitstream.c + crc.c + rs.c + libfec compiled
# against REAL reference headers, with fake glib/libacars shims
# (tools/demodref_stubs/) and the capture driver in
# tools/demod_ref_wrapper.c.  Used by tests/test_demod_diff.py to
# diff-test our demod metadata (sig/noise dBFS, ppm, frame bytes)
# against the reference's actual behavior on identical samples.
# The artifact lives under /tmp and is never shipped.
set -e
REF=${1:-/root/reference}
OUT=/tmp/demodref
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$OUT"
cp "$REF"/src/demod.c "$REF"/src/decode.c "$REF"/src/chebyshev.c \
   "$REF"/src/bitstream.c "$REF"/src/crc.c "$REF"/src/rs.c \
   "$REF"/src/dumpvdl2.h "$REF"/src/decode.h "$REF"/src/avlc.h \
   "$REF"/src/output-common.h "$REF"/src/reassembly.h \
   "$REF"/src/chebyshev.h "$REF"/src/fec.h "$REF"/src/kvargs.h \
   "$REF"/src/gs_data.h "$REF"/src/ac_data.h "$OUT/" 2>/dev/null || true
cp "$REF"/src/libfec/decode_rs_char.c "$REF"/src/libfec/init_rs_char.c \
   "$REF"/src/libfec/decode_rs.h "$REF"/src/libfec/init_rs.h \
   "$REF"/src/libfec/char.h "$REF"/src/libfec/rs-common.h "$OUT/"
cp -r "$HERE"/demodref_stubs/* "$OUT/"
cd "$OUT"
gcc -shared -fPIC -O1 -I. -o libdemodref.so \
    demod.c decode.c chebyshev.c bitstream.c crc.c rs.c \
    decode_rs_char.c init_rs_char.c \
    "$HERE/demod_ref_wrapper.c" -lm -lpthread
echo "built $OUT/libdemodref.so"
