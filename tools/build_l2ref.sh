#!/bin/sh
# Build the TEST-ONLY differential library wrapping the reference's L2
# primitives: rs.c + libfec (RS(255,249)), bitstream.c (descrambler,
# HDLC unstuffer), crc.c.  Used by tests/test_l2_diff.py to fuzz our
# JAX/NumPy implementations against the reference byte-for-byte.
# The artifact lives under /tmp and is never shipped or linked into
# the framework.
set -e
REF=${1:-/root/reference}
OUT=/tmp/l2ref
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$OUT"
cp "$REF"/src/rs.c "$REF"/src/bitstream.c "$REF"/src/crc.c \
   "$REF"/src/fec.h "$OUT/"
cp "$REF"/src/libfec/decode_rs_char.c "$REF"/src/libfec/init_rs_char.c \
   "$REF"/src/libfec/decode_rs.h "$REF"/src/libfec/init_rs.h \
   "$REF"/src/libfec/char.h "$REF"/src/libfec/rs-common.h "$OUT/"
cp "$HERE/l2ref_stub.h" "$OUT/dumpvdl2.h"
cd "$OUT"
gcc -shared -fPIC -O1 -I. -o libl2ref.so \
    rs.c bitstream.c crc.c decode_rs_char.c init_rs_char.c \
    "$HERE/l2_ref_wrapper.c"
echo "built $OUT/libl2ref.so"
