#!/bin/sh
# Build the TEST-ONLY differential library wrapping the reference's
# asn1c-generated codec (see tools/diff_asn1_ref.py).  The library is a
# throwaway artifact under /tmp; it is never shipped or linked into the
# framework -- it exists solely so tests/test_asn1_diff.py can
# cross-validate dumpvdl2_tpu/proto/asn1/runtime.py byte-for-byte
# against the reference (src/asn1/*, asn1-util.c:29-110).
set -e
REF=${1:-/root/reference}
OUT=/tmp/asn1ref
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$OUT/libacars"
cp "$REF"/src/asn1/*.c "$REF"/src/asn1/*.h "$OUT/"
rm -f "$OUT"/converter-sample.c "$OUT"/converter-example.c
cp "$HERE/vstring_stub.h" "$OUT/libacars/vstring.h"
cd "$OUT"
gcc -shared -fPIC -O1 -I. -o libasn1ref.so ./*.c \
    "$HERE/asn1_ref_wrapper.c" -ldl 2>/dev/null
echo "built $OUT/libasn1ref.so"
