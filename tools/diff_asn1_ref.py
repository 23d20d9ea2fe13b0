#!/usr/bin/env python3
"""Differential test: our UPER codec vs the reference's asn1c codec.

For fuzzed values of every root PDU type: encode with OUR encoder, feed
the bytes to the reference codec (decode + re-encode), and require
byte-identical output.  Agreement proves our decoder sees the same
abstract value the reference would for any byte string our encoder can
produce (and the roundtrip test in tests/test_asn1.py closes the loop
decode(encode(v)) == v).

Build the reference .so first (test-only artifact, never shipped):
  mkdir -p /tmp/asn1ref && cd /tmp/asn1ref
  cp /root/reference/src/asn1/*.{c,h} . && rm converter-sample.c
  (write the libacars/vstring.h stub -- see tests/test_asn1_diff.py)
  gcc -shared -fPIC -O1 -I. -o libasn1ref.so *.c \
      /root/repo/tools/asn1_ref_wrapper.c
"""
from __future__ import annotations

import ctypes
import random
import sys

sys.path.insert(0, ".")

from dumpvdl2_tpu.proto.asn1 import runtime as rt            # noqa: E402
from dumpvdl2_tpu.proto.asn1.tables_icao import SCHEMA       # noqa: E402
from tests.test_asn1 import _gen_value                       # noqa: E402

LIB = "/tmp/asn1ref/libasn1ref.so"

ROOTS = {
    "ACSE_apdu": "ACSE-apdu",
    "Fully_encoded_data": "Fully-encoded-data",
    "ProtectedAircraftPDUs": "ProtectedAircraftPDUs",
    "ProtectedGroundPDUs": "ProtectedGroundPDUs",
    "ATCUplinkMessage": "ATCUplinkMessage",
    "ATCDownlinkMessage": "ATCDownlinkMessage",
    "CMAircraftMessage": "CMAircraftMessage",
    "CMGroundMessage": "CMGroundMessage",
    "ADSAircraftPDUs": "ADSAircraftPDUs",
    "ADSGroundPDUs": "ADSGroundPDUs",
    "ADSAccept": "ADSAccept",
    "ADSReject": "ADSReject",
    "ADSReport": "ADSReport",
    "ADSNonCompliance": "ADSNonCompliance",
    "ADSPositiveAcknowledgement": "ADSPositiveAcknowledgement",
    "ADSRequestContract": "ADSRequestContract",
}


def main(iters: int = 200) -> int:
    lib = ctypes.CDLL(LIB)
    lib.ref_uper_roundtrip.restype = ctypes.c_long
    lib.ref_uper_roundtrip.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_long]

    failures = 0
    total = 0
    for ourname, refname in ROOTS.items():
        rng = random.Random(0xC0FFEE ^ hash(ourname) & 0xFFFF)
        mismatch = decfail = 0
        for i in range(iters):
            try:
                v = _gen_value(SCHEMA, ourname, rng)
                enc = rt.encode(SCHEMA, ourname, v)
            except RecursionError:
                continue
            out = ctypes.create_string_buffer(4 * len(enc) + 64)
            n = lib.ref_uper_roundtrip(refname.encode(), enc, len(enc),
                                       out, len(out))
            total += 1
            if n < 0:
                decfail += 1
                if decfail <= 2:
                    print(f"  {ourname}[{i}]: ref decode FAILED rc={n} "
                          f"enc={enc.hex()[:80]}")
                continue
            ref_enc = out.raw[:n]
            if ref_enc != enc:
                mismatch += 1
                if mismatch <= 2:
                    print(f"  {ourname}[{i}]: MISMATCH\n"
                          f"    ours: {enc.hex()[:100]}\n"
                          f"    ref : {ref_enc.hex()[:100]}")
        status = "OK" if not (mismatch or decfail) else \
            f"mismatch={mismatch} decfail={decfail}"
        print(f"{ourname:30s} {status}")
        failures += mismatch + decfail
    print(f"total={total} failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 200))
