"""Differential UPER test vs the reference's asn1c-generated codec.

The test-only oracle library (tools/build_asn1ref.sh) is built on
demand here — same pattern as dumpvdl2_tpu/native/__init__.py — so a
default ``pytest`` run executes all differential cases.  Skipped only
when the reference tree or a C toolchain is absent.
"""
import ctypes
import os
import random
import shutil
import subprocess

import pytest

from dumpvdl2_tpu.proto.asn1 import runtime as rt
from dumpvdl2_tpu.proto.asn1.tables_icao import SCHEMA

from test_asn1 import _gen_value

LIB = "/tmp/asn1ref/libasn1ref.so"

ROOTS = [
    # ACSE_apdu / Fully_encoded_data excluded: the reference's own
    # codec segfaults in uper_decode on EXTERNALt open types.
    "ATCUplinkMessage", "ATCDownlinkMessage", "CMAircraftMessage",
    "CMGroundMessage", "ADSAircraftPDUs", "ADSGroundPDUs", "ADSAccept",
    "ADSReject", "ADSReport", "ADSNonCompliance",
    "ADSPositiveAcknowledgement", "ADSRequestContract",
    "ProtectedAircraftPDUs", "ProtectedGroundPDUs",
]


TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


@pytest.fixture(scope="module")
def reflib():
    if not os.path.exists(LIB):
        build = os.path.join(TOOLS, "build_asn1ref.sh")
        if (os.path.isdir("/root/reference/src/asn1")
                and shutil.which("gcc")):
            subprocess.run(["sh", build], capture_output=True, timeout=600)
    if not os.path.exists(LIB):
        pytest.skip("reference asn1 differential lib not built")
    lib = ctypes.CDLL(LIB, mode=ctypes.RTLD_GLOBAL)
    lib.ref_uper_roundtrip.restype = ctypes.c_long
    return lib


@pytest.mark.parametrize("root", ROOTS)
def test_encoding_matches_reference_codec(reflib, root):
    rng = random.Random(0xA5 ^ (hash(root) & 0xFFFF))
    checked = 0
    for _ in range(40):
        try:
            v = _gen_value(SCHEMA, root, rng)
            enc = rt.encode(SCHEMA, root, v)
        except RecursionError:
            continue
        out = ctypes.create_string_buffer(4 * len(enc) + 64)
        n = reflib.ref_uper_roundtrip(root.encode(), enc, len(enc),
                                      out, len(out))
        assert n > 0, f"reference failed to decode our {root} encoding"
        assert out.raw[:n] == enc, f"{root}: byte mismatch vs reference"
        checked += 1
    assert checked >= 30
