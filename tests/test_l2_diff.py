"""Differential fuzz of the L2 bit-level primitives vs the reference C.

Drives the reference's actual rs.c/libfec RS(255,249) decoder,
bitstream.c descrambler + HDLC unstuffer, and crc.c through a
test-only shared library (tools/build_l2ref.sh) and asserts our
NumPy/JAX implementations agree byte-for-byte on randomized inputs —
including error patterns beyond correction capacity and pathological
stuffing sequences.  Skipped when the library is absent.
"""
import ctypes
import os
import subprocess

import numpy as np
import pytest

from dumpvdl2_tpu.constants import LFSR_IV, RS_K, RS_N
from dumpvdl2_tpu.fec.rs import rs_verify
from dumpvdl2_tpu.fec.scramble import descramble
from dumpvdl2_tpu.link.crc import crc16_ccitt
from dumpvdl2_tpu.link.unstuff import UnstuffError, frames_from_bits
from dumpvdl2_tpu.utils.bits import pack_lsb

LIB = "/tmp/l2ref/libl2ref.so"
TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

rng = np.random.default_rng(20260819)


@pytest.fixture(scope="module")
def reflib():
    if not os.path.exists(LIB):
        build = os.path.join(TOOLS, "build_l2ref.sh")
        if os.path.exists("/root/reference/src/rs.c"):
            subprocess.run(["sh", build], capture_output=True)
    if not os.path.exists(LIB):
        pytest.skip("reference L2 differential lib not built")
    lib = ctypes.CDLL(LIB)
    lib.ref_rs_init.restype = ctypes.c_int
    lib.ref_rs_verify.restype = ctypes.c_int
    lib.ref_crc16.restype = ctypes.c_uint16
    lib.ref_crc16.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                              ctypes.c_uint32, ctypes.c_uint16]
    lib.ref_descramble.restype = ctypes.c_int
    lib.ref_unstuff_frames.restype = ctypes.c_int
    assert lib.ref_rs_init() == 0
    return lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------- RS


def _ref_rs(reflib, cw: np.ndarray, fec_octets: int):
    buf = cw.copy()
    ret = reflib.ref_rs_verify(_u8p(buf), fec_octets)
    return buf, ret


def _encode_rs(data249: np.ndarray) -> np.ndarray:
    """Systematic RS(255,249) encode via our GF tables (test helper)."""
    from dumpvdl2_tpu.fec.gf256 import gf_mul
    # generator poly roots alpha^(120+i), i=0..5, prim elem alpha^1
    from dumpvdl2_tpu.fec.gf256 import ALPHA_TO
    g = [1]
    for i in range(6):
        root = ALPHA_TO[(120 + i) % 255]
        ng = [0] * (len(g) + 1)
        for j, c in enumerate(g):
            ng[j] ^= gf_mul(c, root)
            ng[j + 1] ^= c
        g = ng
    gen = g[::-1]  # degree-high first
    msg = list(data249) + [0] * 6
    for i in range(249):
        coef = msg[i]
        if coef:
            for j in range(1, 7):
                msg[i + j] ^= gf_mul(gen[j], coef)
    return np.array(list(data249) + msg[249:], dtype=np.uint8)


def test_rs_differential_random_errors(reflib):
    """Valid codewords + 0..8 byte errors: ours == reference exactly."""
    from dumpvdl2_tpu.fec.rs_tpu import rs_verify_batch
    cases, fecs = [], []
    for trial in range(60):
        data = rng.integers(0, 256, RS_K, dtype=np.uint8)
        cw = _encode_rs(data)
        nerr = trial % 9
        pos = rng.choice(RS_N, size=nerr, replace=False)
        cw[pos] ^= rng.integers(1, 256, nerr, dtype=np.uint8)
        cases.append(cw)
        fecs.append(6)
    # shortened blocks: erase absent parity (fec_octets 2 or 4)
    for trial in range(30):
        data = rng.integers(0, 256, RS_K, dtype=np.uint8)
        cw = _encode_rs(data)
        fec = (2, 4)[trial % 2]
        cw[RS_K + fec:] = 0                     # absent parity zeroed
        nerr = trial % 3
        pos = rng.choice(RS_K + fec, size=nerr, replace=False)
        cw[pos] ^= rng.integers(1, 256, nerr, dtype=np.uint8)
        cases.append(cw)
        fecs.append(fec)
    # random garbage
    for _ in range(30):
        cases.append(rng.integers(0, 256, RS_N, dtype=np.uint8))
        fecs.append(6)

    batch_out, batch_cnt = rs_verify_batch(
        np.stack(cases), np.array(fecs, np.int32))
    batch_out, batch_cnt = np.asarray(batch_out), np.asarray(batch_cnt)
    for i, (cw, fec) in enumerate(zip(cases, fecs)):
        ref_buf, ref_ret = _ref_rs(reflib, cw, fec)
        ours_buf, ours_ret = rs_verify(cw.copy(), fec)
        assert ours_ret == ref_ret, f"case {i}: {ours_ret} != {ref_ret}"
        if ref_ret >= 0:
            assert np.array_equal(ours_buf, ref_buf), f"case {i}"
            assert batch_cnt[i] == ref_ret, f"case {i} (batch)"
            assert np.array_equal(batch_out[i], ref_buf), f"case {i} (batch)"
        else:
            assert batch_cnt[i] == -1, f"case {i} (batch fail flag)"


# ------------------------------------------------------------- CRC16


def test_crc16_differential(reflib):
    for n in (0, 1, 2, 16, 255, 1024):
        buf = rng.integers(0, 256, n, dtype=np.uint8)
        ours = crc16_ccitt(bytes(buf), 0xFFFF)
        ref = reflib.ref_crc16(_u8p(buf), n, 0xFFFF)
        assert ours == ref, n


# -------------------------------------------------------- descramble


def test_descramble_differential(reflib):
    for n in (1, 25, 100, 16825):
        bits = rng.integers(0, 2, n, dtype=np.uint8)
        ref_buf = bits.copy()
        assert reflib.ref_descramble(_u8p(ref_buf), n,
                                     ctypes.c_uint16(LFSR_IV)) == 0
        assert np.array_equal(descramble(bits), ref_buf), n


# ----------------------------------------------------------- unstuff


def _ref_unstuff(reflib, bits: np.ndarray):
    out = np.zeros(bits.size // 8 + 16, dtype=np.uint8)
    lens = np.zeros(64, dtype=np.int32)
    n = reflib.ref_unstuff_frames(
        _u8p(bits), bits.size, _u8p(out),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 64)
    if n < 0:
        return n, []
    frames, pos = [], 0
    for i in range(n):
        frames.append(bytes(out[pos:pos + lens[i]]))
        pos += lens[i]
    return n, frames


def _our_unstuff(bits: np.ndarray):
    try:
        frames = []
        for fb in frames_from_bits(bits):
            if fb.size % 8 != 0:
                return -2, []
            frames.append(bytes(pack_lsb(fb)) if fb.size else b"")
        return len(frames), frames
    except UnstuffError:
        return -1, []


def _stuffed_stream(frames: list[bytes]) -> np.ndarray:
    from dumpvdl2_tpu.sim import stuff_frames
    return stuff_frames(frames)


def test_unstuff_differential_valid(reflib):
    for sizes in ([4], [16, 32], [1, 2, 3], [100]):
        frames = [bytes(rng.integers(0, 256, s, dtype=np.uint8))
                  for s in sizes]
        bits = _stuffed_stream(frames)
        rn, rf = _ref_unstuff(reflib, bits)
        on, of = _our_unstuff(bits)
        # The reference emits a zero-length frame for an empty trailing
        # run; ours drops empties later — compare non-empty frames.
        assert (rn < 0) == (on < 0), (rn, on)
        assert [f for f in rf if f] == [f for f in of if f]


def test_unstuff_differential_fuzz(reflib):
    """Random bit strings biased toward flags and long 1-runs."""
    for trial in range(300):
        n = int(rng.integers(8, 400))
        bits = rng.integers(0, 2, n, dtype=np.uint8)
        # inject flag-like and stuffing-like runs
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, max(n - 8, 1)))
            pat = rng.choice([0, 1, 2])
            if pat == 0:
                bits[p:p + 8] = np.array([0, 1, 1, 1, 1, 1, 1, 0])[:n - p]
            elif pat == 1:
                bits[p:p + 7] = 1
            else:
                bits[p:p + 6] = np.array([1, 1, 1, 1, 1, 0])[:n - p]
        rn, rf = _ref_unstuff(reflib, bits)
        on, of = _our_unstuff(bits)
        if rn < 0 or on < 0:
            assert rn < 0 and on < 0, (trial, rn, on)
            # error class must match too (-1 unstuff vs -2 truncation)
            assert rn == on, (trial, rn, on)
        else:
            assert [f for f in rf if f] == [f for f in of if f], trial
