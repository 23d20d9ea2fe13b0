"""Native l2host library: build, parity vs the Python spec, fuzz."""
import numpy as np
import pytest

from dumpvdl2_tpu.link.crc import CRC_TABLE
from dumpvdl2_tpu.link.unstuff import UnstuffError, _frames_py
from dumpvdl2_tpu.native import load_l2host

rng = np.random.default_rng(8)


@pytest.fixture(scope="module")
def lib():
    lib = load_l2host()
    if lib is None:
        pytest.skip("no C toolchain available to build native helpers")
    return lib


def _native_frames(lib, bits):
    from dumpvdl2_tpu.link.unstuff import _frames_native
    frames = []
    try:
        for f in _frames_native(bits, lib):
            frames.append(f.tolist())
        return frames, None
    except UnstuffError:
        return frames, "err"


def _py_frames(bits):
    frames = []
    try:
        for f in _frames_py(bits):
            frames.append(f.tolist())
        return frames, None
    except UnstuffError:
        return frames, "err"


def test_native_crc_matches_python(lib):
    import ctypes
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for n in (0, 1, 7, 256, 4096):
        buf = np.ascontiguousarray(rng.integers(0, 256, n, dtype=np.uint8))
        crc = 0xFFFF
        for b in buf.tolist():
            crc = (crc >> 8) ^ int(CRC_TABLE[(crc ^ b) & 0xFF])
        if n:
            got = lib.l2h_crc16_ccitt(buf.ctypes.data_as(u8p), n, 0xFFFF)
            assert got == crc


def test_native_unstuff_matches_python_on_valid_streams(lib):
    from dumpvdl2_tpu.sim import stuff_frames
    for sizes in ([4], [16, 32], [1, 2, 3], [200]):
        frames = [bytes(rng.integers(0, 256, s, dtype=np.uint8))
                  for s in sizes]
        bits = stuff_frames(frames)
        assert _native_frames(lib, bits) == _py_frames(bits)


def test_native_unstuff_fuzz(lib):
    for trial in range(500):
        n = int(rng.integers(0, 300))
        bits = rng.integers(0, 2, n, dtype=np.uint8)
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, max(n - 8, 1)))
            bits[p:p + 7] = rng.choice(
                [np.array([0, 1, 1, 1, 1, 1, 1]),
                 np.array([1, 1, 1, 1, 1, 1, 0])])[:max(0, n - p)]
        assert _native_frames(lib, bits) == _py_frames(bits), trial


def test_native_descramble_matches_prbs(lib):
    import ctypes
    from dumpvdl2_tpu.constants import LFSR_IV
    from dumpvdl2_tpu.fec.scramble import PRBS
    u8p = ctypes.POINTER(ctypes.c_uint8)
    bits = np.ascontiguousarray(
        rng.integers(0, 2, 5000, dtype=np.uint8))
    ref = bits ^ PRBS[:5000]
    lib.l2h_descramble(bits.ctypes.data_as(u8p), 5000,
                       ctypes.c_uint16(LFSR_IV))
    assert np.array_equal(bits, ref)
