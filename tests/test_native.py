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
    for n in (0, 1, 7, 256, 4096):
        buf = np.ascontiguousarray(rng.integers(0, 256, n, dtype=np.uint8))
        crc = 0xFFFF
        for b in buf.tolist():
            crc = (crc >> 8) ^ int(CRC_TABLE[(crc ^ b) & 0xFF])
        if n:
            # argtypes=c_char_p: bytes pass straight through
            got = lib.l2h_crc16_ccitt(buf.tobytes(), n, 0xFFFF)
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


def test_native_raw_frame_parser_matches_python(lib):
    """l2h_parse_raw_frame (the bulk-replay fast path) must agree with
    the Python protobuf decoder on every field, and fall back cleanly
    on malformed bodies."""
    import dumpvdl2_tpu.io.rawframes as rf
    from dumpvdl2_tpu.core.metadata import MsgMetadata

    cases = []
    r = np.random.default_rng(9)
    for i in range(200):
        md = MsgMetadata(
            version=int(r.integers(0, 3)),
            station_id=None if i % 3 else "ST-%d" % i,
            freq=int(r.integers(0, 1 << 31)),
            frame_pwr_dbfs=float(r.normal()) if i % 2 else 0.0,
            nf_pwr_dbfs=float(r.normal()),
            ppm_error=float(r.normal()),
            burst_timestamp=float(r.integers(0, 1 << 40)) / 64.0,
            datalen_octets=int(r.integers(0, 4000)),
            synd_weight=int(r.integers(0, 3)),
            num_fec_corrections=int(r.integers(0, 30)),
            idx=int(r.integers(0, 8)))
        frame = r.integers(0, 256, int(r.integers(0, 300)),
                           dtype=np.uint8).tobytes()
        cases.append(rf.encode_raw_frame(md, frame))

    saved = rf._NATIVE_LIB
    try:
        for body in cases:
            rf._NATIVE_LIB = None            # force the Python path
            py = rf.decode_raw_frame(body)
            rf._NATIVE_LIB = saved if saved else lib
            nat = rf.decode_raw_frame(body)
            assert bytes(nat.frame) == bytes(py.frame)
            for f in ("version", "station_id", "freq", "datalen_octets",
                      "synd_weight", "num_fec_corrections", "idx"):
                assert getattr(nat.metadata, f) == getattr(py.metadata, f)
            for f in ("frame_pwr_dbfs", "nf_pwr_dbfs", "ppm_error",
                      "burst_timestamp"):
                assert getattr(nat.metadata, f) == \
                    pytest.approx(getattr(py.metadata, f), abs=1e-9)
    finally:
        rf._NATIVE_LIB = saved

    # malformed input: native parser refuses, Python raises either way
    rf._NATIVE_LIB = saved if saved else lib
    try:
        with pytest.raises(Exception):
            rf.decode_raw_frame(b"\xff\xff\xff\xff")
    finally:
        rf._NATIVE_LIB = saved


def test_native_raw_frame_parser_fuzz_no_crash(lib):
    """Adversarial bodies — random bytes, truncations, and length
    varints with bit 63 set (the signed-compare bounds bypass fixed in
    round 4) — must never crash the native parser; where it refuses
    (-1) the Python spec path is the fallback."""
    import ctypes

    import dumpvdl2_tpu.io.rawframes as rf

    m = rf._RawMeta()
    r = np.random.default_rng(0xF00D)
    bodies = [bytes(r.integers(0, 256, int(n), dtype=np.uint8))
              for n in r.integers(0, 64, 300)]
    # field-1 (metadata, wire 2) with a huge 10-byte length varint:
    # value has bit 63 set -> (int64_t)v is negative
    huge = b"\x0a" + b"\xff" * 9 + b"\x01" + b"payload"
    bodies.append(huge)
    bodies.append(b"\x0a\xff\xff\xff\xff\x0f" + b"x")   # 2^32-ish len
    bodies.append(b"\x12" + b"\xff" * 9 + b"\x01")      # frame field
    # nested: valid metadata wrapper, huge inner station-id length
    inner = b"\x0a" + b"\xff" * 9 + b"\x01"
    bodies.append(bytes([0x0a, len(inner)]) + inner)
    # genuine record truncated at every byte
    from dumpvdl2_tpu.core.metadata import MsgMetadata
    good = rf.encode_raw_frame(
        MsgMetadata(freq=136975000, station_id="XX",
                    burst_timestamp=1.5), b"frame!")
    bodies += [good[:k] for k in range(len(good))]

    for body in bodies:
        rc = lib.l2h_parse_raw_frame(body, len(body), ctypes.byref(m))
        assert rc in (0, -1)
        if rc == 0:
            # offsets the wrapper will slice with must be in bounds
            assert 0 <= m.frame_off <= len(body)
            assert 0 <= m.frame_len <= len(body) - m.frame_off
            assert 0 <= m.station_off <= len(body)
            assert 0 <= m.station_len <= len(body) - m.station_off
