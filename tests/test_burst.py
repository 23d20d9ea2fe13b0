"""Round-trip tests: synthesized bursts through the L2 burst decoder."""
import numpy as np
import pytest

from dumpvdl2_tpu.burst import decode_burst, header_info
from dumpvdl2_tpu.fec.scramble import descramble
from dumpvdl2_tpu.sim import build_burst_bits, frame_with_fcs

rng = np.random.default_rng(42)


def _random_frames(sizes):
    return [bytes(rng.integers(0, 256, s, dtype=np.uint8)) for s in sizes]


@pytest.mark.parametrize("sizes", [[16], [64], [249], [1000],
                                   [16, 32], [100, 200, 50]])
def test_burst_roundtrip(sizes):
    frames = _random_frames(sizes)
    bits = build_burst_bits(frames)
    res = decode_burst(bits)
    assert res.ok, res.reason
    assert res.synd_weight == 0
    assert res.num_fec_corrections == 0
    got = [bytes(f) for f in res.frames]
    want = [frame_with_fcs(f) for f in frames]
    assert got == want


def test_burst_roundtrip_with_bit_errors():
    frames = _random_frames([300])
    bits = build_burst_bits(frames)
    # Flip 3 bits inside one RS block's payload region (post-header).
    bad = bits.copy()
    for pos in (40, 400, 800):
        bad[pos] ^= 1
    res = decode_burst(bad)
    assert res.ok, res.reason
    assert res.num_fec_corrections >= 1
    assert [bytes(f) for f in res.frames] == [frame_with_fcs(frames[0])]


def test_burst_header_error_corrected():
    frames = _random_frames([32])
    bits = build_burst_bits(frames)
    bad = bits.copy()
    bad[5] ^= 1  # single header bit error
    res = decode_burst(bad)
    assert res.ok, res.reason
    assert res.synd_weight == 1
    assert [bytes(f) for f in res.frames] == [frame_with_fcs(frames[0])]


def test_burst_trailing_bits_ignored():
    frames = _random_frames([64])
    bits = build_burst_bits(frames)
    extra = np.concatenate([bits, rng.integers(0, 2, 500, dtype=np.uint8)])
    res = decode_burst(extra)
    assert res.ok, res.reason
    assert [bytes(f) for f in res.frames] == [frame_with_fcs(frames[0])]


def test_header_info_reports_length():
    frames = _random_frames([64])
    bits = build_burst_bits(frames)
    info = header_info(descramble(bits)[:25])
    assert info.ok
    assert info.datalen_octets >= 66  # 64B + FCS + flags + stuffing
    assert info.bits_consumed <= bits.size
