"""Parity: batched device L2 decode vs the scalar host burst decoder.

The scalar path (burst.decode_burst) is the executable spec; the
batched XLA path (fec/l2_tpu.py) must produce identical BurstResults
for every candidate — ok flag, failure reason, header fields, FEC
correction counts, and frame bytes.  Runs on the CPU backend here;
tests/test_tpu_hw.py smoke-tests the compiled TPU path.
"""
import numpy as np

from dumpvdl2_tpu.burst import decode_burst, decode_bursts_device
from dumpvdl2_tpu.sim import build_burst_bits, frame_with_fcs

S = 5616        # MAX_BURST_SYMS: production symbol window
rng = np.random.default_rng(7)


def _bits_to_syms(bits: np.ndarray) -> np.ndarray:
    """Pad a burst bit vector to the (S,) symbol window with noise."""
    pad = 3 * S - bits.size
    assert pad >= 0
    bits = np.concatenate([bits, rng.integers(0, 2, pad, dtype=np.uint8)])
    tri = bits.reshape(S, 3)
    return ((tri[:, 0] << 2) | (tri[:, 1] << 1) | tri[:, 2]).astype(np.uint8)


def _compare(res, ref):
    assert res.ok == ref.ok
    assert res.reason == ref.reason
    assert res.syndrome == ref.syndrome
    assert res.synd_weight == ref.synd_weight
    if ref.reason not in ("hdr_reserved_bits",):
        assert res.datalen == ref.datalen
    if ref.ok:
        assert res.datalen_octets == ref.datalen_octets
        assert res.bits_consumed == ref.bits_consumed
        assert res.num_fec_corrections == ref.num_fec_corrections
        assert [bytes(f) for f in res.frames] == \
            [bytes(f) for f in ref.frames]


def _burst_cases() -> list[np.ndarray]:
    cases = []
    for sizes in ([16], [64], [249], [1000], [16, 32], [100, 200, 50]):
        frames = [bytes(rng.integers(0, 256, s, dtype=np.uint8))
                  for s in sizes]
        cases.append(build_burst_bits(frames))
    # bit errors within RS correction capacity
    b = cases[3].copy()
    for pos in (40, 400, 800, 3000):
        b[pos] ^= 1
    cases.append(b)
    # header single-bit error
    b = cases[0].copy()
    b[5] ^= 1
    cases.append(b)
    # uncorrectable block (many errors in one RS block)
    b = cases[2].copy()
    b[100:200] ^= 1
    cases.append(b)
    # pure noise rows (usually bad header / too_long / no_fec)
    for seed in range(4):
        r = np.random.default_rng(seed)
        cases.append(r.integers(0, 2, 3 * S, dtype=np.uint8))
    return cases


def test_device_batch_matches_scalar():
    cases = _burst_cases()
    syms = np.stack([_bits_to_syms(c) for c in cases])
    batch = decode_bursts_device(syms, S)
    assert len(batch) == len(cases)
    for got, case_bits, sym_row in zip(batch, cases, syms):
        # scalar reference sees the identical (noise-padded) bit stream
        full_bits = ((sym_row[:, None] >> np.array([2, 1, 0])) & 1) \
            .astype(np.uint8).reshape(-1)
        ref = decode_burst(full_bits)
        _compare(got, ref)


def test_device_batch_max_length_burst():
    """A burst at the 0x3FFF-bit cap exercises all 9 RS blocks."""
    frames = [bytes(rng.integers(0, 256, 1990, dtype=np.uint8))]
    bits = build_burst_bits(frames)
    assert bits.size <= 3 * S
    res = decode_bursts_device(_bits_to_syms(bits)[None, :], S)[0]
    assert res.ok, res.reason
    assert res.num_blocks if hasattr(res, "num_blocks") else True
    assert [bytes(f) for f in res.frames] == [frame_with_fcs(frames[0])]
