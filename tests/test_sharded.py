"""Multi-chip sharded pipeline vs single-device parity.

Runs on the 8-virtual-CPU-device mesh from conftest.py.  The sharded
(channel x time) step with ppermute halo exchange must find the same
sync points and demodulate the same symbols as the single-device fused
step.
"""
import jax
import numpy as np
import pytest

from dumpvdl2_tpu import sim
from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE, SYNC_THRESHOLD
from dumpvdl2_tpu.core.device import process_block
from dumpvdl2_tpu.dsp.chebyshev import fir_taps
from dumpvdl2_tpu.dsp.frontend import nco_dphi, prepare_taps, to_planar
from dumpvdl2_tpu.parallel.mesh import make_mesh
from dumpvdl2_tpu.parallel.sharded import (BACK_HALO, init_sharded_state,
                                           make_sharded_step)

OS = 10
FS = SYMBOL_RATE * SPS * OS
CENTER = 136.975e6


def _mesh_or_skip(cs, ts):
    if len(jax.devices()) < cs * ts:
        pytest.skip("needs %d devices" % (cs * ts))
    return make_mesh(cs, ts)


def _setup(n_blocks_samples, freqs, seed=1):
    """Wideband planar IQ with one burst per channel at staggered times."""
    rng = np.random.default_rng(seed)
    n = n_blocks_samples
    wide = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 1e-3
    t = np.arange(n) / FS
    for i, f in enumerate(freqs):
        burst = sim.synthesize_iq_raw([b"\x10\x01\x01\x01PING%d" % i],
                                      oversample=OS, snr_db=35.0,
                                      seed=seed + i)
        off = 5000 * OS * (i + 1)
        wide[off:off + burst.size] += burst * np.exp(
            2j * np.pi * (f - CENTER) * t[off:off + burst.size])
    return to_planar(wide.astype(np.complex64))


@pytest.mark.parametrize("cs,ts", [(1, 4), (2, 4), (4, 2), (1, 1)])
def test_sharded_matches_single_device(cs, ts):
    mesh = _mesh_or_skip(cs, ts)
    freqs = [CENTER, CENTER - 25e3, CENTER + 25e3, CENTER - 50e3]
    C = len(freqs)
    # K large enough that neither layout truncates (adjacent-channel
    # leakage produces extra below-threshold sync minima, as in the
    # reference; they are rejected later by header FEC / FCS).
    K, S = 64, 256
    taps = prepare_taps(fir_taps(FS), OS)
    dphi = np.array([nco_dphi(CENTER, f, FS) for f in freqs], np.uint32)

    N = 61440 * OS          # per-block raw samples, divisible by ts*OS
    iq = _setup(N, freqs)

    # --- single-device reference ---
    carry = np.zeros((2, taps.size - 1), np.float32)
    hist = np.zeros((2, C, BACK_HALO), np.float32)
    ref_cands, _, _, ref_pwr3 = process_block(
        iq, taps, dphi, np.uint32(0), carry, hist, OS, BACK_HALO,
        SYNC_THRESHOLD, K, S)
    ref_cands = jax.tree.map(np.asarray, ref_cands)

    # --- sharded ---
    fwd = S * SPS + 1
    step = make_sharded_step(mesh, oversample=OS, fwd_halo=fwd,
                             max_candidates=K, max_symbols=S)
    state = init_sharded_state(mesh, C, taps.size)
    cands, pwr3, state = step(iq, taps, dphi, state)
    cands = jax.tree.map(np.asarray, cands)

    # Collect (channel, sync_idx) -> symbols from both.
    def collect(det_idx, sync_idx, symbols, sym_valid, base_off=0):
        out = {}
        it = np.ndindex(det_idx.shape)
        for idx in it:
            if det_idx[idx] < 0:
                continue
            c = idx[-2]  # channel axis is second-to-last
            sp = int(sync_idx[idx])
            nv = int(sym_valid[idx])
            out[(c, sp)] = symbols[idx][:nv]
        return out

    # single-device: sync_idx is relative to block start minus halo;
    # our hist was zeros with length BACK_HALO so subtract it.
    ref = collect(ref_cands.det_idx, ref_cands.sync_idx - BACK_HALO,
                  ref_cands.symbols, ref_cands.sym_valid)
    got = collect(cands.det_idx, cands.sync_idx,
                  cands.symbols, cands.sym_valid)

    assert set(got) == set(ref)
    assert len(ref) >= C  # every burst found
    for key in ref:
        nv = min(len(ref[key]), len(got[key]))
        assert nv > 0
        np.testing.assert_array_equal(got[key][:nv], ref[key][:nv])

    np.testing.assert_allclose(np.asarray(pwr3), np.asarray(ref_pwr3),
                               rtol=1e-4, atol=1e-6)


def test_sharded_streaming_state_carries():
    """Second block must see the first block's tail via the wrap leg."""
    mesh = _mesh_or_skip(2, 4)
    freqs = [CENTER, CENTER - 25e3]
    C = len(freqs)
    K, S = 8, 256
    taps = prepare_taps(fir_taps(FS), OS)
    dphi = np.array([nco_dphi(CENTER, f, FS) for f in freqs], np.uint32)
    N = 30720 * OS

    rng = np.random.default_rng(7)
    wide = (rng.standard_normal(2 * N) + 1j * rng.standard_normal(2 * N)) * 1e-3
    burst = sim.synthesize_iq_raw([b"\x10\x01\x01\x01BOUNDARY"],
                                  oversample=OS, snr_db=35.0, seed=3)
    # place burst straddling the block boundary
    off = N - burst.size // 2
    wide[off:off + burst.size] += burst
    iq = to_planar(wide.astype(np.complex64))

    fwd = S * SPS + 1
    step = make_sharded_step(mesh, oversample=OS, fwd_halo=fwd,
                             max_candidates=K, max_symbols=S)
    state = init_sharded_state(mesh, C, taps.size)
    c1, _, state = step(iq[:, :N], taps, dphi, state)
    c2, _, state = step(iq[:, N:], taps, dphi, state)
    c1, c2 = jax.tree.map(np.asarray, (c1, c2))
    # The sync lands in block 1's final shard or block 2's first halo;
    # either way a detection on channel 0 must exist with sane symbols.
    total = int(c1.count.sum() + c2.count.sum())
    assert total >= 1
