"""Stage-level profile of the wideband e2e bench block (dev aid).

Times, at the bench_wideband_e2e_256ch config on the current backend:
  dispatch   - process_block + L2 + gate dispatch (host time to enqueue)
  device     - block_until_ready on the dispatched work
  fetch      - the coalesced drain transfer (and its byte count)
  host       - _process_verdicts + parallel decoder
Run:  python tools/profile_wideband_e2e.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
    from dumpvdl2_tpu.dsp.frontend import to_planar
    from dumpvdl2_tpu.sim import synthesize_iq_raw
    from dumpvdl2_tpu.utils.fetch import coalesced_get

    os_, C = 80, 256
    fs = SYMBOL_RATE * SPS * os_
    center = 136.975e6
    freqs = [int(center - 25e3 * (i - C // 2)) for i in range(C)]
    N = 1 << 22
    rng = np.random.default_rng(7)
    sig = (rng.standard_normal(N) + 1j * rng.standard_normal(N)) \
        .astype(np.complex64) * 0.02
    n_active = 24
    active = rng.choice(np.arange(0, C, 4), size=n_active, replace=False)
    for k, ch in enumerate(active):
        burst = synthesize_iq_raw(
            [b"wideband e2e burst ch%03d payload " % ch * 4],
            oversample=os_, carrier_offset_hz=freqs[ch] - center,
            seed=int(ch)).astype(np.complex64)
        off = 60000 + (k * (N - 2 * 60000 - burst.size)) // n_active
        sig[off:off + burst.size] += burst * 0.5

    pipe = VDL2Pipeline(freqs, int(center), int(fs), os_)
    planar = jnp.asarray(to_planar(sig))
    print("use_device_l2", pipe.use_device_l2,
          "use_device_gate", pipe.use_device_gate, file=sys.stderr)

    # warm both carried-history shapes
    pipe.feed_planar(planar)
    pipe.feed_planar(planar)

    from dumpvdl2_tpu.core.device import process_block_detect
    from dumpvdl2_tpu.core.pipeline import (DEFAULT_HALO, MAX_BURST_SYMS,
                                            SYNC_THRESHOLD,
                                            _launch_sliced_l2)

    if not (pipe.use_device_l2 and pipe.use_device_gate):
        print("device L2 + gating are off on this backend; the staged "
              "breakdown below only exists for that path — aborting",
              file=sys.stderr)
        return

    for it in range(3):
        t0 = time.perf_counter()
        # same stages feed_planar runs: detect-only step + fused
        # compact/slice/L2 (keep in sync with pipeline.feed_planar)
        cands, phases_arr, pwr_arr, new_hist, new_carry, pwr3 = \
            process_block_detect(
                planar, pipe.taps, pipe.dphi,
                np.uint32(pipe.n0 & 0xFFFFFF),
                pipe.carry, pipe.hist, pipe.oversample, DEFAULT_HALO,
                SYNC_THRESHOLD, pipe.max_candidates, MAX_BURST_SYMS)
        l2, l2_map = _launch_sliced_l2(phases_arr, pwr_arr, cands,
                                       pipe.max_candidates)
        if l2_map is not None:
            l2_map = l2_map.reshape(C, pipe.max_candidates)
        base = pipe.hist_base
        H = pipe.hist.shape[2]
        gout = pipe._dispatch_gate(cands, l2, l2_map, pwr3, base, H)
        t1 = time.perf_counter()
        jax.block_until_ready((gout, l2))
        t2 = time.perf_counter()
        tree = (gout, pipe._candidate_fields(cands, l2), l2, l2_map)
        fetched = coalesced_get(tree)
        t3 = time.perf_counter()
        nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(fetched)
                     if hasattr(a, "nbytes"))
        gout_np, cf, l2_np, l2_map_np = fetched
        frames = pipe._process_verdicts(gout_np, cf, l2_np, l2_map_np,
                                        base)
        t4 = time.perf_counter()
        pipe.carry, pipe.hist = new_carry, new_hist
        M_total = H + planar.shape[1] // pipe.oversample
        keep = min(DEFAULT_HALO, M_total)
        pipe.hist_base = base + M_total - keep
        pipe.n0 = (pipe.n0 + planar.shape[1]) & 0xFFFFFF
        print(f"iter{it}: dispatch={t1-t0:.3f}s device={t2-t1:.3f}s "
              f"fetch={t3-t2:.3f}s ({nbytes/1e6:.2f} MB) "
              f"host={t4-t3:.3f}s frames={len(frames)}")
        for name, a in [("gout", gout_np), ("cand", cf), ("l2", l2_np),
                        ("map", l2_map_np)]:
            sz = sum(x.nbytes for x in jax.tree_util.tree_leaves(a)
                     if hasattr(x, "nbytes"))
            print(f"  {name}: {sz/1e6:.3f} MB")


if __name__ == "__main__":
    main()
