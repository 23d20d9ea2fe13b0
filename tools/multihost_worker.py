"""Worker for the 2-process jax.distributed test (tests/test_multihost.py).

Each process runs this script with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set, forces 4 local CPU devices
(-> 8 global over 2 processes), brings up jax.distributed through
dumpvdl2_tpu.parallel.multihost.init_distributed, and drives the full
multi-host path: make_multihost_mesh -> local_time_spans ->
distribute_block -> sharded DSP step -> gather_candidates.  The
addressable candidate fields are printed as JSON on stdout so the test
parent can assert parity with a single-process run of the same step.
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import numpy as np              # noqa: E402
import jax                      # noqa: E402

# An installed sitecustomize may force-register a hardware backend and
# override JAX_PLATFORMS (see tests/conftest.py); pin CPU explicitly.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dumpvdl2_tpu.parallel.multihost import (distribute_block,       # noqa
                                             gather_candidates,
                                             init_distributed,
                                             local_time_spans,
                                             make_multihost_mesh)


def make_block(n: int, oversample: int) -> np.ndarray:
    """Deterministic test block: one synthesized burst in padding —
    identical in every process."""
    from dumpvdl2_tpu.sim import synthesize_iq_raw
    burst = synthesize_iq_raw([b"two-process multihost parity"],
                              oversample=oversample).astype(np.complex64)
    stream = np.zeros(n, np.complex64)
    stream[20000:20000 + burst.size] = burst
    return np.stack([stream.real, stream.imag]).astype(np.float32)


def main() -> int:
    multi = init_distributed()
    assert multi == (jax.process_count() > 1)
    cn, tn, oversample = 2, 4, 10

    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.dsp.chebyshev import fir_taps
    from dumpvdl2_tpu.dsp.frontend import nco_dphi, prepare_taps
    from dumpvdl2_tpu.parallel.sharded import (init_sharded_state,
                                               make_sharded_step)

    fs = SYMBOL_RATE * SPS * oversample
    mesh = make_multihost_mesh(cn, tn)
    taps = prepare_taps(fir_taps(fs), oversample)
    dphi = np.array([nco_dphi(136.975e6, 136.975e6 - 25e3 * i, fs)
                     for i in range(cn)], np.uint32)
    n = 2048 * oversample * tn
    data = make_block(n, oversample)

    spans = local_time_spans(mesh, n)
    local = np.concatenate([data[:, s:e] for s, e in spans], axis=1)
    block = distribute_block(mesh, local, n)

    step = make_sharded_step(mesh, oversample=oversample, fwd_halo=641,
                             max_candidates=8, max_symbols=64)
    state = init_sharded_state(mesh, cn, taps.size)
    cands, pwr3, state = step(block, taps, dphi, state)
    got = gather_candidates(cands)

    result = {
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "local_devices": jax.local_device_count(),
        "count": got["count"].tolist(),
        "det_idx": got["det_idx"].tolist(),
        "sync_idx": got["sync_idx"].tolist(),
        "sym_valid": got["sym_valid"].tolist(),
    }
    print("RESULT " + json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
