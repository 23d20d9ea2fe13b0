"""Multi-host helpers on the simulated single-process 8-device mesh."""
import numpy as np
import pytest

from dumpvdl2_tpu.parallel.multihost import (block_sharding,
                                             distribute_block,
                                             gather_candidates,
                                             init_distributed,
                                             local_time_spans,
                                             make_multihost_mesh)


def test_init_distributed_noop_single_process():
    assert init_distributed() is False


def test_multihost_mesh_layout():
    mesh = make_multihost_mesh(2, 4)
    assert mesh.shape == {"channel": 2, "time": 4}
    with pytest.raises(ValueError):
        make_multihost_mesh(4, 4)    # 16 > 8 devices


def test_local_time_spans_cover_block():
    mesh = make_multihost_mesh(2, 4)
    n = 4000
    spans = local_time_spans(mesh, n)
    assert spans[0][0] == 0 and spans[-1][1] == n
    covered = sum(e - s for s, e in spans)
    assert covered == n              # single process owns everything


def test_distribute_and_gather_roundtrip():
    mesh = make_multihost_mesh(2, 4)
    n = 4096
    data = np.arange(2 * n, dtype=np.float32).reshape(2, n)
    arr = distribute_block(mesh, data, n)
    assert arr.sharding.spec == block_sharding(mesh).spec
    assert np.array_equal(np.asarray(arr), data)

    from dumpvdl2_tpu.dsp.demod import Candidates
    import jax.numpy as jnp
    c = Candidates(count=jnp.zeros((4, 2), jnp.int32),
                   det_idx=jnp.zeros((4, 2, 3), jnp.int32),
                   sync_idx=jnp.zeros((4, 2, 3), jnp.int32),
                   dphi=jnp.zeros((4, 2, 3)), pherr=jnp.zeros((4, 2, 3)),
                   symbols=jnp.zeros((4, 2, 3, 8), jnp.uint8),
                   sym_valid=jnp.zeros((4, 2, 3), jnp.int32),
                   power=jnp.zeros((4, 2, 3, 8)))
    got = gather_candidates(c)
    assert got["det_idx"].shape == (4, 2, 3)


def test_sharded_step_with_distributed_ingest():
    """distribute_block feeds make_sharded_step directly."""
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.dsp.chebyshev import fir_taps
    from dumpvdl2_tpu.dsp.frontend import nco_dphi, prepare_taps
    from dumpvdl2_tpu.parallel.sharded import (init_sharded_state,
                                               make_sharded_step)
    os_ = 10
    fs = SYMBOL_RATE * SPS * os_
    mesh = make_multihost_mesh(2, 4)
    taps = prepare_taps(fir_taps(fs), os_)
    dphi = np.array([nco_dphi(136.975e6, 136.975e6 - 25e3 * i, fs)
                     for i in range(2)], np.uint32)
    n = 2048 * os_ * 4
    rng = np.random.default_rng(0)
    data = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    block = distribute_block(mesh, data, n)
    step = make_sharded_step(mesh, oversample=os_, fwd_halo=161,
                             max_candidates=4, max_symbols=16)
    state = init_sharded_state(mesh, 2, taps.size)
    cands, pwr3, state = step(block, taps, dphi, state)
    assert gather_candidates(cands)["count"].shape == (4, 2)
