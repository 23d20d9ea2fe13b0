"""Maximum-length bursts through the IQ pipeline at the halo's sized
limit.

The reference accepts transmissions up to 0x3FFF bits (decode.c:45-48);
the bit-level caps are covered by test_l2_tpu.  These tests push a
near-cap burst (5616 symbols, all 9 RS blocks) through the FULL IQ
path, where it stresses the two halo designs at their sized limits:

* single-device: the overlap-save halo + deferred-candidate re-read
  when the burst spans MANY feed blocks (core/pipeline.py),
* time-sharded mesh: the multi-hop forward halo when one burst is
  longer than a whole time shard (parallel/sharded.py:89-101).

Every decode must be identical to the one-shot single-device decode.
"""
import numpy as np
import pytest

from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
from dumpvdl2_tpu.core.pipeline import MAX_BURST_SYMS, VDL2Pipeline
from dumpvdl2_tpu.sim import (build_burst_bits, frame_with_fcs,
                              synthesize_iq_raw)

OS = 10
FS = SYMBOL_RATE * SPS * OS
CENTER = 136975000

# 1990 random octets land within a few dozen bits of the 0x3FFF cap
# after stuffing (same geometry as test_l2_tpu's cap test: 9 RS blocks)
_PAYLOAD = bytes(np.random.default_rng(11).integers(0, 256, 1990,
                                                    dtype=np.uint8))


@pytest.fixture(scope="module")
def max_burst():
    bits = build_burst_bits([_PAYLOAD])
    assert bits.size > 0x3E00, "not actually near the 0x3FFF-bit cap"
    assert bits.size <= 3 * MAX_BURST_SYMS
    iq = synthesize_iq_raw([_PAYLOAD], oversample=OS, snr_db=40.0,
                           seed=3).astype(np.complex64)
    # embed at 150k raw samples into a 1.04M-sample span (divisible by
    # every ts*OS used below) with a low noise floor for the NF tracker
    N = 1_040_000
    rng = np.random.default_rng(5)
    sig = (rng.standard_normal(N) + 1j * rng.standard_normal(N)) \
        .astype(np.complex64) * 0.01
    sig[150_000:150_000 + iq.size] += iq
    return sig


def _sig(frames):
    return [(bytes(f.frame), f.metadata.freq, f.metadata.datalen_octets,
             f.metadata.synd_weight, f.metadata.num_fec_corrections,
             f.metadata.idx) for f in frames]


@pytest.fixture(scope="module")
def one_shot(max_burst):
    pipe = VDL2Pipeline([CENTER], CENTER, int(FS), OS)
    frames = pipe.feed(max_burst, eof=True)
    assert [bytes(f.frame) for f in frames] == [frame_with_fcs(_PAYLOAD)]
    return _sig(frames)


def test_maxlen_burst_spans_many_feed_blocks(max_burst, one_shot):
    """Burst (~575k raw samples) fed in 200k-sample blocks: it spans 3+
    feed blocks, so every block's candidates defer until the burst's
    tail arrives and the raw-tail re-read must cover a full max-length
    burst."""
    pipe = VDL2Pipeline([CENTER], CENTER, int(FS), OS)
    frames = []
    for off in range(0, max_burst.size, 200_000):
        frames += pipe.feed(max_burst[off:off + 200_000])
    frames += pipe.finish()
    assert _sig(frames) == one_shot


def test_maxlen_burst_tiny_blocks(max_burst, one_shot):
    """Same at a pathological 64k block size (9+ blocks per burst)."""
    pipe = VDL2Pipeline([CENTER], CENTER, int(FS), OS)
    frames = []
    for off in range(0, max_burst.size, 65_536):
        frames += pipe.feed(max_burst[off:off + 65_536])
    frames += pipe.finish()
    assert _sig(frames) == one_shot


@pytest.mark.parametrize("ts", [4, 8])
def test_maxlen_burst_straddles_time_shards(max_burst, one_shot, ts):
    """Under --mesh 1xT each time shard's fresh span (26k/13k decimated
    samples) is SHORTER than the burst (56k), so the decode rides the
    multi-hop forward halo at its sized limit and must still match the
    single-device decode bit for bit."""
    import jax

    from dumpvdl2_tpu.core.mesh_pipeline import MeshPipeline
    if len(jax.devices()) < ts:
        pytest.skip(f"needs {ts} devices")
    pipe = MeshPipeline([CENTER], CENTER, int(FS), OS, mesh_shape=(1, ts))
    frames = pipe.feed(max_burst, eof=True)
    assert _sig(frames) == one_shot
