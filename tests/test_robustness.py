"""Robustness: the pipeline must survive pathological inputs quietly."""
import numpy as np

from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
from dumpvdl2_tpu.core.pipeline import VDL2Pipeline

FS = SYMBOL_RATE * SPS * 10


def _pipe(n_ch=1):
    freqs = [136975000 - 25000 * i for i in range(n_ch)]
    return VDL2Pipeline(freqs, 136975000, int(FS), 10, max_candidates=8)


def test_pure_noise_no_frames():
    rng = np.random.default_rng(3)
    pipe = _pipe()
    frames = []
    for _ in range(3):
        blk = (rng.standard_normal(40000)
               + 1j * rng.standard_normal(40000)).astype(np.complex64)
        frames += pipe.feed(0.1 * blk)
    frames += pipe.finish()
    assert frames == []


def test_silence_and_dc():
    pipe = _pipe()
    assert pipe.feed(np.zeros(50000, np.complex64)) == []
    assert pipe.feed(np.full(50000, 0.7 + 0.7j, np.complex64)) == []
    assert pipe.finish() == []


def test_strong_tone_no_crash():
    pipe = _pipe()
    t = np.arange(100000) / FS
    tone = np.exp(2j * np.pi * 5000.0 * t).astype(np.complex64)
    frames = pipe.feed(tone, eof=True)
    # a pure carrier has no preamble structure; whatever syncs must
    # fail the burst decode and emit nothing
    assert frames == []


def test_clipped_signal_no_crash():
    rng = np.random.default_rng(5)
    pipe = _pipe(n_ch=2)
    blk = np.clip(rng.standard_normal(60000) * 10, -1, 1) \
        + 1j * np.clip(rng.standard_normal(60000) * 10, -1, 1)
    assert isinstance(pipe.feed(blk.astype(np.complex64), eof=True), list)


def test_tiny_and_empty_feeds():
    pipe = _pipe()
    assert pipe.feed(np.zeros(0, np.complex64)) == []
    assert pipe.feed(np.zeros(3, np.complex64)) == []     # < oversample
    assert pipe.feed(np.zeros(7, np.complex64)) == []     # residual joins
    assert pipe.finish() == []


def test_burst_split_across_many_tiny_feeds():
    """A real burst fed one millisecond at a time still decodes."""
    from dumpvdl2_tpu.sim import synthesize_iq_raw
    burst = synthesize_iq_raw([b"tiny feeds payload"], oversample=10)
    pad = np.zeros(30000, np.complex64)
    stream = np.concatenate([pad, burst.astype(np.complex64), pad])
    pipe = _pipe()
    frames = []
    step = int(FS // 1000) or 1
    for i in range(0, stream.size, step):
        frames += pipe.feed(stream[i:i + step])
    frames += pipe.finish()
    assert len(frames) == 1
    assert bytes(frames[0].frame).startswith(b"tiny feeds payload")
