"""Mesh mode in the application: --mesh CxT must decode identically.

Runs the golden capture through `--mesh 1x8` / `--mesh 1x4` on the
forced 8-device CPU mesh and asserts the full text output equals the
single-device fixture byte-for-byte (modulo timestamps) — VERDICT r1
item #5.  Also exercises the deferred-burst prepend path with small
feed blocks, and a channel-sharded synthetic decode.
"""
import os

import numpy as np
import pytest

from test_cli import run_cli
from test_golden_full import FIXTURES, _norm_text

pytestmark = pytest.mark.golden


@pytest.mark.parametrize("mesh", ["1x8", "1x4", "1x2"])
@pytest.mark.parametrize("l2", ["0", "1"])
def test_mesh_cli_matches_single_device(reference_wav, mesh, l2):
    if mesh != "1x8" and l2 == "1":
        pytest.skip("one L2-enabled mesh layout is enough for CI time")
    r = run_cli(["--iq-file", str(reference_wav),
                 "--sample-format", "S16_LE", "--extended-header", "--utc",
                 "--mesh", mesh],
                extra_env={"DUMPVDL2_TPU_L2": l2})
    assert r.returncode == 0, r.stderr.decode()
    with open(os.path.join(FIXTURES, "golden_capture.txt")) as f:
        want = f.read()
    assert _norm_text(r.stdout.decode()) == _norm_text(want)


def test_mesh_cli_small_blocks(reference_wav):
    """Small feed blocks force bursts across block boundaries, driving
    the deferred-burst raw-prepend path; output must still match."""
    r = run_cli(["--iq-file", str(reference_wav),
                 "--sample-format", "S16_LE", "--extended-header", "--utc",
                 "--mesh", "1x4", "--block-size", str(1 << 17)])
    assert r.returncode == 0, r.stderr.decode()
    with open(os.path.join(FIXTURES, "golden_capture.txt")) as f:
        want = f.read()
    assert _norm_text(r.stdout.decode()) == _norm_text(want)


def test_mesh_channel_sharded_synthetic():
    """Channel-axis sharding: synthetic bursts on 2 channels, 2x2 mesh,
    identical frames to the single-device pipeline."""
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.core.mesh_pipeline import MeshPipeline
    from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
    from dumpvdl2_tpu.sim import synthesize_iq_raw

    os_ = 10
    fs = SYMBOL_RATE * SPS * os_
    center = 136.975e6
    freqs = [int(center), int(center - 25e3)]
    frames = [b"mesh channel shard test payload"]
    iq0 = synthesize_iq_raw(frames, oversample=os_)
    n = iq0.size
    # place the burst on channel 1 (offset -25 kHz): shift by +25 kHz
    t = np.arange(n) / fs
    iq1 = iq0 * np.exp(-2j * np.pi * 25e3 * t).astype(np.complex64)
    pad = np.zeros(40000, np.complex64)
    stream = np.concatenate([pad, iq1.astype(np.complex64), pad])

    def decode(pipe):
        out = pipe.feed(stream, eof=True)
        return [(d.metadata.freq, bytes(d.frame)) for d in out]

    single = decode(VDL2Pipeline(freqs, int(center), int(fs), os_))
    mesh = decode(MeshPipeline(freqs, int(center), int(fs), os_,
                               mesh_shape=(2, 2)))
    assert single, "single-device pipeline decoded nothing"
    assert mesh == single


def test_mesh_cpu_self_provisions_devices(reference_wav):
    """--mesh on a 1-device CPU host forces the virtual devices it
    needs (no pre-set XLA_FLAGS required)."""
    r = run_cli(["--iq-file", str(reference_wav),
                 "--sample-format", "S16_LE", "--extended-header",
                 "--utc", "--mesh", "1x2"],
                extra_env={"XLA_FLAGS": ""})
    assert r.returncode == 0, r.stderr.decode()
    with open(os.path.join(FIXTURES, "golden_capture.txt")) as f:
        assert _norm_text(r.stdout.decode()) == _norm_text(f.read())
