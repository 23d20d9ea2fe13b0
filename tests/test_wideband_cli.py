"""Wideband many-channel smoke test through the real app.

The wideband claims in BASELINE.md are benched at the kernel level;
this test proves the full APPLICATION path — CLI flag surface,
centerfreq math, 32-channel fused channelizer, sync, L2, protocol
stack, formatter — decodes a burst placed on an arbitrary channel of a
4.2 Msps span (oversample 40, 32 x 25 kHz grid).
"""
import numpy as np
import pytest

from test_cli import run_cli

from dumpvdl2_tpu.sim import synthesize_iq_raw

CENTER = 136.975e6
C = 32
OS = 40                                  # 4.2 Msps ingest
FS = 10500 * 10 * OS


@pytest.mark.golden
def test_32_channel_span_decodes_offset_channel(tmp_path):
    ch = 7                               # burst goes on channel idx 7
    f_off = -25e3 * (ch - C // 2)
    burst = synthesize_iq_raw([b"wideband app probe payload"],
                              oversample=OS).astype(np.complex64)
    n = np.arange(burst.size)
    burst = burst * np.exp(2j * np.pi * f_off / FS * n).astype(np.complex64)
    rng = np.random.default_rng(0)
    N = burst.size + 120000
    sig = (rng.standard_normal(N) + 1j * rng.standard_normal(N)) \
        .astype(np.complex64) * 0.01
    sig[60000:60000 + burst.size] += burst * 0.5
    s16 = np.empty(2 * N, np.int16)
    s16[0::2] = np.clip(sig.real * 32767, -32768, 32767).astype(np.int16)
    s16[1::2] = np.clip(sig.imag * 32767, -32768, 32767).astype(np.int16)
    iq = tmp_path / "wide.s16"
    iq.write_bytes(s16.tobytes())

    freqs = [str(int(CENTER - 25e3 * (i - C // 2))) for i in range(C)]
    r = run_cli(["--iq-file", str(iq), "--sample-format", "S16_LE",
                 "--oversample", str(OS), "--centerfreq",
                 str(int(CENTER)), "--max-ppm", "10"] + freqs)
    assert r.returncode == 0, r.stderr.decode()
    out = r.stdout.decode()
    # the burst must decode on ITS channel (idx 7 -> 137.200 MHz),
    # carrying the payload bytes ("app probe payload" hexdump)
    blocks = [b for b in out.split("\n\n") if "[137.200]" in b]
    assert blocks, out
    assert any("61 70 70 20 70 72 6f 62 65" in b for b in blocks)
    # with the ppm gate, the adjacent-channel ghost (~29 ppm off) is
    # rejected like the reference's --max-ppm would
    assert not any("[137.175]" in b for b in out.split("\n\n"))
