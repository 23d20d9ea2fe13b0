"""DSP-layer tests: filter design, sync, slicing, full pipeline."""
import numpy as np
import pytest
import scipy.signal

from dumpvdl2_tpu import sim
from dumpvdl2_tpu.burst import decode_burst
from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
from dumpvdl2_tpu.dsp.chebyshev import design_lpf, fir_taps
from dumpvdl2_tpu.dsp.demod import find_and_slice
from dumpvdl2_tpu.io.iqfile import iq_blocks
from dumpvdl2_tpu.utils.bits import symbols_to_bits_msb

FS = SYMBOL_RATE * SPS * 10  # 1.05 Msps


def test_chebyshev_design_matches_iir():
    a, b = design_lpf(8000 / FS, 0.5, 2)
    h = fir_taps(FS)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000).astype(np.float32)
    y_iir = scipy.signal.lfilter(a, np.concatenate([[1.0], -b[1:]]), x)
    y_fir = np.convolve(x, h)[:x.size]
    assert np.abs(y_iir - y_fir).max() < 1e-6


def test_chebyshev_response_shape():
    a, b = design_lpf(8000 / FS, 0.5, 2)
    w, resp = scipy.signal.freqz(
        a, np.concatenate([[1.0], -b[1:]]),
        worN=[1e-4, 8000 / FS * 2 * np.pi, 52500 / FS * 2 * np.pi])
    mag_db = 20 * np.log10(np.abs(resp))
    assert abs(mag_db[0]) < 0.01          # ~unity at DC
    assert -4.0 < mag_db[1] < -2.0        # -3 dB point near cutoff
    assert mag_db[2] < -30.0              # alias rejection at 52.5 kHz


def test_sync_and_slice_recovers_burst():
    from dumpvdl2_tpu.dsp.frontend import to_planar
    frames = [b"hello VDL2 world, this is a test frame!"]
    iq = sim.synthesize_iq(frames, snr_db=30.0, freq_offset_hz=200.0, seed=3)
    c = find_and_slice(to_planar(iq)[:, None, :], 4.0, 8, 1024)
    assert int(np.asarray(c.count)[0]) >= 1
    syms = np.asarray(c.symbols)[0, 0]
    tx_bits = sim.build_burst_bits(frames)
    total_syms = -(-tx_bits.size // 3)
    bits = symbols_to_bits_msb(syms[:total_syms])[:tx_bits.size]
    assert np.array_equal(bits, tx_bits)
    res = decode_burst(bits)
    assert res.ok
    assert bytes(res.frames[0][:-2]) == frames[0]


@pytest.mark.parametrize("offset_hz", [0.0, -25000.0])
def test_full_pipeline_synthetic(offset_hz):
    frames = [b"full pipeline check frame ABCDEF"]
    iq = sim.synthesize_iq_raw(frames, oversample=10,
                               carrier_offset_hz=offset_hz, snr_db=35, seed=7)
    center = 136975000 - int(offset_hz)
    pipe = VDL2Pipeline(freqs=[136975000], centerfreq=center,
                        sample_rate=FS, oversample=10)
    out = pipe.feed(iq, eof=True)
    assert len(out) == 1
    assert bytes(out[0].frame[:-2]) == frames[0]
    assert out[0].metadata.synd_weight == 0


def test_pipeline_sensitivity_low_snr():
    # The burst must still decode at moderate SNR
    frames = [b"low snr frame"]
    iq = sim.synthesize_iq_raw(frames, oversample=10, snr_db=13, seed=11)
    pipe = VDL2Pipeline(freqs=[136975000], centerfreq=136975000,
                        sample_rate=FS, oversample=10)
    out = pipe.feed(iq, eof=True)
    assert len(out) == 1
    assert bytes(out[0].frame[:-2]) == frames[0]


def test_pipeline_block_boundary_burst():
    """A burst straddling a feed() boundary must decode via the halo."""
    frames = [b"straddling burst frame payload 0123456789"]
    iq = sim.synthesize_iq_raw(frames, oversample=10, snr_db=35,
                               lead_in_syms=200, seed=5)
    pipe = VDL2Pipeline(freqs=[136975000], centerfreq=136975000,
                        sample_rate=FS, oversample=10)
    # split right inside the burst (preamble starts at sym 200)
    split = 205 * SPS * 10
    out = pipe.feed(iq[:split])
    out += pipe.feed(iq[split:], eof=True)
    assert len(out) == 1
    assert bytes(out[0].frame[:-2]) == frames[0]


@pytest.mark.golden
def test_golden_capture(reference_wav):
    """The bundled real capture must yield the reference CI's strings."""
    pipe = VDL2Pipeline(freqs=[136975000], centerfreq=136975000,
                        sample_rate=1050000, oversample=10)
    frames = []
    with open(reference_wav, "rb") as fh:
        for blk in iq_blocks(fh, "S16_LE"):
            frames.extend(pipe.feed(blk))
    frames.extend(pipe.finish())
    assert len(frames) == 2
    blob = b"|".join(bytes(f.frame) for f in frames)
    assert blob.count(b" -RA BR OVC005\n") == 1
    assert blob.count(b" SLP135\n") == 1
    for f in frames:
        assert f.metadata.synd_weight == 0
        assert f.metadata.num_fec_corrections == 0


def test_bandpass_channelizer_matches_mix_filter_decimate():
    """The complex-taps (mix-after-decimate) front end is numerically
    identical to the direct NCO-mix formulation (frontend.py docstring
    derivation; reference NCO demod.c:312-317,385)."""
    import jax.numpy as jnp

    from dumpvdl2_tpu.dsp.frontend import (bandpass_channelize_impl,
                                           mix_filter_decimate_impl, mix_nco,
                                           nco_dphi, prepare_taps)

    for os_, fs in ((10, 1.05e6), (20, 2.1e6)):
        taps = jnp.asarray(prepare_taps(fir_taps(fs), os_))
        T = int(taps.shape[0])
        center = 136.975e6
        dphi = jnp.asarray(np.array(
            [nco_dphi(center, center - 25e3 * i, fs) for i in range(3)],
            np.uint32))
        rng = np.random.default_rng(1)
        N = 200 * os_
        iq = jnp.asarray(rng.standard_normal((2, N)).astype(np.float32))
        raw_prev = jnp.asarray(
            rng.standard_normal((2, T - 1)).astype(np.float32))
        n0 = np.uint32(12345)
        carry = mix_nco(raw_prev, dphi,
                        jnp.uint32((int(n0) - (T - 1)) & 0xFFFFFFFF))
        dec_old, _ = mix_filter_decimate_impl(
            iq, taps, dphi, jnp.uint32(n0), carry, os_)
        dec_new, new_carry = bandpass_channelize_impl(
            iq, taps, dphi, jnp.uint32(n0), raw_prev, os_)
        np.testing.assert_allclose(np.asarray(dec_new), np.asarray(dec_old),
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(new_carry),
                                      np.asarray(iq[:, N - (T - 1):]))


def test_sync_metric_pallas_matches_xla():
    """Fused Pallas sync kernel == XLA reference (interpret mode)."""
    import jax.numpy as jnp

    from dumpvdl2_tpu.dsp.demod import sync_error_metric
    from dumpvdl2_tpu.dsp.sync_pallas import (LOOKBACK,
                                              sync_error_metric_pallas)

    rng = np.random.default_rng(2)
    for C, M in ((3, 5000), (1, 400), (9, 2048)):
        ph = jnp.asarray(rng.uniform(-np.pi, np.pi, (C, M)).astype(np.float32))
        e0, f0 = sync_error_metric(ph)
        e1, f1 = sync_error_metric_pallas(ph, interpret=True)
        e0, f0, e1, f1 = map(np.asarray, (e0, f0, e1, f1))
        np.testing.assert_allclose(e1[:, LOOKBACK:], e0[:, LOOKBACK:],
                                   atol=1e-3)
        np.testing.assert_allclose(f1[:, LOOKBACK:], f0[:, LOOKBACK:],
                                   atol=1e-4)
        assert np.all(np.isinf(e1[:, :LOOKBACK]))
