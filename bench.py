"""Headline benchmark: wideband IQ ingest rate of the fused DSP step.

Config mirrors BASELINE.json "8-channel NCO mix + Chebyshev FIR
decimate channelizer at 2.1 Msps": one chip demodulates 8 VDL2
channels from a single wideband stream (oversample 20 -> 2.1 Msps
ingest, as the reference's SDRPlay/Soapy drivers use).  The metric is
raw IQ Msamples/s/chip through mix + polyphase FIR decimate + preamble
sync + D8PSK candidate slicing; vs_baseline is the realtime factor
against the 2.1 Msps the reference must sustain to keep up with the
same SDR.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE, SYNC_THRESHOLD
    from dumpvdl2_tpu.core.device import process_block
    from dumpvdl2_tpu.dsp.chebyshev import fir_taps
    from dumpvdl2_tpu.dsp.frontend import nco_dphi, prepare_taps

    os_ = 20                       # 2.1 Msps ingest (sdrplay3.h:24)
    fs = SYMBOL_RATE * SPS * os_
    center = 136.975e6
    C = 8
    halo, K, S = 160, 64, 5616
    taps = jnp.asarray(prepare_taps(fir_taps(fs), os_))
    dphi = jnp.asarray(np.array(
        [nco_dphi(center, center - 25e3 * i, fs) for i in range(C)],
        np.uint32))

    N = 1 << 21                    # ~1 s of 2.1 Msps ingest per block
    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.standard_normal((2, N)).astype(np.float32) * 0.05)
    carry = jnp.zeros((2, taps.size - 1), jnp.float32)
    hist = jnp.zeros((2, C, halo), jnp.float32)

    def run():
        out = process_block(iq, taps, dphi, jnp.uint32(0), carry, hist,
                            os_, halo, SYNC_THRESHOLD, K, S)
        jax.block_until_ready(out)

    run()                          # compile

    # Contention-detection protocol: the bench chip is shared and
    # reached through a high-latency tunnel, so a single batch of
    # repeats can be poisoned by another tenant's kernels.  Run up to
    # MAX_BATCHES batches of REPEATS timed runs; a batch is "stable"
    # when its interquartile range is small relative to its median
    # (IQR/median <= 0.3).  Report the fastest stable batch, or — if
    # no batch ever stabilizes — the fastest batch overall with a
    # machine-readable contended flag so the recorded number is
    # interpretable on its own.
    REPEATS, MAX_BATCHES, STABLE_IQR = 10, 4, 0.3
    batches = []
    for _ in range(MAX_BATCHES):
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        q1, q3 = np.percentile(times, [25, 75])
        batches.append({
            "median_s": med,
            "iqr_over_median": float((q3 - q1) / med),
            "min_s": float(min(times)),
            "max_s": float(max(times)),
        })
        # early exit only on a STRONGLY stable batch; a borderline one
        # (0.15-0.3) keeps sampling in case a later batch catches an
        # uncontended window on the shared chip
        if batches[-1]["iqr_over_median"] <= STABLE_IQR / 2:
            break
    stable = [b for b in batches if b["iqr_over_median"] <= STABLE_IQR]
    contended = not stable
    best = min(stable or batches, key=lambda b: b["median_s"])
    msps = N / best["median_s"] / 1e6
    print(json.dumps({
        "metric": "iq_msamples_per_sec_per_chip_8ch",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 2.1, 1),
        "runs": REPEATS,
        "batches": len(batches),
        "contended": contended,
        "iqr_over_median": round(best["iqr_over_median"], 3),
        "spread": [round(N / best["max_s"] / 1e6, 1),
                   round(N / best["min_s"] / 1e6, 1)],
    }))


if __name__ == "__main__":
    main()
