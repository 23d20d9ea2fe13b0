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
import os
import subprocess
import sys
import time

import numpy as np


def correctness_gate() -> None:
    """Decode a known burst through the FULL pipeline (channelizer +
    sync + device L2) on the real chip and require byte-exact frames.

    The TPU-hw pytest markers may legitimately skip under chip
    contention, but this bench runs every round — a wrong-answer
    Mosaic/XLA regression flips the bench to rc!=0 instead of riding
    through with green CI.  Runs in its OWN process (main() spawns it)
    because its pipeline allocations perturb the timing process's
    device buffers on the remote-device backend.
    """
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
    from dumpvdl2_tpu.sim import frame_with_fcs, synthesize_iq_raw

    os_, C = 20, 8
    fs = SYMBOL_RATE * SPS * os_
    center = 136.975e6
    rng = np.random.default_rng(1)
    payload = b"bench correctness gate \x01\x02"
    burst = synthesize_iq_raw([payload], oversample=os_,
                              carrier_offset_hz=-25e3).astype(np.complex64)
    sig = np.zeros(burst.size + 200000, np.complex64)
    sig[100000:100000 + burst.size] = burst * 0.5
    sig += (rng.standard_normal(sig.size)
            + 1j * rng.standard_normal(sig.size)).astype(np.complex64) * .01
    pipe = VDL2Pipeline([int(center - 25e3 * i) for i in range(C)],
                        int(center), int(fs), os_)
    frames = pipe.feed(sig, eof=True)
    want = frame_with_fcs(payload)
    assert any(bytes(f.frame) == want and f.metadata.freq
               == int(center - 25e3) for f in frames), \
        f"TPU correctness gate failed: {[bytes(f.frame) for f in frames]}"
    print("GATE OK", file=sys.stderr)


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
    # Historical uncontended median (BASELINE.md).  A steady NEIGHBOR
    # workload makes a slow batch look perfectly stable, so stability
    # alone cannot early-exit: the batch must also be in the expected
    # performance range, and a final value far below it is flagged
    # contended no matter how tight its IQR.
    EXPECTED_MSPS = 5500.0
    floor_s = N / (EXPECTED_MSPS / 2 * 1e6)

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
        # early exit only on a STRONGLY stable batch in the expected
        # range; otherwise keep sampling for an uncontended window
        if batches[-1]["iqr_over_median"] <= STABLE_IQR / 2 \
                and med <= floor_s:
            break
    stable = [b for b in batches
              if b["iqr_over_median"] <= STABLE_IQR
              and b["median_s"] <= floor_s]
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
    if "--gate" in sys.argv:
        correctness_gate()
        sys.exit(0)
    # correctness first, in an isolated process (see correctness_gate)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--gate"],
        capture_output=True, timeout=900)
    if r.returncode != 0:
        sys.stderr.write(r.stderr.decode()[-2000:])
        sys.exit(1)
    main()
