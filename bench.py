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
    """Decode a 3-burst vector through the FULL pipeline (channelizer +
    sync + device L2 + device gating) on the real chip and require
    byte-exact frames for all three:

      * strong        — high-SNR short burst (gross-breakage canary),
      * marginal      — label SNR 0 dB vs the stream noise floor, a few
                        dB above the sync accept/reject crossing
                        (tests/test_sync_margin_sweep.py places the
                        divergence band at <= -3 dB), so a compiled-
                        kernel numeric regression at the margin flips
                        the decode before it flips the sweep,
      * near-cap      — 1990-octet payload, within a few dozen bits of
                        the reference's 0x3FFF-bit burst cap
                        (decode.c:45-48): exercises the max-length L2
                        geometry and the long busy-window gate path.

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
    nfloor = 0.01
    vector = [  # (name, payload, amplitude, carrier offset)
        ("strong", b"bench correctness gate \x01\x02", 0.5, -25e3),
        ("marginal", b"bench marginal-snr burst", nfloor, -25e3),
        ("near-cap", bytes(rng.integers(0, 256, 1990, dtype=np.uint8)),
         0.5, 0.0),
    ]
    gap = 60000
    bursts = [synthesize_iq_raw([p], oversample=os_, carrier_offset_hz=
                                off, seed=7 + i).astype(np.complex64)
              for i, (_, p, _, off) in enumerate(vector)]
    total = sum(b.size for b in bursts) + gap * (len(bursts) + 1)
    sig = (rng.standard_normal(total) + 1j * rng.standard_normal(total)) \
        .astype(np.complex64) * (nfloor / np.sqrt(2))
    pos = gap
    for b, (_, _, amp, _) in zip(bursts, vector):
        sig[pos:pos + b.size] += b * amp
        pos += b.size + gap
    pipe = VDL2Pipeline([int(center - 25e3 * i) for i in range(C)],
                        int(center), int(fs), os_)
    frames = pipe.feed(sig, eof=True)
    got = [(bytes(f.frame), f.metadata.freq) for f in frames]
    for name, payload, _, off in vector:
        want = (frame_with_fcs(payload), int(center + off))
        assert want in got, (
            f"TPU correctness gate failed [{name}]: "
            f"{[(g[:24], fr) for g, fr in got]}")
    print("GATE OK (strong + marginal + near-cap)", file=sys.stderr)


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

    # On the axon remote backend jax.block_until_ready returns BEFORE
    # the computation has executed (it only flushes the dispatch
    # queue), so a dispatch-and-block loop measures dispatch rate, not
    # compute — rounds 1-4 recorded exactly that fiction (thousands of
    # "Msamples/s").  Honest protocol: dispatch INNER blocks
    # back-to-back, then force completion by fetching one scalar from
    # the LAST result — the device queue is serial, so the fetch
    # returning proves all INNER executions finished.  Per-run time =
    # batch/INNER (the one link round-trip amortizes, matching a
    # streaming ingest that overlaps transfers).
    INNER = 4

    def run():
        for _ in range(INNER):
            out = process_block(iq, taps, dphi, jnp.uint32(0), carry,
                                hist, os_, halo, SYNC_THRESHOLD, K, S)
        np.asarray(jax.device_get(out[0].count.ravel()[0]))

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
    # Honest uncontended median under the round-5 forced-completion
    # protocol (rounds 1-4 recorded dispatch rate; see run()).  A
    # steady NEIGHBOR workload makes a slow batch look perfectly
    # stable, so stability alone cannot early-exit: the batch must
    # also be in the expected performance range, and a final value far
    # below it is flagged contended no matter how tight its IQR.
    EXPECTED_MSPS = 35.0
    floor_s = INNER * N / (EXPECTED_MSPS / 2 * 1e6)

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
    msps = INNER * N / best["median_s"] / 1e6
    print(json.dumps({
        "metric": "iq_msamples_per_sec_per_chip_8ch",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 2.1, 1),
        "runs": REPEATS,
        "batches": len(batches),
        "contended": contended,
        "iqr_over_median": round(best["iqr_over_median"], 3),
        "spread": [round(INNER * N / best["max_s"] / 1e6, 1),
                   round(INNER * N / best["min_s"] / 1e6, 1)],
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
