"""Benchmark suite: one JSON line per BASELINE.json config.

Run on the bench chip:  python bench_suite.py [--update-baseline]

Configs measured (BASELINE.json "configs"):
  1. single-channel decode of the bundled capture (end-to-end, host
     protocol stack included) -> realtime factor
  2. 8-channel NCO mix + Chebyshev FIR decimate channelizer at
     2.1 Msps -> IQ Msamples/s/chip  (same as bench.py headline)
  3. batched bit-level decode (descramble, header FEC, deinterleave,
     RS(255,249)) -> bursts/s and RS codewords/s
  4. end-to-end streaming pipeline (demod through decode, 8 channels,
     device L2 path) -> Msamples/s sustained through feed()
  5. wideband channelizer at 256 channels (8.4 Msps span)
     -> Msamples/s and realtime channel capacity

`--update-baseline` rewrites the measured-rows table in BASELINE.md.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REPEATS = 10
WAV = "/root/reference/test/vdl2_model_16b_1050kHz.wav"

# Kernel-only rows dispatch KERNEL_INNER blocks per timed run and
# force completion by fetching one scalar from the last result: on the
# axon remote backend jax.block_until_ready returns before execution
# (it only flushes the dispatch queue), so the round-1..4 kernel rows
# measured dispatch rate, not compute.  The device queue is serial, so
# the scalar arriving proves every dispatched block executed; the one
# link round-trip amortizes over KERNEL_INNER blocks, matching a
# streaming ingest that overlaps transfers.
KERNEL_INNER = 4


def _probe(out):
    """Force REAL completion of ``out`` (and everything dispatched
    before it) by fetching a single scalar."""
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(leaves[0].ravel()[0]))


_LAST_SPREAD = {}


def _median_time(fn, repeats=REPEATS, max_batches=4, stable_iqr=0.3):
    """Contention-aware timing (same protocol as bench.py): run up to
    ``max_batches`` batches of ``repeats`` timed runs, call a batch
    stable when IQR/median <= ``stable_iqr`` (early-exit at half
    that), and report the fastest stable batch — or the fastest batch
    overall with a contended flag when the shared chip/link never
    settles.  Records run count, min/median/max and the flag in
    _LAST_SPREAD so every reported row is interpretable on its own."""
    fn()                                    # compile / warm caches
    batches = []
    for _ in range(max_batches):
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        q1, med, q3 = np.percentile(times, [25, 50, 75])
        batches.append({"times": times, "median": float(med),
                        "iqr_rel": float((q3 - q1) / med)})
        if batches[-1]["iqr_rel"] <= stable_iqr / 2:
            break
    stable = [b for b in batches if b["iqr_rel"] <= stable_iqr]
    best = min(stable or batches, key=lambda b: b["median"])
    _LAST_SPREAD.clear()
    _LAST_SPREAD.update(runs=repeats, batches=len(batches),
                        contended=not stable,
                        t_min=float(np.min(best["times"])),
                        t_median=best["median"],
                        t_max=float(np.max(best["times"])))
    return best["median"]


def _with_spread(row, per_run_value=None):
    """Attach runs + value spread to a bench row.  ``per_run_value``
    maps a wall time to the metric value (rate metrics: min time ->
    best value)."""
    row["runs"] = _LAST_SPREAD.get("runs", 0)
    if "batches" in _LAST_SPREAD:
        row["batches"] = _LAST_SPREAD["batches"]
        row["contended"] = _LAST_SPREAD["contended"]
    if per_run_value is not None and _LAST_SPREAD:
        vals = sorted(per_run_value(t) for t in
                      (_LAST_SPREAD["t_min"], _LAST_SPREAD["t_max"]))
        row["value_min"] = round(vals[0], 1)
        row["value_max"] = round(vals[1], 1)
    return row


def bench_single_channel_wav():
    """Config 1: the bundled capture through the full pipeline."""
    import os
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
    from dumpvdl2_tpu.io import iqfile

    if not os.path.exists(WAV):
        return None
    import jax.numpy as jnp
    from dumpvdl2_tpu.dsp.frontend import to_planar
    with open(WAV, "rb") as fh:
        blocks = list(iqfile.iq_blocks(fh, "S16_LE", bufsize=1 << 20))
    total = sum(b.size for b in blocks)
    fs = SYMBOL_RATE * SPS * 10
    duration = total / fs
    # device-resident planar blocks: a production ingest DMAs straight
    # into device memory, so the measurement excludes host file reads
    planar = [jnp.asarray(to_planar(b[:b.size // 10 * 10])) for b in blocks]

    def run():
        pipe = VDL2Pipeline([136975000], 136975000, int(fs), 10)
        n = 0
        for b in planar:
            n += len(pipe.feed_planar(b))
        n += len(pipe.finish())
        assert n == 2, f"expected 2 frames, got {n}"

    dt = _median_time(run, repeats=5)
    return _with_spread(
        {"metric": "single_channel_wav_decode_realtime_factor",
         "value": round(duration / dt, 1), "unit": "x realtime",
         "vs_baseline": round(duration / dt, 1)},
        lambda t: duration / t)


def bench_channelizer_8ch():
    """Config 2: the bench.py headline (kept identical)."""
    import jax
    import jax.numpy as jnp
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE, SYNC_THRESHOLD
    from dumpvdl2_tpu.core.device import process_block
    from dumpvdl2_tpu.dsp.chebyshev import fir_taps
    from dumpvdl2_tpu.dsp.frontend import nco_dphi, prepare_taps

    os_, C, halo, K, S = 20, 8, 160, 64, 5616
    fs = SYMBOL_RATE * SPS * os_
    center = 136.975e6
    taps = jnp.asarray(prepare_taps(fir_taps(fs), os_))
    dphi = jnp.asarray(np.array(
        [nco_dphi(center, center - 25e3 * i, fs) for i in range(C)],
        np.uint32))
    N = 1 << 21
    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.standard_normal((2, N)).astype(np.float32) * .05)
    carry = jnp.zeros((2, taps.size - 1), jnp.float32)
    hist = jnp.zeros((2, C, halo), jnp.float32)

    def run():
        for _ in range(KERNEL_INNER):
            out = process_block(iq, taps, dphi, jnp.uint32(0), carry,
                                hist, os_, halo, SYNC_THRESHOLD, K, S)
        _probe(out[0].count)

    total = KERNEL_INNER * N
    dt = _median_time(run)
    msps = total / dt / 1e6
    return _with_spread(
        {"metric": "iq_msamples_per_sec_per_chip_8ch",
         "value": round(msps, 1), "unit": "Msamples/s",
         "vs_baseline": round(msps / 2.1, 1)},
        lambda t: total / t / 1e6)


def bench_bit_level_decode():
    """Config 3: batched L2 decode of max-length bursts on device."""
    import jax
    from dumpvdl2_tpu.fec.l2_tpu import MAX_BLOCKS, l2_decode_batch
    from dumpvdl2_tpu.sim import build_burst_bits

    rng = np.random.default_rng(0)
    S, B = 5616, 256
    frames = [bytes(rng.integers(0, 256, 1990, dtype=np.uint8))]
    bits = build_burst_bits(frames)          # ~16.8 kbit, 9 RS blocks
    pad = rng.integers(0, 2, 3 * S - bits.size, dtype=np.uint8)
    full = np.concatenate([bits, pad])
    tri = full.reshape(S, 3)
    syms = ((tri[:, 0] << 2) | (tri[:, 1] << 1) | tri[:, 2]).astype(np.uint8)
    batch = np.broadcast_to(syms, (B, S)).copy()

    def run():
        for _ in range(KERNEL_INNER):
            out = l2_decode_batch(batch, S)
        _probe(out["hdr_ok"])

    total = KERNEL_INNER * B
    dt = _median_time(run)
    bursts_s = total / dt
    cw_s = total * MAX_BLOCKS / dt
    # realtime requirement: a saturated 31.5 kbps channel sends at most
    # ~1.9 max-length bursts/s; vs_baseline = channels worth of bursts
    return _with_spread(
        {"metric": "l2_bit_decode_bursts_per_sec",
         "value": round(bursts_s, 1), "unit": "bursts/s",
         "rs_codewords_per_sec": round(cw_s, 1),
         "vs_baseline": round(bursts_s / 1.9, 1)},
        lambda t: total / t)


def bench_e2e_streaming():
    """Config 4: sustained feed() rate, 8 channels with real bursts."""
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
    from dumpvdl2_tpu.sim import synthesize_iq_raw

    os_, C = 20, 8
    fs = SYMBOL_RATE * SPS * os_
    center = 136.975e6
    freqs = [int(center - 25e3 * i) for i in range(C)]
    rng = np.random.default_rng(0)
    N = 1 << 21
    noise = (rng.standard_normal(N) + 1j * rng.standard_normal(N)) \
        .astype(np.complex64) * 0.02
    burst = synthesize_iq_raw([b"streaming bench payload " * 8],
                              oversample=os_).astype(np.complex64)
    sig = noise.copy()
    sig[10000:10000 + burst.size] += burst * 0.5

    import jax.numpy as jnp
    from dumpvdl2_tpu.dsp.frontend import to_planar
    pipe = VDL2Pipeline(freqs, int(center), int(fs), os_)
    planar = jnp.asarray(to_planar(sig))   # ingest DMAs device-side

    def run():
        pipe.feed_planar(planar)

    # the carried-history shape grows after the FIRST block (0 -> halo),
    # so two distinct programs compile; warm both before timing or the
    # first timed repeat measures an XLA compile, not throughput
    run()
    dt = _median_time(run)
    msps = N / dt / 1e6
    return _with_spread(
        {"metric": "e2e_streaming_msamples_per_sec_8ch",
         "value": round(msps, 1), "unit": "Msamples/s",
         "vs_baseline": round(msps / 2.1, 1)},
        lambda t: N / t / 1e6)


def bench_wideband_256ch():
    """Config 5: 256-channel wideband channelizer on one chip.

    fs = 8.4 Msps (oversample 80) covers a 256 x 25 kHz span; the
    bench measures raw ingest Msamples/s through mix+decimate+sync for
    all 256 channels, and reports the realtime margin at that fs.
    """
    import jax
    import jax.numpy as jnp
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE, SYNC_THRESHOLD
    from dumpvdl2_tpu.core.device import process_block_detect
    from dumpvdl2_tpu.core.pipeline import _launch_sliced_l2
    from dumpvdl2_tpu.dsp.chebyshev import fir_taps
    from dumpvdl2_tpu.dsp.frontend import nco_dphi, prepare_taps

    os_, C, halo, K, S = 80, 256, 160, 16, 5616
    fs = SYMBOL_RATE * SPS * os_                     # 8.4 Msps
    center = 136.975e6
    taps = jnp.asarray(prepare_taps(fir_taps(fs), os_))
    dphi = jnp.asarray(np.array(
        [nco_dphi(center, center - 25e3 * (i - C // 2), fs)
         for i in range(C)], np.uint32))
    N = 1 << 22
    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.standard_normal((2, N)).astype(np.float32) * .05)
    carry = jnp.zeros((2, taps.size - 1), jnp.float32)
    hist = jnp.zeros((2, C, halo), jnp.float32)

    def run():
        # the production device-L2 kernel chain: detect-only step +
        # fused compact/slice/L2 (what pipeline.feed_planar dispatches)
        for _ in range(KERNEL_INNER):
            dets, ph, pw, _nh, _nc, _p3 = process_block_detect(
                iq, taps, dphi, jnp.uint32(0), carry,
                hist, os_, halo, SYNC_THRESHOLD, K, S)
            l2, _m = _launch_sliced_l2(ph, pw, dets, K)
        _probe(l2["hdr_ok"])

    total = KERNEL_INNER * N
    dt = _median_time(run, repeats=10)
    msps = total / dt / 1e6
    # realtime needs fs = 8.4 Msps ingest; capacity = how many full
    # 256-channel wideband spans one chip could demodulate in realtime
    spans = msps / (fs / 1e6)
    return _with_spread(
        {"metric": "wideband_256ch_msamples_per_sec",
         "value": round(msps, 1), "unit": "Msamples/s",
         "channels_at_realtime": int(spans * C),
         "vs_baseline": round(spans, 2)},
        lambda t: total / t / 1e6)


def bench_wideband_e2e_256ch():
    """Config 7 (north star): 256-channel wideband span END-TO-END.

    Unlike ``wideband_256ch`` (device kernel only), this drives the
    FULL application path per block: fused device step -> coalesced
    candidate drain -> host L2 -> protocol stack -> text output, with
    the parallel host decoder (--decode-workers 2), on a span carrying
    synthetic bursts spread across many channels at a realistic duty
    cycle.  The metric is sustained ingest Msamples/s through feed();
    1x realtime for the whole 8.4 Msps span = 256 channels live.
    Decode completeness is asserted through the OUTPUT text (every
    distinct payload recovered), not through kernel counters.
    """
    import os
    import tempfile

    import jax.numpy as jnp

    from dumpvdl2_tpu.app.parallel_decoder import ParallelFrameDecoder
    from dumpvdl2_tpu.config import Config
    from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
    from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
    from dumpvdl2_tpu.dsp.frontend import to_planar
    from dumpvdl2_tpu.io.outputs import setup_output
    from dumpvdl2_tpu.sim import synthesize_iq_raw

    os_, C = 80, 256
    fs = SYMBOL_RATE * SPS * os_                     # 8.4 Msps
    center = 136.975e6
    freqs = [int(center - 25e3 * (i - C // 2)) for i in range(C)]

    N = 1 << 22                                      # ~0.5 s of span
    rng = np.random.default_rng(7)
    sig = (rng.standard_normal(N) + 1j * rng.standard_normal(N)) \
        .astype(np.complex64) * 0.02
    # bursts on 24 distinct channels, staggered through the block
    # (~10% airtime duty on each active channel); channels on a
    # stride-4 grid so the rectangular-pulse synth's sidelobes don't
    # collide with another ACTIVE channel (adjacent-channel ghosts of
    # real traffic still occur and still flow through the host stack,
    # exactly as on air)
    n_active = 24
    active = rng.choice(np.arange(0, C, 4), size=n_active, replace=False)
    payloads = [b"wideband e2e burst ch%03d payload " % ch * 4
                for ch in active]
    for k, (ch, payload) in enumerate(zip(active, payloads)):
        burst = synthesize_iq_raw(
            [payload], oversample=os_,
            carrier_offset_hz=freqs[ch] - center,
            seed=int(ch)).astype(np.complex64)
        off = 60000 + (k * (N - 2 * 60000 - burst.size)) // n_active
        sig[off:off + burst.size] += burst * 0.5

    with tempfile.TemporaryDirectory() as td:
        out_path = os.path.join(td, "wideband.txt")
        Config.output_queue_hwm = 0                  # file input: no HWM
        fmtr_list = []
        setup_output(f"decoded:text:file:path={out_path}", fmtr_list)
        decoder = ParallelFrameDecoder(fmtr_list, 2)
        decoder.start_outputs()
        pipe = VDL2Pipeline(freqs, int(center), int(fs), os_)
        planar = jnp.asarray(to_planar(sig))         # ingest DMAs device-side

        def run():
            frames = pipe.feed_planar(planar)
            decoder.process_all(frames)

        run()    # warm the second carried-history shape (halo > 0)
        dt = _median_time(run)
        decoder.shutdown()
        # every active channel's distinct payload must appear in the
        # decoded text output.  The AVLC parser consumes the first
        # payload octets as addresses/control, so match on a payload
        # SUFFIX (inside the hexdumped data section); whitespace is
        # stripped so hexdump wrapping and "%02x " separators don't
        # matter.
        flat = b"".join(open(out_path, "rb").read().split())
        got = sum(1 for p in payloads if p[-40:].hex().encode() in flat)
        assert got == n_active, \
            f"only {got}/{n_active} distinct payloads in decoded output"

    msps = N / dt / 1e6
    spans = msps / (fs / 1e6)
    return _with_spread(
        {"metric": "wideband_e2e_256ch_msamples_per_sec",
         "value": round(msps, 1), "unit": "Msamples/s",
         "channels_at_realtime": int(spans * C),
         "decoded_payloads": int(got),
         "vs_baseline": round(spans, 2)},
        lambda t: N / t / 1e6)


def bench_raw_replay():
    """Config 6: host protocol stack bulk replay (archive reprocess).

    Measures the full L3/L4 path — protobuf record decode, AVLC parse,
    protocol tree build (with reassembly), text formatting — over
    synthetic fleet traffic (64 aircraft, full protocol breadth).
    vs_baseline = how many SATURATED 31.5 kbps VDL2 channels' worth of
    frames one decode process keeps up with in realtime (the airtime
    the decoded frames would occupy divided by decode time).
    """
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import gen_bench_archive as gba
    from dumpvdl2_tpu.io import rawframes
    from dumpvdl2_tpu.io.formatters import formatter_get
    from dumpvdl2_tpu.proto.avlc import avlc_parse
    from dumpvdl2_tpu.proto.reasm import ReasmContexts

    with tempfile.NamedTemporaryFile(suffix=".frames") as tf:
        n = gba.write_archive(tf.name, 64, 16)
        with open(tf.name, "rb") as fh:
            bodies = list(rawframes.read_raw_bodies(fh))
    assert len(bodies) == n
    fd = formatter_get("text")
    airtime_bits = 0

    def run():
        nonlocal airtime_bits
        airtime_bits = 0
        reasm = ReasmContexts()
        for b in bodies:
            d = rawframes.decode_raw_frame(b)
            frame = bytes(d.frame)
            airtime_bits += 8 * len(frame)
            root, _mt = avlc_parse(frame, d.metadata, reasm)
            if root is not None:
                fd.format_decoded_msg(d.metadata, root)

    dt = _median_time(run, repeats=5)
    fps = n / dt
    airtime = airtime_bits / 31500.0
    return _with_spread(
        {"metric": "raw_replay_frames_per_sec",
         "value": round(fps, 1), "unit": "frames/s",
         "vs_baseline": round(airtime / dt, 1)},
        lambda t: n / t)


def bench_raw_replay_workers():
    """Config 6b: host protocol stack with --decode-workers 2.

    Same fleet-archive workload as raw_replay, but through the
    ParallelFrameDecoder: parent reads records + shards by aircraft
    affinity, 2 worker processes run protobuf decode + AVLC + protocol
    tree + text formatting, parent re-emits in order.  Reported
    vs_baseline is the SPEEDUP over the single-process path measured
    in the same run.  NOTE the bench host has 2 cores total — parent,
    workers and the output writer compete for them, so this is a lower
    bound; on a >=4-core host the workers scale independently.
    """
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import gen_bench_archive as gba
    from dumpvdl2_tpu.app.parallel_decoder import ParallelFrameDecoder
    from dumpvdl2_tpu.config import Config
    from dumpvdl2_tpu.io import rawframes
    from dumpvdl2_tpu.io.formatters import formatter_get
    from dumpvdl2_tpu.io.outputs import setup_output
    from dumpvdl2_tpu.proto.avlc import avlc_parse
    from dumpvdl2_tpu.proto.reasm import ReasmContexts

    with tempfile.NamedTemporaryFile(suffix=".frames") as tf:
        n = gba.write_archive(tf.name, 64, 48)     # ~86k frames
        with open(tf.name, "rb") as fh:
            bodies = list(rawframes.read_raw_bodies(fh))
    assert len(bodies) == n

    # single-process reference rate (same records, same work)
    fd = formatter_get("text")

    def run_single():
        reasm = ReasmContexts()
        for b in bodies:
            d = rawframes.decode_raw_frame(b)
            root, _mt = avlc_parse(bytes(d.frame), d.metadata, reasm)
            if root is not None:
                fd.format_decoded_msg(d.metadata, root)

    dt_single = _median_time(run_single, repeats=3, max_batches=1)

    Config.output_queue_hwm = 0
    with tempfile.TemporaryDirectory() as td:
        # decoder lifecycle (process spawn, output threads, shutdown
        # drain) stays OUTSIDE the timed region: the row measures
        # steady-state throughput, flush_wait() is the barrier
        fmtr_list = []
        setup_output(f"decoded:text:file:path={td}/o.txt", fmtr_list)
        dec = ParallelFrameDecoder(fmtr_list, 2)
        dec.start_outputs()

        def run_workers():
            for b in bodies:
                dec.process_record(b)
            dec.flush_wait()

        dt_workers = _median_time(run_workers, repeats=3, max_batches=1)
        dec.shutdown()

    fps = n / dt_workers
    return _with_spread(
        {"metric": "raw_replay_workers2_frames_per_sec",
         "value": round(fps, 1), "unit": "frames/s",
         "single_process_fps": round(n / dt_single, 1),
         "vs_baseline": round(dt_single / dt_workers, 2)},
        lambda t: n / t)


BENCHES = {
    "single_channel_wav": bench_single_channel_wav,
    "channelizer_8ch": bench_channelizer_8ch,
    "bit_level_decode": bench_bit_level_decode,
    "e2e_streaming": bench_e2e_streaming,
    "wideband_256ch": bench_wideband_256ch,
    "wideband_e2e_256ch": bench_wideband_e2e_256ch,
    "raw_replay": bench_raw_replay,
    "raw_replay_workers": bench_raw_replay_workers,
}


def main() -> None:
    update = "--update-baseline" in sys.argv
    if "--only" in sys.argv:
        # run ONE config in this process (the subprocess worker mode)
        name = sys.argv[sys.argv.index("--only") + 1]
        row = BENCHES[name]()
        if row is not None:
            print(json.dumps(row), flush=True)
        return
    # Each config runs in its own subprocess: a fresh backend session
    # per bench keeps compile caches / device state from one config
    # from contaminating another's timings.
    import subprocess
    rows = []
    for name in BENCHES:
        r = subprocess.run(
            [sys.executable, __file__, "--only", name],
            capture_output=True, text=True, timeout=3000)
        line = ""
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        if r.returncode != 0 or not line:
            print(json.dumps({"metric": name, "error":
                              (r.stderr or "no output")[-400:]}),
                  flush=True)
            continue
        print(line, flush=True)
        rows.append(json.loads(line))
    if update:
        _update_baseline(rows)


def _update_baseline(rows) -> None:
    import io
    import jax
    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    lines = ["", f"## Measured (backend={backend}, device={dev})", "",
             "| Metric | Value | Unit | vs baseline | runs | min-max |",
             "|---|---|---|---|---|---|"]
    for r in rows:
        spread = (f"{r['value_min']}-{r['value_max']}"
                  if "value_min" in r else "-")
        lines.append(f"| {r['metric']} | {r['value']} | {r['unit']} | "
                     f"{r['vs_baseline']} | {r.get('runs', '-')} | "
                     f"{spread} |")
    with open("BASELINE.md") as f:
        text = f.read()
    marker = "## Measured (backend="
    if marker in text:
        text = text[:text.index(marker)].rstrip() + "\n"
    else:
        text = text.rstrip() + "\n"
    with open("BASELINE.md", "w") as f:
        f.write(text + "\n".join(lines) + "\n")
    print("BASELINE.md updated", file=sys.stderr)


if __name__ == "__main__":
    main()
