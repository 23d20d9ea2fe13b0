"""Marginal-SNR sync parity sweep vs the COMPILED reference demod.

SURVEY §7(b) calls marginal-SNR sync the parity hard part; the wav and
strong-signal tests only check well-above-threshold bursts.  This
sweep embeds a grid of bursts — SNR x carrier-offset (ppm) x
sample-clock phase, spanning the SYNC_THRESHOLD crossing — into ONE
noise stream, runs the compiled demod.c oracle
(/root/reference/src/demod.c:105-198,229-285 via
tools/build_demodref.sh) and our pipeline over identical samples, and
asserts:

* every grid point decoded by BOTH yields identical frame bytes (i.e.
  identical symbol decisions) and datalen;
* accept/reject decisions agree everywhere except a small budget of
  points in the marginal band (the reference filters with a 2-pole
  IIR, we with a matched FIR, so the noise at the decision metric
  differs in the last fraction of a dB — the divergence bound is
  pinned here);
* all comfortably-above-threshold points decode on both sides.
"""
import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
LIB = "/tmp/demodref/libdemodref.so"

pytestmark = pytest.mark.golden

FREQ = 136975000
RATE = 1050000
OS = 10

# the sweep grid: 6 SNR x 5 carrier offsets x 4 clock phases = 120
# points, SNRs chosen to straddle the accept/reject crossing.  (SNR
# labels are PRE-filter vs the wideband noise floor; the channelizer's
# ~17 dB processing gain puts the actual crossing inside the -9..-3
# label band, which the sanity checks below confirm.)
SNRS_DB = [-9.0, -7.0, -5.0, -3.0, 0.0, 10.0]
CARRIER_OFF_HZ = [-600.0, -250.0, 0.0, 250.0, 600.0]
CLOCK_PHASES = [0, 3, 7, 12]          # raw-sample embed offsets

# Divergence bound (re-measured round 5, unchanged from round 4 by
# the im2col channelizer / detect-split rework): accept/reject
# decisions diverge on exactly 9/120 points (6 ref-only, 3 ours-only),
# all at label-SNR <= -3 (the threshold crossing) — the expected
# jitter between the reference's 2-pole IIR and our matched-FIR noise
# at the decision metric.  Budgets are pinned at measured+2 total /
# max-side+1 (VERDICT r4 #8) so a regression of even a few marginal
# points trips the sweep.  A systematic one-sided deficit (like the
# round-4 pre-fix candidate-slot overflow, which silently dropped
# whole 0-dB clusters) fails the one-sided assert.
MARGINAL_BAND_DB = -2.0               # points at or below may diverge
DIVERGENCE_BUDGET = 11                # measured 9 + 2
ONE_SIDED_BUDGET = 7                  # measured max side 6 + 1


def _grid():
    pid = 0
    for snr in SNRS_DB:
        for off in CARRIER_OFF_HZ:
            for ph in CLOCK_PHASES:
                yield pid, snr, off, ph
                pid += 1


@pytest.fixture(scope="module")
def sweep_stream():
    from dumpvdl2_tpu.sim import synthesize_iq_raw
    rng = np.random.default_rng(0xDEC0)
    chunks = []
    index = {}                        # pid -> payload marker
    pos = 0
    gap = 40000                       # NF tracker settles between bursts
    for pid, snr, off, ph in _grid():
        payload = b"SWEEP-%03d-" % pid + bytes([pid & 0xFF] * 6)
        burst = synthesize_iq_raw(
            [payload], oversample=OS, snr_db=30.0,
            carrier_offset_hz=off, seed=1000 + pid).astype(np.complex64)
        # scale signal to the target SNR against the stream's fixed
        # noise floor (snr_db in the synth only sets in-burst noise;
        # the decision-relevant SNR is vs the stream noise)
        nfloor = 0.02
        amp = nfloor * (10.0 ** (snr / 20.0))
        seg = np.zeros(ph + burst.size + gap, np.complex64)
        seg[ph:ph + burst.size] = burst * amp
        chunks.append(seg)
        index[pid] = payload
        pos += seg.size
    stream = np.concatenate(chunks)
    noise = (rng.standard_normal(stream.size)
             + 1j * rng.standard_normal(stream.size)) \
        .astype(np.complex64) * (0.02 / np.sqrt(2))
    stream = stream + noise
    s16 = np.empty(2 * stream.size, np.int16)
    s16[0::2] = np.clip(stream.real * 32767, -32768, 32767)
    s16[1::2] = np.clip(stream.imag * 32767, -32768, 32767)
    return s16.tobytes(), index


@pytest.fixture(scope="module")
def demodref():
    if not os.path.exists(LIB):
        if os.path.isdir("/root/reference/src") and shutil.which("gcc"):
            subprocess.run(["sh", os.path.join(TOOLS, "build_demodref.sh")],
                           capture_output=True, timeout=300)
    if not os.path.exists(LIB):
        pytest.skip("reference demod differential lib not built")
    return LIB


def _decoded_pids(frames_hex, index):
    out = {}
    for fh in frames_hex:
        data = bytes.fromhex(fh)
        for pid, payload in index.items():
            if data[:-2] == payload:
                out[pid] = data
    return out


def test_sync_margin_sweep(demodref, sweep_stream, tmp_path):
    raw, index = sweep_stream
    path = tmp_path / "sweep.s16"
    path.write_bytes(raw)
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "demodref_drive.py"),
         str(path), str(FREQ), str(FREQ), str(RATE), str(OS)],
        capture_output=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    ref = json.loads(r.stdout.decode())
    ref_by_pid = _decoded_pids(
        [f["frame_hex"] for f in ref["frames"]], index)

    from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
    iq = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    c = (iq[0::2] + 1j * iq[1::2]).astype(np.complex64)
    pipe = VDL2Pipeline([FREQ], FREQ, RATE, OS)
    ours = []
    for off in range(0, c.size, 1 << 20):
        ours += pipe.feed(c[off:off + (1 << 20)])
    ours += pipe.finish()
    ours_by_pid = _decoded_pids(
        [bytes(f.frame).hex() for f in ours], index)

    snr_of = {pid: snr for pid, snr, _o, _p in _grid()}
    # 1. where both accept: identical bytes (symbol decisions + datalen)
    both = set(ref_by_pid) & set(ours_by_pid)
    for pid in both:
        assert ref_by_pid[pid] == ours_by_pid[pid], f"pid {pid}"

    # 2. accept/reject divergences: bounded, and marginal-band only
    diff = set(ref_by_pid) ^ set(ours_by_pid)
    detail = sorted((pid, snr_of[pid],
                     "ref" if pid in ref_by_pid else "ours")
                    for pid in diff)
    assert len(diff) <= DIVERGENCE_BUDGET, \
        f"{len(diff)} accept/reject divergences: {detail}"
    for side in ("ref", "ours"):
        n = sum(1 for _p, _s, s in detail if s == side)
        assert n <= ONE_SIDED_BUDGET, \
            f"systematic {side}-only deficit: {detail}"
    for pid, snr, side in detail:
        assert snr <= MARGINAL_BAND_DB, \
            f"divergence outside the marginal band: {detail}"

    # 3. every comfortably-strong point decodes on both sides
    strong = [pid for pid, snr, _o, _p in _grid()
              if snr >= MARGINAL_BAND_DB + 3.0]
    for pid in strong:
        assert pid in ref_by_pid, f"oracle missed strong pid {pid}"
        assert pid in ours_by_pid, f"we missed strong pid {pid}"

    # sanity: the sweep really straddles the crossing
    assert len(both) >= len(strong)
    assert len(ref_by_pid) < len(list(_grid())), \
        "every point decoded: grid not marginal enough"

    # 4. device-side gating must not move the accept/reject SET at all
    # (identical decoded pid->bytes map, not just equal counts) — the
    # VERDICT r4 #8 set-equality pin, on the full 120-point margin
    # grid rather than the smaller dual-mode scenes.
    pipe_d = VDL2Pipeline([FREQ], FREQ, RATE, OS)
    pipe_d.use_device_l2 = True
    pipe_d.use_device_gate = True
    dev = []
    for off in range(0, c.size, 1 << 20):
        dev += pipe_d.feed(c[off:off + (1 << 20)])
    dev += pipe_d.finish()
    dev_by_pid = _decoded_pids([bytes(f.frame).hex() for f in dev],
                               index)
    assert dev_by_pid == ours_by_pid, (
        "device gating moved the margin-sweep decode set: "
        f"{sorted(set(dev_by_pid) ^ set(ours_by_pid))}")
