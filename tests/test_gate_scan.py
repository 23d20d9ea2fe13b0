"""Device gating scan vs the REAL host candidate loop.

core/gate_scan.py re-expresses VDL2Pipeline._process_candidates'
decision sequence as a device scan (round-5 groundwork: moving the
busy/NF state machine on device removes the noise-magnitude stream
from the per-block drain).  Any divergence between the two would be a
silent output change once wired in, so this differential pins them
over randomized scenarios: same fabricated candidates + L2 results
through BOTH implementations, compare final per-channel state and the
decision-derived counters.
"""
import math
import random

import numpy as np
import pytest

from dumpvdl2_tpu.constants import SPS, SYMBOL_RATE
from dumpvdl2_tpu.core import gate_scan as gs
from dumpvdl2_tpu.core.pipeline import VDL2Pipeline
from dumpvdl2_tpu.fec.l2_tpu import MAX_BLOCKS

RATE = SYMBOL_RATE * SPS * 10
C, K = 6, 8
FREQS = [136975000 - 25000 * c for c in range(C)]


def _scenario(rng):
    count = rng.integers(0, K + 1, C).astype(np.int32)
    det = np.full((C, K), -1, np.int32)
    sync = np.full((C, K), -1, np.int32)
    for c in range(C):
        pos = np.sort(rng.choice(np.arange(60, 3000), size=K,
                                 replace=False)).astype(np.int32)
        # occasional near-duplicates to exercise the watermark
        if K > 2 and rng.random() < 0.5:
            pos[2] = pos[1] + int(rng.integers(0, 2))
            pos = np.sort(pos)
        det[c] = pos
        sync[c] = pos - rng.integers(1, 4, K).astype(np.int32)
    sym_valid = rng.integers(0, 600, (C, K)).astype(np.int32)
    hdr_fail = rng.random((C, K)) < 0.3
    total_syms = rng.integers(12, 500, (C, K)).astype(np.int64)
    bits = (3 * total_syms - rng.integers(0, 3, (C, K))).astype(np.int32)
    dphi = rng.normal(0.0, 0.004, (C, K)).astype(np.float32)
    # a subset far beyond the 5-ppm gate (|ppm| ~ 8-15), well away
    # from the threshold so f32-vs-f64 rounding can't flip a decision
    hot = rng.random((C, K)) < 0.15
    dphi = np.where(hot, rng.choice([-1.0, 1.0], (C, K))
                    * rng.uniform(0.65, 1.2, (C, K)), dphi) \
        .astype(np.float32)
    busy0 = rng.integers(0, 500, C).astype(np.int64)
    next0 = rng.integers(0, 500, C).astype(np.int64)
    base = int(rng.integers(0, 10000))
    max_ppm = float(rng.choice([0.0, 5.0]))
    l2_row = np.where(rng.random((C, K)) < 0.05, -1,
                      np.arange(C * K).reshape(C, K)).astype(np.int32)
    return dict(count=count, det=det, sync=sync, sym_valid=sym_valid,
                hdr_fail=hdr_fail, bits=bits, dphi=dphi, busy0=busy0,
                next0=next0, base=base, max_ppm=max_ppm, l2_row=l2_row)


def _fake_l2(sc):
    n = C * K
    z = np.zeros(n, np.int32)
    doct = (np.maximum(sc["bits"].reshape(n) - 25, 8) // 8)
    return {
        "syndrome": z, "synd_weight": z,
        "reserved_bad": sc["hdr_fail"].reshape(n),
        "too_long": np.zeros(n, bool), "no_fec": np.zeros(n, bool),
        "hdr_ok": ~sc["hdr_fail"].reshape(n),
        "datalen": sc["bits"].reshape(n) - 25,
        "datalen_octets": doct.astype(np.int32),
        "num_blocks": np.ones(n, np.int32),
        "last_len": np.full(n, 3, np.int32),
        "bits_consumed": sc["bits"].reshape(n),
        "blocks": np.zeros((n, MAX_BLOCKS, 255), np.uint8),
        "counts": np.zeros((n, MAX_BLOCKS), np.int32),
        "fec_row": np.zeros((n, MAX_BLOCKS), np.int32),
        "frame_pwr": np.zeros(n, np.float32),
    }


def _run_host(sc, eof):
    pipe = VDL2Pipeline(FREQS, 136975000, int(RATE), 10,
                        max_ppm=sc["max_ppm"], max_candidates=K)
    for c, ch in enumerate(pipe.channels):
        ch.busy_until = int(sc["busy0"][c])
        ch.next_det_min = int(sc["next0"][c])
    l2_np = _fake_l2(sc)
    fetched = (sc["count"], sc["det"], sc["sync"], sc["dphi"],
               np.zeros((C, K), np.float32), sc["sym_valid"])
    l2_map = np.where(
        sc["l2_row"] < 0, -1,
        np.arange(C * K, dtype=np.int32).reshape(C, K))
    pipe._process_candidates(None, sc["base"], eof=eof, l2=l2_np,
                             l2_map=l2_map, fetched=fetched,
                             l2_np=l2_np)
    return pipe


def _run_scan(sc, eof):
    ppm = np.zeros((C, K), np.float64)
    for c in range(C):
        ppm[c] = SYMBOL_RATE * sc["dphi"][c].astype(np.float64) \
            / (2.0 * math.pi * FREQS[c]) * 1e6
    out = gs.gate_scan(
        sc["count"], sc["det"], sc["sync"], sc["sym_valid"],
        ~sc["hdr_fail"], sc["bits"], ppm.astype(np.float32),
        sc["l2_row"], sc["busy0"], sc["next0"],
        np.int32(sc["base"]), np.float32(sc["max_ppm"]), eof=eof)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("eof", [False, True])
def test_gate_scan_matches_host_loop(eof):
    rng = np.random.default_rng(0x6A7E if eof else 0x6A7F)
    for trial in range(60):
        sc = _scenario(rng)
        pipe = _run_host(sc, eof)
        dev = _run_scan(sc, eof)
        v = dev["verdicts"]
        for c, ch in enumerate(pipe.channels):
            ctx = f"trial {trial} ch {c} eof={eof}\n{sc}\n{v[c]}"
            assert ch.busy_until == dev["busy_until"][c], ctx
            assert ch.next_det_min == dev["next_det_min"][c], ctx
            want_def = ch.deferred_at if ch.deferred_at is not None \
                else -1
            assert want_def == dev["deferred_at"][c], ctx
            s = ch.stats
            assert s.get("demod.sync.good", 0) == int(np.sum(
                np.isin(v[c], (gs.V_HDR_REJECT, gs.V_EOF_TRUNC, gs.V_DEFER_DATA,
                               gs.V_PPM_REJECT, gs.V_ACCEPT)))), ctx
            assert s.get("demod.sync.overflow", 0) == int(np.sum(
                v[c] == gs.V_L2_OVERFLOW)), ctx
            assert s.get("decoder.errors.eof_truncated", 0) == int(
                np.sum(v[c] == gs.V_EOF_TRUNC)), ctx
            assert s.get("decoder.crc.bad", 0) == int(np.sum(
                v[c] == gs.V_HDR_REJECT)), ctx
