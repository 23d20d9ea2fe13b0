"""Device-side candidate gating + noise-floor tracker: one fused step.

Round-5 wiring of the gating groundwork (core/gate_scan.py): the whole
per-channel burst state machine of ``VDL2Pipeline._process_candidates``
— busy windows, deferral, ppm gate, AND the magnitude EMA / noise-floor
tracker with its busy-pause and deferral-hold semantics — runs on the
device.  The host drain then carries per-candidate verdicts and
noise-floor readings (~KBs) instead of the every-3rd-sample magnitude
stream (~75% of the wideband drain, BASELINE.md round-4 notes), which
is what pinned the 256-channel end-to-end rate to the shared host link.

Reference analog: the DM_* state machine + magnitude EMA / noise floor
of demod.c:229-285 and the decode gating of decode.c:198-258,
re-expressed block-wise.

Host-loop semantics replicated 1:1 (pinned by tests/test_nf_gate.py
full-pipeline dual-mode differentials on synthesized IQ):

* per block, the tracker consumes magnitude columns in index order
  restricted to a computable mask — the pre-existing busy frontier,
  per-candidate claimed windows (header-reject: 9 symbols, accept: the
  burst length), the hold drop-interval, and the deferral frontier;
* a noise-floor update fires at every 1000th TRACKED column with the
  EMA value at that column;
* each accepted candidate reads the state as of its sync point (plus
  any hold-release replay that resolution triggered — see below);
* columns encountered while a deferral hold is pending are SAVED, not
  tracked; when the hold releases they are replayed through the
  tracker (in saved order, before any later column) filtered to
  positions at/after the busy window the resolution established.

The saved-column ring (host: ``ChannelState.nf_saved``) must be carried
ON DEVICE: the mesh pipeline's one-block drain lag routinely leaves the
hold position behind the next block's base (columns accumulate until
the prepend re-read resolves the burst), and even the single-device
path can save columns across blocks when a held re-detection vanishes
while a later candidate in the same block defers.  State layout:
``ring_pos``/``ring_val`` (C, RING) + ``ring_n`` — positions rebased
per block like every other carried index.  The ring is processed as a
PREFIX of the block's column stream (exactly the host's replay order);
appends happen when the hold persists.  Capacity: the host list is
unbounded; the device ring drops overflowing columns beyond RING
(reachable only if a deferral persists for several wideband blocks —
noise-floor-only effect, decode decisions are unaffected).

The EMA is a linear recurrence -> ``lax.associative_scan`` over affine
maps (f32, log-depth; MAG_LP = 0.9 rules out the closed-form
inverse-power formulation), plus a tiny ``lax.scan`` over the
per-1000-column crossing slots.  f32 vs the host's f64 drifts ~1e-6
relative — three orders below the 0.1 dB display resolution (golden
fixtures pass byte-identical in both modes).

int32 hygiene: all carried indices are RELATIVE to the current block's
base; the caller passes the inter-block base delta and the rebase
clamps at _FLOOR, so a multi-hour stream never overflows (the round-4
gate_scan caveat; soak-tested by tests/test_soak_longstream.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAG_LP, NF_LP, SPS, SYMBOL_RATE
from .gate_scan import (V_ACCEPT, V_DEFER, V_DEFER_DATA, V_EMPTY,
                        V_EOF_SHORT, V_EOF_TRUNC, V_HDR_REJECT,
                        V_L2_OVERFLOW, V_PPM_REJECT, V_SKIP,
                        V_UNPROCESSED, gate_scan)

# Verdicts that resolve a candidate (host loop paths calling decided()).
DECIDED_VERDICTS = (V_L2_OVERFLOW, V_EOF_SHORT, V_HDR_REJECT,
                    V_EOF_TRUNC, V_PPM_REJECT, V_ACCEPT)
# Verdicts whose host path advanced the tracker to the sync point and
# claimed a busy window (hold drop-interval / replay-filter cases).
ADVANCE_VERDICTS = (V_HDR_REJECT, V_ACCEPT)
# Verdicts that bump demod.sync.good (header fitted the block).
# pipeline._process_verdicts consults this set, so adding or
# reclassifying a verdict in gate_scan updates the host counter
# mapping in one place.
SYNC_GOOD_VERDICTS = frozenset((V_DEFER_DATA, V_HDR_REJECT, V_EOF_TRUNC,
                                V_PPM_REJECT, V_ACCEPT))

_FLOOR = -(1 << 30)        # "long in the past" clamp for rebased indices
MAX_DELTA = 1 << 29        # caller clamps base deltas here (semantically
                           # equivalent: anything further back is past)
RING = 32768               # held-column ring capacity per channel


def init_state(C: int, ring: int = RING) -> dict:
    """Fresh carried device state (mirrors ChannelState defaults)."""
    return {
        "busy_until": jnp.zeros((C,), jnp.int32),
        "next_det_min": jnp.zeros((C,), jnp.int32),
        "hold": jnp.zeros((C,), jnp.int32),
        "hold_active": jnp.zeros((C,), jnp.bool_),
        "mag_lp": jnp.zeros((C,), jnp.float32),
        "mag_nf": jnp.full((C,), 2.0, jnp.float32),
        "nfcnt": jnp.zeros((C,), jnp.int32),
        "ring_pos": jnp.full((C, ring), _FLOOR, jnp.int32),
        "ring_val": jnp.zeros((C, ring), jnp.float32),
        "ring_n": jnp.zeros((C,), jnp.int32),
    }


def _isin(v, codes):
    m = v == codes[0]
    for c in codes[1:]:
        m = m | (v == c)
    return m


def _rebase(state: dict, delta) -> dict:
    """Shift carried indices to the new block base (int32-safe)."""
    d = jnp.int32(delta)
    st = dict(state)
    for k in ("busy_until", "next_det_min", "hold", "ring_pos"):
        st[k] = jnp.maximum(state[k] - d, jnp.int32(_FLOOR))
    return st


def _slot_inputs(dphi, l2_row, hdr_rows, bits_rows, freqs):
    """Per-slot gate inputs gathered from the compacted L2 results."""
    safe = jnp.clip(l2_row, 0, hdr_rows.shape[0] - 1)
    hdr_ok = jnp.where(l2_row >= 0, hdr_rows[safe], False)
    bits = jnp.where(l2_row >= 0, bits_rows[safe], 0).astype(jnp.int32)
    ppm = (SYMBOL_RATE * 1e6 / (2.0 * np.pi)) * dphi \
        / freqs[:, None].astype(jnp.float32)
    return hdr_ok, bits, ppm


def _gate(count, det_idx, sync_idx, sym_valid, dphi, l2_row,
          hdr_rows, bits_rows, state, freqs, max_ppm, eof: bool):
    hdr_ok, bits, ppm = _slot_inputs(dphi, l2_row, hdr_rows, bits_rows,
                                     freqs)
    g = gate_scan(count, det_idx, sync_idx, sym_valid, hdr_ok, bits,
                  ppm, l2_row, state["busy_until"],
                  state["next_det_min"], jnp.int32(0),
                  jnp.float32(max_ppm), eof=eof)
    return g, bits


def _decisions(verdicts, sync_idx, bits, state, deferred):
    """Hold bookkeeping shared by every entry point.

    Returns a dict with: released, drop_end (block-column low bound
    from the hold drop-interval), ring_filter (replay position filter),
    track_none (hold persists: block columns are saved, not tracked),
    append (hold persists and this block's columns go to the ring),
    plus the new hold state.
    """
    hold0, hold_act = state["hold"], state["hold_active"]
    busy0 = state["busy_until"]
    total_syms = -(-bits // 3)
    decided = _isin(verdicts, DECIDED_VERDICTS)
    any_dec = decided.any(axis=1)
    first = jnp.argmax(decided, axis=1)
    ar = jnp.arange(verdicts.shape[0])
    fv = verdicts[ar, first]
    fsync = sync_idx[ar, first]
    f_adv = _isin(fv, ADVANCE_VERDICTS)
    busy_after_first = jnp.where(
        fv == V_HDR_REJECT, fsync + 9 * SPS,
        jnp.where(fv == V_ACCEPT,
                  fsync + total_syms[ar, first] * SPS, busy0)) \
        .astype(jnp.int32)

    recovered = hold0 >= 0                    # block re-covered the hold
    released = hold_act & (any_dec | ((deferred < 0) & recovered))
    persist = hold_act & ~released
    drop_end = jnp.where(hold_act & any_dec & f_adv, fsync,
                         jnp.int32(_FLOOR))
    ring_filter = jnp.where(any_dec & f_adv, busy_after_first, busy0)

    hold1_act = persist | (deferred >= 0)
    hold1 = jnp.where(
        deferred >= 0,
        jnp.where(persist, jnp.minimum(hold0, deferred), deferred),
        hold0)
    return {"released": released, "persist": persist,
            "drop_end": drop_end, "ring_filter": ring_filter,
            "hold": hold1, "hold_active": hold1_act}


def _nf_track(verdicts, sync_idx, bits, mags, col_pos, col_keep,
              state, dec, deferred, end_rel):
    """Masked EMA + noise-floor crossings for one block.

    The processed column stream is [ring (hold-release replay)] ++
    [this block's columns]; ``col_pos`` (W,) int32 are host-effective
    (rebased) decimated indices, strictly increasing; ``col_keep``
    marks columns the host considers at all (mesh prepend re-reads
    drop a prefix).  Returns (nf_read (C, K), new tracker state, new
    ring state).
    """
    C, K = verdicts.shape
    W = mags.shape[1]
    busy0 = state["busy_until"]
    mag_lp0, mag_nf0, nfcnt0 = (state["mag_lp"], state["mag_nf"],
                                state["nfcnt"])
    ring_pos, ring_val, ring_n = (state["ring_pos"], state["ring_val"],
                                  state["ring_n"])
    R = ring_pos.shape[1]

    # --- block-column mask --------------------------------------------
    total_syms = -(-bits // 3)
    is_rej = verdicts == V_HDR_REJECT
    is_acc = verdicts == V_ACCEPT
    win = is_rej | is_acc
    ws = sync_idx
    we = sync_idx + jnp.where(is_rej, 9 * SPS,
                              total_syms * SPS).astype(jnp.int32)
    a = jnp.searchsorted(col_pos, ws.reshape(-1)).reshape(C, K) \
        .astype(jnp.int32)
    b = jnp.searchsorted(col_pos, we.reshape(-1)).reshape(C, K) \
        .astype(jnp.int32)
    rows = jnp.arange(C, dtype=jnp.int32)[:, None]
    dlt = jnp.zeros((C, W + 1), jnp.int32)
    dlt = dlt.at[rows, a].add(win.astype(jnp.int32))
    dlt = dlt.at[rows, b].add(-win.astype(jnp.int32))
    inwin = jnp.cumsum(dlt, axis=1)[:, :W] > 0

    low = jnp.maximum(busy0, dec["drop_end"])
    # while a hold persists, block columns are saved (ring), not tracked
    F_track = jnp.where(dec["persist"], jnp.int32(_FLOOR),
                        jnp.where(deferred >= 0, deferred,
                                  jnp.int32(end_rel)))
    track_blk = (col_pos[None, :] >= low[:, None]) \
        & (col_pos[None, :] < F_track[:, None]) & ~inwin
    if col_keep is not None:
        track_blk = track_blk & col_keep[None, :]

    # --- ring replay (prefix of the stream) ---------------------------
    slot = jnp.arange(R, dtype=jnp.int32)[None, :]
    track_ring = (slot < ring_n[:, None]) & dec["released"][:, None] \
        & (ring_pos >= dec["ring_filter"][:, None])

    mags_all = jnp.concatenate([ring_val, mags], axis=1)
    track = jnp.concatenate([track_ring, track_blk], axis=1)

    # --- EMA over tracked columns (affine associative scan) -----------
    scale = jnp.where(track, jnp.float32(MAG_LP), jnp.float32(1.0))
    off = jnp.where(track, jnp.float32(1.0 - MAG_LP) * mags_all,
                    jnp.float32(0.0))
    S, O = jax.lax.associative_scan(
        lambda l, r: (l[0] * r[0], l[1] * r[0] + r[1]),
        (scale, off), axis=1)
    y = S * mag_lp0[:, None] + O
    s_cnt = jnp.cumsum(track.astype(jnp.int32), axis=1)
    total_n = s_cnt[:, -1]

    # --- per-1000 noise-floor crossings -------------------------------
    cap = (R + W) // 1000 + 1
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)[None, :] * 1000 \
        - nfcnt0[:, None]
    jc = jax.vmap(lambda s_, t: jnp.searchsorted(s_, t))(s_cnt, targets) \
        .astype(jnp.int32)
    ncross = (nfcnt0 + total_n) // 1000
    valid_c = jnp.arange(1, cap + 1, dtype=jnp.int32)[None, :] \
        <= ncross[:, None]
    y_cross = jnp.take_along_axis(y, jnp.clip(jc, 0, R + W - 1), axis=1)

    def nf_step(nf, xs):
        yv, ok = xs
        upd = jnp.float32(NF_LP) * nf \
            + jnp.float32(1.0 - NF_LP) * jnp.minimum(yv, nf) \
            + jnp.float32(1e-4)
        nf2 = jnp.where(ok, upd, nf)
        return nf2, nf2

    mag_nf1, nf_seq = jax.lax.scan(nf_step, mag_nf0,
                                   (y_cross.T, valid_c.T))
    nf_seq = nf_seq.T                                       # (C, cap)

    # --- per-candidate noise-floor readings ---------------------------
    # reads happen after the replay prefix, then after block columns
    # strictly before the candidate's sync point
    bound = jnp.int32(R) + jnp.searchsorted(
        col_pos, sync_idx.reshape(-1)).reshape(C, K).astype(jnp.int32)
    r = ((jc[:, None, :] < bound[:, :, None]) & valid_c[:, None, :]) \
        .sum(axis=2)
    nf_read = jnp.where(
        r > 0,
        jnp.take_along_axis(nf_seq, jnp.clip(r - 1, 0, cap - 1), axis=1),
        mag_nf0[:, None])

    # --- ring update ---------------------------------------------------
    # appended while the hold persists: kept columns past the busy
    # frontier, up to the (new) deferral bound — exactly the host's
    # save branch in _advance_noise_floor/_finish_noise_block.
    # Formulated as a GATHER: appended columns land in contiguous ring
    # slots (ranks of a monotone column stream), so ring slot s can
    # look up its source column via searchsorted instead of a (C, W)
    # scatter — TPU scatters of that size dominated the whole gate
    # step (~100 ms/block at wideband, independent of R).
    F_app = jnp.where(deferred >= 0, deferred, jnp.int32(end_rel))
    app = dec["persist"][:, None] & (col_pos[None, :] >= busy0[:, None]) \
        & (col_pos[None, :] < F_app[:, None])
    if col_keep is not None:
        app = app & col_keep[None, :]
    base_n = jnp.where(dec["released"], 0, ring_n)
    keep_old = ~dec["released"][:, None] & (slot < ring_n[:, None])
    # ``app`` is an INTERVAL [j_lo, j_hi) of block columns per channel
    # (every condition above is a bound on the strictly-increasing
    # col_pos, and col_keep is a prefix drop), so the slot -> column
    # map is pure arithmetic: slot s holds column j_lo + (s - base_n).
    n_app = app.sum(axis=1).astype(jnp.int32)
    pos0 = jnp.where(keep_old, ring_pos, jnp.int32(_FLOOR))
    val0 = jnp.where(keep_old, ring_val, 0.0)
    if W > 0:
        # slot s holds column j_lo + (s - base_n); realized as one
        # contiguous dynamic slice per channel from a left-padded
        # block (start R + j_lo - base_n >= 0), which is a plain DMA —
        # both a scatter and an elementwise gather here measure ~100ms
        # per wideband block on TPU.
        j_lo = jnp.argmax(app, axis=1).astype(jnp.int32)       # (C,)
        is_app = (slot >= base_n[:, None]) \
            & (slot < (base_n + n_app)[:, None])
        start = R + j_lo - base_n          # (C,) in [0, R+W-1]
        # padded on BOTH sides: left so start >= 0, right so
        # dynamic_slice's start clamp (start <= len - R) never shifts
        # the window; out-of-range slots are masked by is_app.
        val_pad = jnp.concatenate(
            [jnp.zeros((C, R), jnp.float32), mags_all[:, R:],
             jnp.zeros((C, R), jnp.float32)], axis=1)
        pos_pad = jnp.concatenate(
            [jnp.full((R,), _FLOOR, jnp.int32), col_pos,
             jnp.full((R,), _FLOOR, jnp.int32)])
        app_val = jax.vmap(
            lambda v, s: jax.lax.dynamic_slice(v, (s,), (R,)))(
                val_pad, start)                                # (C, R)
        app_pos = jax.vmap(
            lambda s: jax.lax.dynamic_slice(pos_pad, (s,), (R,)))(
                start)                                         # (C, R)
        pos1 = jnp.where(is_app, app_pos, pos0)
        val1 = jnp.where(is_app, app_val, val0)
    else:
        pos1, val1 = pos0, val0
    ring_n1 = jnp.minimum(base_n + n_app, R).astype(jnp.int32)

    new = {"mag_lp": y[:, -1], "mag_nf": mag_nf1,
           "nfcnt": (nfcnt0 + total_n) % 1000,
           "ring_pos": pos1, "ring_val": val1, "ring_n": ring_n1}
    return nf_read, new


def _mag(pwr3):
    """Device magnitude with the same f16 wire rounding the host-gated
    drain applies (pipeline._mag16), so both modes track identical
    inputs."""
    return jnp.sqrt(pwr3).astype(jnp.float16).astype(jnp.float32)


def _finish_state(g, dec, nf_new):
    return {"busy_until": g["busy_until"],
            "next_det_min": g["next_det_min"],
            "hold": dec["hold"], "hold_active": dec["hold_active"],
            **nf_new}


def _out(g, nf_read, state):
    return {"verdicts": g["verdicts"], "nf_read": nf_read,
            "deferred_at": g["deferred_at"],
            **{k: state[k] for k in (
                "busy_until", "next_det_min", "hold", "hold_active",
                "mag_lp", "mag_nf", "nfcnt", "ring_n")}}


@partial(jax.jit, static_argnames=())
def gate_nf_single(count, det_idx, sync_idx, sym_valid, dphi, l2_row,
                   hdr_rows, bits_rows, pwr3, nf_base_rel, delta,
                   state, freqs, max_ppm):
    """Full device gate + NF step for the single-device pipeline.

    All index args/state are decimated-sample indices relative to the
    current block's base; ``delta`` rebases the carried state from the
    previous base.  Returns (out, new_state) where ``out`` is what the
    host drain fetches.
    """
    st = _rebase(state, delta)
    g, bits = _gate(count, det_idx, sync_idx, sym_valid, dphi, l2_row,
                    hdr_rows, bits_rows, st, freqs, max_ppm, eof=False)
    W = pwr3.shape[1]
    col_pos = jnp.int32(nf_base_rel) \
        + 3 * jnp.arange(W, dtype=jnp.int32)
    end_rel = jnp.int32(nf_base_rel) + 3 * W
    dec = _decisions(g["verdicts"], sync_idx, bits, st,
                     g["deferred_at"])
    nf_read, nf_new = _nf_track(g["verdicts"], sync_idx, bits,
                                _mag(pwr3), col_pos, None, st, dec,
                                g["deferred_at"], end_rel)
    new_state = _finish_state(g, dec, nf_new)
    return _out(g, nf_read, new_state), new_state


@partial(jax.jit, static_argnames=())
def gate_nf_mesh(count_tc, det, sync, dphi, pherr, sym_valid, inv_flat,
                 hdr_rows, bits_rows, pwr3, Ml, prepend_dec, delta,
                 state, freqs, max_ppm):
    """Mesh-mode gate + NF step: device-side candidate merge (the
    host's MeshPipeline._merge_candidates re-expressed as a stable
    argsort) followed by the same gate/NF machinery.

    Candidate arrays are (Tn, C, K) as produced by the sharded step
    (indices already rebased to block-global decimated coords relative
    to base_dec); ``pwr3`` is (C, Tn*X) with X = ceil(Ml/3) per-shard
    magnitude columns.  ``prepend_dec`` > 0 on deferred-burst re-read
    blocks: columns re-covering prepended samples are dropped and the
    rest take the host's rank-based positions (mesh_pipeline.py drain
    — including its <=2-sample per-shard misalignment approximation,
    replicated so dual-mode parity holds bit-for-bit).

    Returns (out, merged, new_state): ``merged`` carries the compacted
    per-channel candidate fields the host drain needs for metadata.
    """
    Tn, C, K = det.shape
    cnt = jnp.minimum(count_tc, K)
    valid = jnp.arange(K, dtype=jnp.int32)[None, None, :] \
        < cnt[:, :, None]

    def tr(a):
        return jnp.moveaxis(a, 0, 1).reshape((C, Tn * K))

    vflat = tr(valid)
    order = jnp.argsort(~vflat, axis=1, stable=True).astype(jnp.int32)

    def take(a):
        return jnp.take_along_axis(tr(a), order, axis=1)

    det_m, sync_m = take(det), take(sync)
    dphi_m, pherr_m, sv_m = take(dphi), take(pherr), take(sym_valid)
    mcount = vflat.sum(axis=1).astype(jnp.int32)
    flat = (jnp.arange(Tn, dtype=jnp.int32)[:, None, None] * C
            + jnp.arange(C, dtype=jnp.int32)[None, :, None]) * K \
        + jnp.arange(K, dtype=jnp.int32)[None, None, :]
    flat_m = take(flat)
    row_m = inv_flat[jnp.clip(flat_m, 0, inv_flat.shape[0] - 1)] \
        if inv_flat is not None else flat_m

    st = _rebase(state, delta)
    g, bits = _gate(mcount, det_m, sync_m, sv_m, dphi_m, row_m,
                    hdr_rows, bits_rows, st, freqs, max_ppm, eof=False)

    # host-effective column positions: shard s column jj covers data
    # position s*Ml + 3*jj; kept columns are renumbered prepend + 3*rank
    W = pwr3.shape[1]
    X = W // Tn
    j = jnp.arange(W, dtype=jnp.int32)
    s, jj = j // X, j % X
    data_pos = s * jnp.int32(Ml) + 3 * jj
    n_drop = (data_pos < jnp.int32(prepend_dec)).sum().astype(jnp.int32)
    col_pos = jnp.int32(prepend_dec) + 3 * (j - n_drop)
    col_keep = j >= n_drop
    end_rel = jnp.int32(prepend_dec) + 3 * (W - n_drop)
    dec = _decisions(g["verdicts"], sync_m, bits, st, g["deferred_at"])
    nf_read, nf_new = _nf_track(g["verdicts"], sync_m, bits,
                                _mag(pwr3), col_pos, col_keep, st, dec,
                                g["deferred_at"], end_rel)
    new_state = _finish_state(g, dec, nf_new)
    merged = {"count": mcount, "det_idx": det_m, "sync_idx": sync_m,
              "dphi": dphi_m, "pherr": pherr_m, "sym_valid": sv_m,
              "l2_row": row_m}
    return _out(g, nf_read, new_state), merged, new_state


@partial(jax.jit, static_argnames=("eof",))
def gate_only(count, det_idx, sync_idx, sym_valid, dphi, l2_row,
              hdr_rows, bits_rows, delta, state, freqs, max_ppm,
              eof: bool = True):
    """Gate without fresh magnitude columns (the EOF flush path:
    finish() re-demodulates the carried halo; there are no new samples,
    but a resolution can still release the hold and replay the RING —
    the host's finish() does exactly that through decided())."""
    st = _rebase(state, delta)
    g, bits = _gate(count, det_idx, sync_idx, sym_valid, dphi, l2_row,
                    hdr_rows, bits_rows, st, freqs, max_ppm, eof=eof)
    C = det_idx.shape[0]
    dec = _decisions(g["verdicts"], sync_idx, bits, st,
                     g["deferred_at"])
    empty = jnp.zeros((C, 0), jnp.float32)
    nf_read, nf_new = _nf_track(g["verdicts"], sync_idx, bits, empty,
                                jnp.zeros((0,), jnp.int32), None, st,
                                dec, g["deferred_at"],
                                jnp.int32(_FLOOR))
    new_state = _finish_state(g, dec, nf_new)
    return _out(g, nf_read, new_state), new_state
