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

Semantics replicated 1:1 from the host loop (pipeline.py), with one
derived simplification proven against it by tests/test_nf_gate.py and
the dual-mode pipeline differentials: the host's hold/replay magnitude
ring (ChannelState.nf_saved) never carries columns across a block
boundary on any reachable path —

* columns saved while a deferred burst is undecided are dropped at
  resolution whenever the resolving candidate claims a busy window
  (header-reject or accept), because every saved column precedes the
  resolution sync point and the claimed window starts there;
* a deferral whose re-detection vanished replays its saved columns
  within the same ``_finish_noise_block`` call that saved them;
* non-advancing resolutions (ppm/overflow/EOF) release the hold before
  any column was saved.

So per block the tracker is exactly: an EMA over the block's magnitude
columns restricted to a computable mask (pre-existing busy window,
per-candidate claimed windows, the hold drop-interval, the deferral
frontier), with a noise-floor update at every 1000th tracked column
and per-candidate state readings at each accept's sync point.  That is
a linear recurrence -> ``lax.associative_scan`` over affine maps (f32,
log-depth; MAG_LP = 0.9 forbids the closed-form inverse-power trick),
plus a tiny ``lax.scan`` over the <= M/1000 crossing slots.

The one pathological host path that DOES retain ring columns — a hold
whose position was never re-covered because the deferral fell outside
the carried halo (impossible while the halo >= a max-length burst) —
is approximated by not tracking those columns at all; divergence would
need base > hold, which the halo sizing rules out.

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
# claimed a busy window (the hold drop-interval cases).
ADVANCE_VERDICTS = (V_HDR_REJECT, V_ACCEPT)
# Verdicts that bump demod.sync.good (header fitted the block).
SYNC_GOOD_VERDICTS = (V_DEFER_DATA, V_HDR_REJECT, V_EOF_TRUNC,
                      V_PPM_REJECT, V_ACCEPT)

_FLOOR = -(1 << 30)        # "long in the past" clamp for rebased indices
MAX_DELTA = 1 << 29        # caller clamps base deltas here (semantically
                           # equivalent: anything further back is past)


def init_state(C: int) -> dict:
    """Fresh carried device state (mirrors ChannelState defaults)."""
    return {
        "busy_until": jnp.zeros((C,), jnp.int32),
        "next_det_min": jnp.zeros((C,), jnp.int32),
        "hold": jnp.zeros((C,), jnp.int32),
        "hold_active": jnp.zeros((C,), jnp.bool_),
        "mag_lp": jnp.zeros((C,), jnp.float32),
        "mag_nf": jnp.full((C,), 2.0, jnp.float32),
        "nfcnt": jnp.zeros((C,), jnp.int32),
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
    for k in ("busy_until", "next_det_min", "hold"):
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


def _nf_track(verdicts, sync_idx, bits, pwr3, col_pos, col_keep,
              state, deferred, end_rel):
    """Masked EMA + noise-floor crossings for one block's columns.

    ``col_pos`` (W,) int32: host-effective (rebased) decimated index of
    each magnitude column, strictly increasing.  ``col_keep``: columns
    the host would consider at all (mesh prepend re-reads drop some).
    Returns (nf_read (C,K), new mag_lp/mag_nf/nfcnt, hold bookkeeping
    inputs any_decided/first-slot info are computed here too).
    """
    C, K = verdicts.shape
    W = pwr3.shape[1]
    busy0 = state["busy_until"]
    hold0, hold_act = state["hold"], state["hold_active"]
    mag_lp0, mag_nf0, nfcnt0 = (state["mag_lp"], state["mag_nf"],
                                state["nfcnt"])

    # --- column mask ---------------------------------------------------
    total_syms = -(-bits // 3)
    is_rej = verdicts == V_HDR_REJECT
    is_acc = verdicts == V_ACCEPT
    win = is_rej | is_acc
    ws = sync_idx
    we = sync_idx + jnp.where(is_rej, 9 * SPS,
                              total_syms * SPS).astype(jnp.int32)
    a = jnp.searchsorted(col_pos, ws.reshape(-1)).reshape(C, K)
    b = jnp.searchsorted(col_pos, we.reshape(-1)).reshape(C, K)
    rows = jnp.arange(C, dtype=jnp.int32)[:, None]
    dlt = jnp.zeros((C, W + 1), jnp.int32)
    dlt = dlt.at[rows, a].add(win.astype(jnp.int32))
    dlt = dlt.at[rows, b].add(-win.astype(jnp.int32))
    inwin = jnp.cumsum(dlt, axis=1)[:, :W] > 0

    decided = _isin(verdicts, DECIDED_VERDICTS)
    any_dec = decided.any(axis=1)
    first = jnp.argmax(decided, axis=1)
    ar = jnp.arange(C)
    fv = verdicts[ar, first]
    fsync = sync_idx[ar, first]
    drop_end = jnp.where(hold_act & any_dec & _isin(fv, ADVANCE_VERDICTS),
                         fsync, jnp.int32(_FLOOR))
    low = jnp.maximum(busy0, drop_end)

    recovered = hold0 >= 0
    persist_unrec = hold_act & ~any_dec & ~recovered
    F = jnp.where(deferred >= 0, deferred,
                  jnp.where(persist_unrec, jnp.int32(_FLOOR),
                            jnp.int32(end_rel)))

    track = (col_pos[None, :] >= low[:, None]) \
        & (col_pos[None, :] < F[:, None]) & ~inwin
    if col_keep is not None:
        track = track & col_keep[None, :]

    # --- EMA over tracked columns (affine associative scan) ------------
    mag = jnp.sqrt(pwr3).astype(jnp.float16).astype(jnp.float32)
    scale = jnp.where(track, jnp.float32(MAG_LP), jnp.float32(1.0))
    off = jnp.where(track, jnp.float32(1.0 - MAG_LP) * mag,
                    jnp.float32(0.0))
    S, O = jax.lax.associative_scan(
        lambda l, r: (l[0] * r[0], l[1] * r[0] + r[1]),
        (scale, off), axis=1)
    y = S * mag_lp0[:, None] + O
    s_cnt = jnp.cumsum(track.astype(jnp.int32), axis=1)
    total_n = s_cnt[:, -1]

    # --- per-1000 noise-floor crossings --------------------------------
    cap = W // 1000 + 1
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)[None, :] * 1000 \
        - nfcnt0[:, None]
    jc = jax.vmap(lambda s, t: jnp.searchsorted(s, t))(s_cnt, targets)
    ncross = (nfcnt0 + total_n) // 1000
    valid_c = jnp.arange(1, cap + 1, dtype=jnp.int32)[None, :] \
        <= ncross[:, None]
    y_cross = jnp.take_along_axis(y, jnp.clip(jc, 0, W - 1), axis=1)

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

    # --- per-candidate noise-floor readings ----------------------------
    bound = jnp.searchsorted(col_pos, sync_idx.reshape(-1)) \
        .reshape(C, K)
    r = ((jc[:, None, :] < bound[:, :, None]) & valid_c[:, None, :]) \
        .sum(axis=2)
    nf_read = jnp.where(
        r > 0,
        jnp.take_along_axis(nf_seq, jnp.clip(r - 1, 0, cap - 1)[
            :, :].reshape(C, K), axis=1),
        mag_nf0[:, None])

    mag_lp1 = y[:, -1]
    nfcnt1 = (nfcnt0 + total_n) % 1000
    return nf_read, mag_lp1, mag_nf1, nfcnt1, any_dec, recovered


def _hold_update(state, any_dec, recovered, deferred):
    """Host _finish_noise_block + decided() hold bookkeeping."""
    hold0, hold_act = state["hold"], state["hold_active"]
    hold_mid_act = hold_act & ~any_dec          # decided => released
    keep = hold_mid_act & ~((deferred < 0) & recovered)  # vanish-release
    hold1_act = keep | (deferred >= 0)
    hold1 = jnp.where(
        deferred >= 0,
        jnp.where(keep, jnp.minimum(hold0, deferred), deferred),
        hold0)
    return hold1, hold1_act


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
    nf_read, mag_lp1, mag_nf1, nfcnt1, any_dec, recovered = _nf_track(
        g["verdicts"], sync_idx, bits, pwr3, col_pos, None, st,
        g["deferred_at"], end_rel)
    hold1, hold1_act = _hold_update(st, any_dec, recovered,
                                    g["deferred_at"])
    new_state = {
        "busy_until": g["busy_until"], "next_det_min": g["next_det_min"],
        "hold": hold1, "hold_active": hold1_act,
        "mag_lp": mag_lp1, "mag_nf": mag_nf1, "nfcnt": nfcnt1,
    }
    out = {"verdicts": g["verdicts"], "nf_read": nf_read,
           "deferred_at": g["deferred_at"], **new_state}
    return out, new_state


@partial(jax.jit, static_argnames=("eof",))
def gate_only(count, det_idx, sync_idx, sym_valid, dphi, l2_row,
              hdr_rows, bits_rows, delta, state, freqs, max_ppm,
              eof: bool = True):
    """Gate without magnitude columns (the EOF flush path: finish()
    re-demodulates the carried halo; there are no fresh samples, so the
    tracker state is read but not advanced — same as the host, whose
    finish() never stashes a noise block)."""
    st = _rebase(state, delta)
    g, _bits = _gate(count, det_idx, sync_idx, sym_valid, dphi, l2_row,
                     hdr_rows, bits_rows, st, freqs, max_ppm, eof=eof)
    nf_read = jnp.broadcast_to(st["mag_nf"][:, None], det_idx.shape)
    hold1, hold1_act = _hold_update(
        st, _isin(g["verdicts"], DECIDED_VERDICTS).any(axis=1),
        st["hold"] >= 0, g["deferred_at"])
    new_state = dict(st)
    new_state.update(busy_until=g["busy_until"],
                     next_det_min=g["next_det_min"],
                     hold=hold1, hold_active=hold1_act)
    out = {"verdicts": g["verdicts"], "nf_read": nf_read,
           "deferred_at": g["deferred_at"],
           **{k: new_state[k] for k in (
               "busy_until", "next_det_min", "hold", "hold_active",
               "mag_lp", "mag_nf", "nfcnt")}}
    return out, new_state
