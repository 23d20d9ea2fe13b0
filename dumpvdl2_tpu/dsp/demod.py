"""Block-batched D8PSK frame sync and symbol slicer.

Replaces the reference's per-sample sync state machine
(demod.c:105-286) with whole-array operations over a block of
decimated samples:

* the preamble error metric is evaluated at EVERY sample (the
  reference skips 2 of 3 samples to save CPU; on TPU the dense
  evaluation is nearly free and strictly improves detection),
* sync points are local minima of the metric below threshold, with
  the same parabolic-vertex interpolation for the symbol clock,
* all candidate bursts in the block are demodulated in one batched
  gather instead of sequentially.

Each candidate yields a fixed-size symbol window; the bit-level L2
decoder consumes only the transmission length the burst header
declares.  Suppression of candidates inside an already-decoded burst
(the reference can't sync while in DM_SYNC) happens on the host,
where burst lengths are known.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (ARITY, GRAYCODE, PREAMBLE_PHASE_UNITS, PREAMBLE_SYMS,
                         SPS, SYNC_THRESHOLD)

# Cumulative preamble symbol phases, wrapped to (-pi, pi]
PR_PHASE = np.array(PREAMBLE_PHASE_UNITS, dtype=np.float32) * np.float32(np.pi / 4)

# Linear-regression constants over the 16 preamble symbols
_LR_X = np.arange(PREAMBLE_SYMS, dtype=np.float32) - (PREAMBLE_SYMS - 1) / 2.0
_LR_DENOM = float((_LR_X ** 2).sum())

_LOOKBACK = (PREAMBLE_SYMS - 1) * SPS  # oldest sample the metric reaches back to
_NMS_WIN = 2 * SPS    # duplicate-crossing suppression window (samples)

# Segmented first-K extraction (see find_candidates_impl): NMS-kept
# detections are > _NMS_WIN apart, so a _SEG-sample segment holds at
# most floor((_SEG-1)/(_NMS_WIN+1))+1 = 7 of them; _SEG_P = 8 adds a
# safety slot.
_SEG = 128
_SEG_P = (_SEG - 1) // (_NMS_WIN + 1) + 2


class Candidates(NamedTuple):
    """Fixed-size per-block candidate set (per channel)."""
    count: jax.Array      # (C,) int32 number of valid candidates (<= K)
    det_idx: jax.Array    # (C, K) int32 detection sample index, -1 if unused
    sync_idx: jax.Array   # (C, K) int32 sync point sp (symbol clock origin)
    dphi: jax.Array       # (C, K) f32 freq offset per symbol at the minimum
    pherr: jax.Array      # (C, K) f32 metric at the minimum
    symbols: jax.Array    # (C, K, S) uint8 gray-decoded 3-bit symbols
    sym_valid: jax.Array  # (C, K) int32 number of demodulable symbols
    power: jax.Array      # (C, K, S) f32 per-symbol power (|iq|^2)


class Detections(NamedTuple):
    """Candidate set WITHOUT the sliced symbol/power windows.

    The device-L2 pipeline slices symbols only for a compacted global
    candidate set (core/pipeline._launch_l2_sliced): materializing
    (C, K, S) windows for every slot costs ~GBs of HBM traffic per
    wideband block when almost all slots are empty, and was the single
    largest term in the round-4 end-to-end profile.
    """
    count: jax.Array      # (C,) int32
    det_idx: jax.Array    # (C, K) int32
    sync_idx: jax.Array   # (C, K) int32
    dphi: jax.Array       # (C, K) f32
    pherr: jax.Array      # (C, K) f32
    sym_valid: jax.Array  # (C, K) int32


def sync_error_metric(phases: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Preamble sync error and frequency offset at every sample.

    ``phases``: (C, M) f32 sample phases.  Returns (err, freq_err),
    each (C, M): err[n] is the residual sum-of-squares of the preamble
    fit ending at sample n (n >= 150; earlier entries use wrapped
    history and are masked by the caller), freq_err[n] the fitted
    per-symbol frequency offset.
    """
    C, M = phases.shape
    L = M - _LOOKBACK
    if L <= 0:
        # block shorter than the metric's lookback: nothing detectable
        return (jnp.full((C, M), jnp.inf, jnp.float32),
                jnp.zeros((C, M), jnp.float32))
    # sym[i, :, n] = phase at sample (n + 150) - (15-i)*10
    sym = jnp.stack([phases[:, i * SPS: L + i * SPS]
                     for i in range(PREAMBLE_SYMS)])          # (16, C, L)
    err = sym - jnp.asarray(PR_PHASE)[:, None, None]
    # unwrap along the symbol axis: remove jumps larger than pi
    d = jnp.diff(err, axis=0)
    adj = jnp.where(d > jnp.pi, -2 * jnp.pi, 0.0) + \
        jnp.where(d < -jnp.pi, 2 * jnp.pi, 0.0)
    unwrap = jnp.concatenate([jnp.zeros_like(adj[:1]),
                              jnp.cumsum(adj, axis=0)], axis=0)
    errvec = err + unwrap
    errvec = errvec - errvec.mean(axis=0, keepdims=True)
    lr_x = jnp.asarray(_LR_X)[:, None, None]
    freq = (lr_x * errvec).sum(axis=0) / _LR_DENOM            # (C, L)
    resid = errvec - freq * lr_x
    e = (resid * resid).sum(axis=0)                           # (C, L)
    pad = jnp.full((C, _LOOKBACK), jnp.inf, dtype=e.dtype)
    return (jnp.concatenate([pad, e], axis=1),
            jnp.concatenate([jnp.zeros((C, _LOOKBACK), freq.dtype), freq],
                            axis=1))


def _resolve_pallas_dispatch() -> bool:
    """Decide ONCE whether the Pallas sync kernel is used.

    Resolved lazily on first trace and cached, so the jit cache can
    never hold a stale decision; DUMPVDL2_TPU_PALLAS=0 must be set
    before the first pipeline trace to take effect (documented in
    README).  The kernel only runs when the default backend is TPU —
    on CPU/GPU the XLA metric is the executable spec.
    """
    import os
    return (os.environ.get("DUMPVDL2_TPU_PALLAS", "auto") != "0"
            and jax.default_backend() == "tpu")


_USE_PALLAS: bool | None = None


def _metric(phases: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Backend dispatch: fused Pallas kernel on TPU, XLA elsewhere.

    The Pallas kernel (dsp/sync_pallas.py) computes the identical
    metric with one VMEM pass instead of a 16-deep HBM stack; the XLA
    path remains the executable spec (and the CPU/simulated-mesh
    path).  Set DUMPVDL2_TPU_PALLAS=0 to force the XLA path on TPU.
    """
    global _USE_PALLAS
    if _USE_PALLAS is None:
        _USE_PALLAS = _resolve_pallas_dispatch()
    if _USE_PALLAS:
        from .sync_pallas import sync_error_metric_pallas
        return sync_error_metric_pallas(phases)
    return sync_error_metric(phases)


def _parabola_vertex(y1: jax.Array, y2: jax.Array, y3: jax.Array) -> jax.Array:
    """Vertex x of the parabola through (-2,y1), (-1,y2), (0,y3)."""
    a = (y1 - 2.0 * y2 + y3) / 2.0
    b = (3.0 * y3 - 4.0 * y2 + y1) / 2.0
    safe = jnp.abs(a) > 1e-12
    return jnp.where(safe, -b / (2.0 * jnp.where(safe, a, 1.0)), -1.0)


def find_candidates_impl(phases: jax.Array,
                         threshold: float = SYNC_THRESHOLD,
                         max_candidates: int = 64, max_symbols: int = 5616,
                         detect_lo: int = 0, detect_hi: int | None = None
                         ) -> Detections:
    """Locate sync points in a block (detection only, no slicing).

    ``phases``: (C, M) f32 sample phases.  Returns per-channel
    Detections; ``detect_lo``/``detect_hi`` as in find_and_slice_impl.
    """
    C, M = phases.shape
    K, S = max_candidates, max_symbols
    err, freq = _metric(phases)

    # Detection: the metric passed a below-threshold local minimum.
    e0, e1 = err, jnp.roll(err, 1, axis=1)
    mask = (e1 < threshold) & (e0 > e1)
    mask = mask.at[:, :max(_LOOKBACK + 2, detect_lo)].set(False)
    if detect_hi is not None and detect_hi < M:
        mask = mask.at[:, detect_hi:].set(False)

    # Collapse duplicate crossings of ONE preamble dip: at marginal
    # SNR the noisy metric re-crosses its own minimum several times
    # within a few samples, and each crossing would burn a candidate
    # slot (the reference's serial state machine fires once per dip —
    # demod.c:173-185 resets pherr after a sync).  Keep only cluster
    # leaders: a detection with another crossing in the preceding
    # _NMS_WIN samples is the same dip re-crossed.  Behavior-neutral
    # for the host: post-leader candidates inside the window were
    # always discarded by its busy gating (9 symbols = 90 samples
    # after even a failed header), but they no longer consume K slots.
    m = mask.astype(jnp.int32)
    cs = jnp.cumsum(m, axis=1)
    hi = jnp.roll(cs, 1, axis=1).at[:, 0].set(0)            # cs[i-1]
    lo = jnp.roll(cs, _NMS_WIN + 1, axis=1)
    lo = lo.at[:, :_NMS_WIN + 1].set(0)                     # cs[i-W-1]
    mask = mask & ((hi - lo) == 0)

    # First K detections per channel, in time order.  A direct
    # lax.top_k over (C, M) sorts the whole row (~50 ms/block at
    # wideband); instead exploit the NMS guarantee that kept
    # detections are > _NMS_WIN samples apart: a segment of _SEG
    # samples holds at most _SEG_P of them, so extract each segment's
    # detections by within-segment rank (P masked min-reductions, pure
    # VPU) and run the top-K over the tiny (C, G*P) segment table.
    # Ordering is preserved: slots ascend within a segment, segments
    # ascend, and empty slots carry the sentinel M which sorts last —
    # the result is element-identical to the full top_k.
    pos = jnp.where(mask, jnp.arange(M, dtype=jnp.int32), M)
    G = -(-M // _SEG)
    pad_m = G * _SEG - M
    m3 = jnp.pad(mask, ((0, 0), (0, pad_m))).reshape(C, G, _SEG)
    pos3 = jnp.pad(pos, ((0, 0), (0, pad_m)),
                   constant_values=M).reshape(C, G, _SEG)
    seg_rank = jnp.cumsum(m3.astype(jnp.int32), axis=2) - 1
    segpos = [jnp.min(jnp.where(m3 & (seg_rank == p), pos3, M), axis=2)
              for p in range(_SEG_P)]
    flat = jnp.stack(segpos, axis=2).reshape(C, G * _SEG_P)
    if G * _SEG_P < K:
        flat = jnp.pad(flat, ((0, 0), (0, K - G * _SEG_P)),
                       constant_values=M)
    neg, _ = jax.lax.top_k(-flat, K)                          # (C, K)
    det_sorted = -neg                                          # ascending
    valid = det_sorted < M
    det_idx = jnp.where(valid, det_sorted, -1)
    count = mask.sum(axis=1).astype(jnp.int32)

    def take(arr, idx):
        return jnp.take_along_axis(arr, jnp.maximum(idx, 0), axis=1)

    y3 = take(err, det_idx)
    y2 = take(err, det_idx - 1)
    y1 = take(err, det_idx - 2)
    vertex = _parabola_vertex(y1, y2, y3)
    sclk = jnp.round(-vertex).astype(jnp.int32)
    sync_idx = jnp.where(valid, det_idx - sclk, -1)
    dphi = take(freq, det_idx - 1)
    pherr = y2

    # number of demodulable symbols: sp + SPS*j must stay inside M
    nvalid = jnp.clip((M - 1 - sync_idx) // SPS, 0, S)
    sym_valid = jnp.where(valid, nvalid.astype(jnp.int32), 0)
    return Detections(count=count, det_idx=det_idx, sync_idx=sync_idx,
                      dphi=dphi, pherr=pherr, sym_valid=sym_valid)


def demod_window(sym_phase: jax.Array, power_all: jax.Array,
                 dphi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """D8PSK-demodulate sliced symbol windows.

    ``sym_phase``/``power_all``: (..., S+1) phase / power at the symbol
    clock; ``dphi``: (...,) fitted per-symbol frequency offset.
    Returns (symbols uint8, power f32), each (..., S).
    """
    dp = sym_phase[..., 1:] - sym_phase[..., :-1] - dphi[..., None]
    dp = jnp.where(dp < 0, dp + 2 * jnp.pi, dp)
    dp = jnp.where(dp > 2 * jnp.pi, dp - 2 * jnp.pi, dp)
    idx = jnp.round(dp / (jnp.pi / 4)).astype(jnp.int32) % ARITY
    symbols = jnp.asarray(GRAYCODE, dtype=jnp.uint8)[idx]
    return symbols, power_all[..., 1:]


def find_and_slice_impl(iq: jax.Array, threshold: float = SYNC_THRESHOLD,
                        max_candidates: int = 64, max_symbols: int = 5616,
                        detect_lo: int = 0, detect_hi: int | None = None
                        ) -> Candidates:
    """Locate sync points in a block and demodulate candidate bursts.

    ``iq``: (2, C, M) float32 planar decimated channel samples
    (history/halo already prepended by the caller).

    ``detect_lo``/``detect_hi`` restrict where *detections* may fire
    (slicing still uses the whole array) — used by the sharded pipeline
    to prevent duplicate detections in exchanged halo regions.
    """
    _, C, M = iq.shape
    K, S = max_candidates, max_symbols
    re, im = iq[0], iq[1]
    phases = jnp.arctan2(im, re)
    d = find_candidates_impl(phases, threshold, K, S, detect_lo,
                             detect_hi)

    # Batched symbol slicing: one contiguous dynamic slice per
    # candidate (cheap DMA) then a static stride, instead of a huge
    # elementwise gather.
    W = S * SPS + 1
    pwr = re * re + im * im
    ph_pad = jnp.pad(phases, ((0, 0), (0, W)))
    pw_pad = jnp.pad(pwr, ((0, 0), (0, W)))

    def slice_one(ph_c: jax.Array, pw_c: jax.Array, sp: jax.Array):
        start = jnp.clip(sp, 0, M)
        w = jax.lax.dynamic_slice(ph_c, (start,), (W,))
        p = jax.lax.dynamic_slice(pw_c, (start,), (W,))
        return w[::SPS], p[::SPS]                             # (S+1,) each

    sym_phase, power_all = jax.vmap(
        jax.vmap(slice_one, in_axes=(None, None, 0)),
        in_axes=(0, 0, 0))(ph_pad, pw_pad, d.sync_idx)        # (C, K, S+1)

    symbols, power = demod_window(sym_phase, power_all, d.dphi)
    return Candidates(count=d.count, det_idx=d.det_idx,
                      sync_idx=d.sync_idx, dphi=d.dphi, pherr=d.pherr,
                      symbols=symbols, sym_valid=d.sym_valid,
                      power=power)


find_and_slice = partial(jax.jit,
                         static_argnames=("max_candidates", "max_symbols",
                                          "detect_lo", "detect_hi"))(
    find_and_slice_impl)
