"""Fused single-dispatch device step.

The axon TPU path has a ~30 ms fixed dispatch cost per jitted call, so
the whole per-block device pipeline — NCO mix, polyphase FIR decimate,
sync metric, candidate slicing, noise-floor magnitude taps — runs as
ONE jitted function.  Host transfers per block are the compact
candidate struct and the every-3rd-sample magnitudes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import SYNC_THRESHOLD
from ..dsp.demod import (Candidates, find_and_slice_impl,
                         find_candidates_impl)
from ..dsp.frontend import bandpass_channelize_impl


@partial(jax.jit, static_argnames=("oversample", "halo", "max_candidates",
                                   "max_symbols"))
def process_block(iq: jax.Array, taps: jax.Array, dphi: jax.Array,
                  n0: jax.Array, carry: jax.Array, hist: jax.Array,
                  oversample: int, halo: int,
                  threshold: float = SYNC_THRESHOLD,
                  max_candidates: int = 64, max_symbols: int = 5616):
    """One block through the full device pipeline.

    Args:
      iq: (2, N) planar wideband block.
      taps/dphi/n0: as in bandpass_channelize_impl.
      carry: (2, T-1) RAW wideband tail of the previous block.
      hist: (2, C, H) decimated halo from the previous block.
      halo: static halo length to keep for the next block.
    Returns:
      (candidates, new_hist, new_carry, pwr3) where pwr3 is the power
      of every 3rd fresh decimated sample (C, ceil(M/3)) for the
      noise-floor tracker.
    """
    dec, new_carry = bandpass_channelize_impl(
        iq, taps, dphi, n0, carry, oversample)
    block = jnp.concatenate([hist, dec], axis=2)
    cands = find_and_slice_impl(block, threshold, max_candidates,
                                max_symbols)
    keep = min(halo, block.shape[2])
    new_hist = block[:, :, block.shape[2] - keep:]
    pwr3 = dec[0, :, ::3] ** 2 + dec[1, :, ::3] ** 2
    return cands, new_hist, new_carry, pwr3


@partial(jax.jit, static_argnames=("oversample", "halo", "max_candidates",
                                   "max_symbols"))
def process_block_detect(iq: jax.Array, taps: jax.Array, dphi: jax.Array,
                         n0: jax.Array, carry: jax.Array,
                         hist: jax.Array, oversample: int, halo: int,
                         threshold: float = SYNC_THRESHOLD,
                         max_candidates: int = 64,
                         max_symbols: int = 5616):
    """process_block without the symbol slicing (device-L2 fast path).

    Returns ``(dets, phases, pwr, new_hist, new_carry, pwr3)``: the
    decimated block's phase and power planes (halo + fresh) stay
    device-resident so the compacted L2 launch
    (core/pipeline._launch_sliced_l2) can slice windows for the few
    real candidates only, instead of materializing every (C, K, S)
    slot — at wideband, ~GBs of HBM traffic per block for empty slots.
    phases/pwr are returned (same bytes as the raw planar block) so
    the L2 step never recomputes the full-block arctan2/square that
    detection already paid for.
    """
    dec, new_carry = bandpass_channelize_impl(
        iq, taps, dphi, n0, carry, oversample)
    block = jnp.concatenate([hist, dec], axis=2)
    phases = jnp.arctan2(block[1], block[0])
    pwr = block[0] * block[0] + block[1] * block[1]
    dets = find_candidates_impl(phases, threshold, max_candidates,
                                max_symbols)
    keep = min(halo, block.shape[2])
    new_hist = block[:, :, block.shape[2] - keep:]
    # noise-tracker stream: every 3rd decimated power of the FRESH
    # part; block == [hist | dec], so dec starts at column H
    pwr3 = pwr[:, hist.shape[2]::3]
    return dets, phases, pwr, new_hist, new_carry, pwr3
