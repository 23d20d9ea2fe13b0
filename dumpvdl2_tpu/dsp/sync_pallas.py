"""Pallas TPU kernel for the D8PSK preamble sync error metric.

The pure-XLA metric (dsp/demod.py:sync_error_metric) materializes a
16-deep stack of shifted phase arrays plus ~6 same-sized intermediates
in HBM — several hundred MB of traffic per wideband block.  This
kernel fuses the whole 16-symbol regression (shift -> unwrap ->
de-mean -> linear fit -> residual) into one VMEM pass: phases are read
once, err/freq written once.

Reference behavior reproduced: demod.c:105-198 (preamble phase ramp
fit with unwrap, mean removal, linear regression, residual
sum-of-squares), evaluated at EVERY decimated sample (the reference
skips 2 of 3 to save CPU; dense evaluation on TPU is ~free).

Layout: channels ride the sublane axis (padded to 8), time the lane
axis.  The grid walks time tiles; each tile DMAs its (C, TILE + halo)
phase window from HBM into VMEM and runs the 16-tap regression as
statically unrolled vector ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PREAMBLE_PHASE_UNITS, PREAMBLE_SYMS, SPS

PR_PHASE = np.array(PREAMBLE_PHASE_UNITS, np.float32) * np.float32(np.pi / 4)
_LR_X = np.arange(PREAMBLE_SYMS, dtype=np.float32) - (PREAMBLE_SYMS - 1) / 2.0
_LR_DENOM = float((_LR_X ** 2).sum())
LOOKBACK = (PREAMBLE_SYMS - 1) * SPS        # 150 decimated samples

_TILE = 2048                                # output lanes per grid step
# Window width per grid step is _TILE + _HALO; Mosaic requires the
# lane extent of a manual-DMA slice to be a multiple of 128, so the
# halo must keep 2048 + _HALO % 128 == 0 (2048+256 = 2304 = 18*128).
_HALO = 256                                 # >= LOOKBACK, 128-aligned window
_CB = 8                                     # channels per grid step (sublane)
_TWO_PI = float(2.0 * np.pi)


def _metric_kernel(ph_hbm, err_ref, freq_ref, win_ref, sem):
    c = pl.program_id(0)
    i = pl.program_id(1)
    # Overlapping window: output cols [i*TILE, i*TILE+TILE) of the
    # (front-padded) phase array need input cols
    # [i*TILE + HALO - LOOKBACK, i*TILE + HALO + TILE).  Channels are
    # tiled in sublane-aligned groups of _CB so wide channel counts
    # (e.g. the 256-channel config) never exceed the VMEM budget.
    cp = pltpu.make_async_copy(
        ph_hbm.at[pl.ds(c * _CB, _CB), pl.ds(i * _TILE, _TILE + _HALO)],
        win_ref, sem)
    cp.start()
    cp.wait()

    off = _HALO - LOOKBACK
    pi = jnp.float32(np.pi)

    # sym[k] = phase at output sample n shifted back (15-k) symbols
    sym = [win_ref[:, pl.ds(off + k * SPS, _TILE)]
           for k in range(PREAMBLE_SYMS)]
    err = [s - jnp.float32(PR_PHASE[k]) for k, s in enumerate(sym)]

    # Unwrap along the symbol axis (statically unrolled cumsum of
    # +-2pi adjustments, demod.c:139-151).
    cum = jnp.zeros_like(err[0])
    errvec = [err[0]]
    for k in range(1, PREAMBLE_SYMS):
        d = err[k] - err[k - 1]
        cum = cum + jnp.where(d > pi, jnp.float32(-_TWO_PI), 0.0) \
                  + jnp.where(d < -pi, jnp.float32(_TWO_PI), 0.0)
        errvec.append(err[k] + cum)

    mean = errvec[0]
    for k in range(1, PREAMBLE_SYMS):
        mean = mean + errvec[k]
    mean = mean * jnp.float32(1.0 / PREAMBLE_SYMS)

    freq = jnp.zeros_like(mean)
    for k in range(PREAMBLE_SYMS):
        freq = freq + jnp.float32(_LR_X[k]) * (errvec[k] - mean)
    freq = freq * jnp.float32(1.0 / _LR_DENOM)

    e = jnp.zeros_like(mean)
    for k in range(PREAMBLE_SYMS):
        r = (errvec[k] - mean) - freq * jnp.float32(_LR_X[k])
        e = e + r * r

    err_ref[:, :] = e
    freq_ref[:, :] = freq


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(jax.jit, static_argnames=("interpret",))
def sync_error_metric_pallas(phases: jax.Array, interpret: bool = False
                             ) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for dsp.demod.sync_error_metric.

    ``phases``: (C, M) f32.  Returns (err, freq), each (C, M); the
    first LOOKBACK columns of err are +inf (insufficient history), of
    freq zero — same contract as the XLA version.
    """
    C, M = phases.shape
    Cp = _pad_up(max(C, 1), _CB)
    Mp = _pad_up(max(M, 1), _TILE)
    # Front pad by HALO so tile 0's window read stays in bounds; pad
    # channels to the channel-tile multiple and time to the tile multiple.
    ph = jnp.pad(phases, ((0, Cp - C), (_HALO, Mp - M)))
    grid = (Cp // _CB, Mp // _TILE)
    err_p, freq_p = pl.pallas_call(
        _metric_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((_CB, _TILE), lambda c, i: (c, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CB, _TILE), lambda c, i: (c, i),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Cp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((Cp, Mp), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((_CB, _TILE + _HALO), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(ph)
    err = err_p[:C, :M]
    freq = freq_p[:C, :M]
    mask = jnp.arange(M) < LOOKBACK
    err = jnp.where(mask[None, :], jnp.inf, err)
    freq = jnp.where(mask[None, :], 0.0, freq)
    return err, freq
