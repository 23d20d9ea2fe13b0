"""Channelizer front-end: dequantize -> NCO mix -> FIR decimate.

Block-batched JAX implementation of the reference's per-sample loop
(demod.c:288-337): all channels are mixed from one shared wideband
block (a batch dimension, replacing the reference's thread-per-channel
fan-out), filtered with the Chebyshev-characteristic FIR
(dsp/chebyshev.py) and decimated to SPS samples/symbol in one strided
convolution that XLA maps onto the MXU.

Complex samples are carried as planar float32 pairs (leading axis 2 =
[re, im]) -- TPUs have no complex arithmetic type, and planar layout
keeps the convolution a pure real op.

The NCO phase accumulator is reproduced exactly: 24-bit fixed point,
phi_n = (n * dphi) mod 2^24 with dphi = (centerfreq - freq)/rate * 2^24
(demod.c:385), evaluated in closed form per sample index instead of
sequentially.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI_OVER_2_24 = 2.0 * np.pi / float(1 << 24)


def dequantize_u8(raw: jax.Array) -> jax.Array:
    """Map unsigned 8-bit samples onto (-1, 1) (demod.c:349-354)."""
    return (raw.astype(jnp.float32) - 127.5) / 127.5


def dequantize_s16(raw: jax.Array) -> jax.Array:
    """Map signed 16-bit samples onto [-1, 1) (demod.c:356-365)."""
    return raw.astype(jnp.float32) / 32768.0


def to_planar(iq: np.ndarray) -> np.ndarray:
    """Host complex array -> (2, N) float32 planar layout."""
    return np.stack([iq.real, iq.imag]).astype(np.float32)


def prepare_taps(taps: np.ndarray, oversample: int) -> np.ndarray:
    """Zero-pad taps to a multiple of the decimation factor.

    The polyphase convolution below folds the decimation phase into a
    feature dimension of width ``oversample``, which requires the tap
    count to tile evenly.  Trailing zeros only multiply samples older
    than the true impulse response, so the output is unchanged.
    """
    pad = (-len(taps)) % oversample
    return np.concatenate([np.asarray(taps, np.float32),
                           np.zeros(pad, np.float32)])


def mix_nco(iq: jax.Array, dphi: jax.Array, n0: jax.Array) -> jax.Array:
    """24-bit fixed-point NCO downmix (demod.c:312-317,385).

    ``iq``: (2, N) planar wideband samples whose first sample has
    global index ``n0`` (uint32, wraps mod 2^24); ``dphi``: (C,) uint32
    per-channel phase increments.  Returns (2, C, N) mixed samples.
    """
    N = iq.shape[1]
    n = (n0 + jnp.arange(N, dtype=jnp.uint32))
    phi = (n[None, :] * dphi[:, None]) & jnp.uint32(0xFFFFFF)
    angle = phi.astype(jnp.float32) * jnp.float32(_TWO_PI_OVER_2_24)
    cosw, sinw = jnp.cos(angle), jnp.sin(angle)      # (C, N)
    re, im = iq[0], iq[1]
    # (re + j im) * (cos + j sin)
    return jnp.stack([re[None, :] * cosw - im[None, :] * sinw,
                      im[None, :] * cosw + re[None, :] * sinw])


def mix_filter_decimate_impl(iq: jax.Array, taps: jax.Array,
                             dphi: jax.Array, n0: jax.Array,
                             carry: jax.Array, oversample: int
                             ) -> tuple[jax.Array, jax.Array]:
    """One front-end block for all channels (pure function, jit inside
    callers).

    Args:
      iq: (2, N) float32 planar wideband block, N % oversample == 0.
      taps: (T,) float32 FIR taps, T % oversample == 0 (prepare_taps).
      dphi: (C,) uint32 per-channel 24-bit NCO phase increments.
      n0: scalar uint32, global index of iq[0] modulo 2^24.
      carry: (2, C, T-1) float32 mixed-sample history from the previous
        block (zeros at stream start).
    Returns:
      (decimated (2, C, N // oversample) float32, new_carry).
    """
    N = iq.shape[1]
    T = taps.shape[0]
    os_ = oversample
    mixed = mix_nco(iq, dphi, n0)                    # (2, C, N)

    z = jnp.concatenate([carry, mixed], axis=2)      # (2, C, N + T - 1)
    new_carry = z[:, :, -(T - 1):] if T > 1 else z[:, :, :0]

    # Polyphase convolution: with the decimation offset applied
    # (first output is filtered sample index oversample-1), output j is
    #   y[j] = sum_t zs[os*j + t] * taps_rev[t],  t in [0, T)
    # Splitting t = os*q + r turns the decimation phase r into a
    # feature dimension of width `os` and the tap axis into a length
    # T/os window — a conv with a (1, os, T/os) kernel whose
    # os*(T/os)-wide contraction maps onto the MXU.
    C2 = 2 * z.shape[1]
    Q = T // os_
    zs = z[:, :, os_ - 1:]
    L = zs.shape[2]
    I = L // os_                                     # frame count
    frames = zs[:, :, :I * os_].reshape(C2, I, os_).transpose(0, 2, 1)
    taps_rev = taps[::-1]
    kernel = taps_rev.reshape(Q, os_).T[None]        # (1, os, Q)
    dec = jax.lax.conv_general_dilated(
        frames, kernel, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)[:, 0, :]  # (C2, I - Q + 1)
    M = N // os_
    return dec[:, :M].reshape(2, -1, M), new_carry


mix_filter_decimate = partial(jax.jit, static_argnames=("oversample",))(
    mix_filter_decimate_impl)


def bandpass_channelize_impl(iq: jax.Array, taps: jax.Array,
                             dphi: jax.Array, n0: jax.Array,
                             raw_carry: jax.Array, oversample: int
                             ) -> tuple[jax.Array, jax.Array]:
    """Mix-after-decimate front end: NCO folded into band-pass taps.

    Mathematically identical to :func:`mix_filter_decimate_impl` (up to
    f32 rounding) but an order of magnitude lighter on HBM: instead of
    materializing per-channel mixed samples (2, C, N), the conv reads
    the SHARED wideband block once for all channels with per-channel
    complex band-pass taps ``h_c[u] = taps[u] * e^{j phi_c(u)}``, and
    the channel mix becomes a residual rotation at the 1/oversample
    decimated rate.  Exactness: the reference's 24-bit fixed-point NCO
    phase (demod.c:385) is linear modulo 2^24, so
    ``phi(n - u) == phi(n) - phi(u) (mod 2pi)`` holds bit-for-bit in
    the phase accumulator.

    Args:
      iq: (2, N) float32 planar wideband block, N % oversample == 0.
      taps: (T,) float32 FIR taps, T % oversample == 0.
      dphi: (C,) uint32 per-channel 24-bit NCO phase increments.
      n0: scalar uint32, global index of iq[0] modulo 2^24.
      raw_carry: (2, T-1) float32 RAW wideband tail of the previous
        block (channel-independent — C-fold smaller than the mixed
        carry of mix_filter_decimate_impl).
    Returns:
      (decimated (2, C, N // oversample) float32, new_raw_carry).
    """
    N = iq.shape[1]
    T = taps.shape[0]
    os_ = oversample
    C = dphi.shape[0]
    M = N // os_

    # Complex band-pass taps (C, T): phase at tap index u is the exact
    # fixed-point accumulator value for sample offset u.  mix_nco
    # multiplies by e^{+j phi(n)}, so the taps carry the conjugate
    # e^{-j phi(u)} and the residual rotation is e^{+j phi(G_j)}.
    u = jnp.arange(T, dtype=jnp.uint32)
    phi_t = (u[None, :] * dphi[:, None]) & jnp.uint32(0xFFFFFF)
    ang_t = phi_t.astype(jnp.float32) * jnp.float32(_TWO_PI_OVER_2_24)
    cr = taps[None, :] * jnp.cos(ang_t)              # (C, T)
    ci = -taps[None, :] * jnp.sin(ang_t)
    cr_rev, ci_rev = cr[:, ::-1], ci[:, ::-1]

    # Kernel (out_features=2C, in_features=2, T) for the complex
    # correlation w = x * conj-free product (x_re + j x_im)(cr + j ci):
    #   w_re = x_re*cr - x_im*ci ;  w_im = x_re*ci + x_im*cr
    kernel = jnp.stack([jnp.stack([cr_rev, -ci_rev], axis=1),
                        jnp.stack([ci_rev, cr_rev], axis=1)], axis=0)
    kernel = kernel.reshape(2 * C, 2, T)             # (plane-major: re*C, im*C)

    xe = jnp.concatenate([raw_carry, iq], axis=1)    # (2, N + T - 1)
    # Tail drawn from carry||block so a short block (N < T-1) still
    # produces a correct full-width carry.
    new_carry = xe[:, xe.shape[1] - (T - 1):] if T > 1 else iq[:, :0]
    # First output taps window starts at xe index os-1 (the decimation
    # phase offset used by mix_filter_decimate_impl).  The strided
    # window contraction is laid out explicitly as ONE (M, 2T) x
    # (2T, 2C) matmul: XLA's strided conv lowering leaves the MXU ~1%
    # utilized at wideband (measured 116 ms/block), while the im2col
    # matmul runs it at speed — frames[j, i, q*os+r] = xe[i, os*(j+q)
    # + r + os-1], built from Q static slices of the os-folded block.
    Q = T // os_
    xr = xe[:, os_ - 1:]
    need = os_ * (M + Q)
    pad = need - xr.shape[1]
    if pad > 0:
        xr = jnp.pad(xr, ((0, 0), (0, pad)))
    X = xr[:, :need].reshape(2, M + Q, os_)
    frames = jnp.concatenate([X[:, q:q + M] for q in range(Q)],
                             axis=2)                 # (2, M, T)
    w = jnp.einsum("mk,ok->om",
                   frames.transpose(1, 0, 2).reshape(M, 2 * T),
                   kernel.reshape(2 * C, 2 * T),
                   preferred_element_type=jnp.float32)  # (2C, M)
    wr = w[:C]
    wi = w[C:]

    # Residual rotation e^{+j phi(G_j)} at the decimated rate, with
    # G_j = n0 + os*(j+1) - 1 the global raw index of output j.
    g = n0 + (jnp.arange(M, dtype=jnp.uint32) + 1) * jnp.uint32(os_) \
        - jnp.uint32(1)
    phi_g = (g[None, :] * dphi[:, None]) & jnp.uint32(0xFFFFFF)
    ang_g = phi_g.astype(jnp.float32) * jnp.float32(_TWO_PI_OVER_2_24)
    cg, sg = jnp.cos(ang_g), jnp.sin(ang_g)          # (C, M)
    dec = jnp.stack([wr * cg - wi * sg, wi * cg + wr * sg])
    return dec, new_carry


bandpass_channelize = partial(jax.jit, static_argnames=("oversample",))(
    bandpass_channelize_impl)


def nco_dphi(centerfreq: float, freq: float, sample_rate: float) -> np.uint32:
    """24-bit fixed-point NCO increment, matching demod.c:385."""
    return np.uint32(np.int64(int((float(centerfreq) - float(freq))
                                  / float(sample_rate) * 256.0 * 65536.0)))
