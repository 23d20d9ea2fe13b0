"""Channelizer front-end: dequantize -> NCO mix -> FIR decimate.

Block-batched JAX implementation of the reference's per-sample loop
(demod.c:288-337): all channels are mixed from one shared wideband
block (a batch dimension, replacing the reference's thread-per-channel
fan-out), filtered with the Chebyshev-characteristic FIR
(dsp/chebyshev.py) and decimated to SPS samples/symbol in one strided
convolution that XLA maps onto the MXU.

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


@partial(jax.jit, static_argnames=("oversample",))
def mix_filter_decimate(iq: jax.Array, taps: jax.Array, dphi: jax.Array,
                        n0: jax.Array, carry: jax.Array, oversample: int
                        ) -> tuple[jax.Array, jax.Array]:
    """One front-end block for all channels.

    Args:
      iq: (N,) complex64 wideband baseband block, N % oversample == 0.
      taps: (T,) float32 FIR taps (Chebyshev impulse response).
      dphi: (C,) uint32 per-channel 24-bit NCO phase increments.
      n0: scalar uint32, global index of iq[0] modulo 2^24.
      carry: (C, T-1) complex64 mixed-sample history from the previous
        block (zeros at stream start).
    Returns:
      (decimated (C, N // oversample) complex64, new_carry (C, T-1)).
    """
    n = (n0 + jnp.arange(iq.shape[0], dtype=jnp.uint32))
    phi = (n[None, :] * dphi[:, None]) & jnp.uint32(0xFFFFFF)
    angle = phi.astype(jnp.float32) * jnp.float32(_TWO_PI_OVER_2_24)
    osc = jax.lax.complex(jnp.cos(angle), jnp.sin(angle))
    mixed = iq[None, :] * osc                       # (C, N)

    z = jnp.concatenate([carry, mixed], axis=1)     # (C, N + T - 1)
    new_carry = z[:, -(taps.shape[0] - 1):] if taps.shape[0] > 1 else z[:, :0]

    # Strided correlation with reversed taps == convolution;
    # offset oversample-1 keeps the reference's decimation phase
    # (first output is filtered sample index oversample-1).
    z = z[:, oversample - 1:]
    kernel = taps[::-1][None, None, :]
    def conv1d(x):
        return jax.lax.conv_general_dilated(
            x[:, None, :], kernel, window_strides=(oversample,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]
    dec = jax.lax.complex(conv1d(z.real), conv1d(z.imag))
    return dec.astype(jnp.complex64), new_carry.astype(jnp.complex64)


def nco_dphi(centerfreq: float, freq: float, sample_rate: float) -> np.uint32:
    """24-bit fixed-point NCO increment, matching demod.c:385."""
    return np.uint32(np.int64(int((float(centerfreq) - float(freq))
                                  / float(sample_rate) * 256.0 * 65536.0)))
