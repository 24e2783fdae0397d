"""NBFM quadrature discriminator (freqdem equivalent).

Reference: liquid freqdem_create(0.5)/freqdem_demodulate_block
(src/sdr_pmr446.c:440,881; src/dsd_in.c:108,169).  The demodulator is
stateless math with a 1-sample halo:

    y[n] = angle(x[n] * conj(x[n-1])) / (2*pi*kf)

The carried state is the previous complex sample per stream (SURVEY.md §2c
"freqdem previous sample").
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C


def fm_init(channels: int | None = None) -> jax.Array:
    shape = () if channels is None else (channels,)
    return jnp.zeros(shape, jnp.complex64)


def fm_demod(prev: jax.Array, x: jax.Array, kf: float = C.FM_KF):
    """x: [..., T] complex; prev: [...] complex. Returns (new_prev, y [..., T])."""
    xp = jnp.concatenate([prev[..., None], x[..., :-1]], axis=-1)
    d = x * jnp.conj(xp)
    y = jnp.arctan2(d.imag, d.real) * (1.0 / (2.0 * math.pi * kf))
    return x[..., -1], y.astype(jnp.float32)
