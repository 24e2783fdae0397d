"""In-kernel math helpers for Pallas TPU (Mosaic has no atan2 primitive).

Branch-free atan2 via an odd minimax polynomial for atan on [0, 1] plus
octant reconstruction — all VPU ops (abs/min/max/div/select/FMA).  Max error
~1e-5 rad, i.e. ~-100 dB against full-scale NBFM audio — far below the f32
chain's own noise floor.

Edge cases match C's atan2 except atan2(+-0, x<0) (returns 0, C returns
+-pi) — a measure-zero input for the discriminator (requires an exact 180
degree phase step with exactly zero imaginary part).
"""

from __future__ import annotations

import jax.numpy as jnp

# odd minimax coefficients for atan(z), z in [-1, 1] (max err ~1e-5 rad)
_A = (0.99997726, -0.33262347, 0.19354346, -0.11643287, 0.05265332,
      -0.01172120)

_HALF_PI = 1.5707963267948966
_PI = 3.141592653589793


def atan_unit(z):
    """atan(z) for |z| <= 1 via odd polynomial in z."""
    zz = z * z
    p = _A[5]
    for a in reversed(_A[:5]):
        p = p * zz + a
    return z * p


def atan2(y, x):
    """Branch-free atan2(y, x) from VPU-lowerable primitives."""
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    a = atan_unit(z)
    a = jnp.where(ay > ax, _HALF_PI - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)
