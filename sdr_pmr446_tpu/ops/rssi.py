"""Per-channel RSSI / squelch metric.

Reference: average_power (src/sdr_pmr446.c:330-336) — note it is the mean of
the *magnitude* (not energy): rssi = 20*log10(mean |x|).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def average_power_db(x: jax.Array, axis: int = -1) -> jax.Array:
    """20*log10(mean(|x|)) along ``axis`` (matches src/sdr_pmr446.c:330-336)."""
    a = jnp.mean(jnp.abs(x), axis=axis)
    return 20.0 * jnp.log10(jnp.maximum(a, 1e-30))


def subchunk_rssi(chan: jax.Array, num_subchunks: int) -> jax.Array:
    """chan: [16, T_a] -> rssi [K, 16] with T_a = K * ns."""
    c, t = chan.shape
    ns = t // num_subchunks
    blocks = chan.reshape(c, num_subchunks, ns)
    return jnp.moveaxis(average_power_db(blocks, axis=-1), 0, 1)
