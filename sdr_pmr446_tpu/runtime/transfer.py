"""Device->host fetch with float32 transport encoding.

The axon TPU tunnel in this environment only implements device->host
transfers for float32 — complex64/int32/bool all fail.  ``fetch`` casts every
leaf to a float32 representation on device (one tiny jitted pass), transfers,
and decodes on host.  Lossless for this framework's value ranges (ints are
channel indices / counts < 2^24; complex becomes stacked re/im).

On backends with full transfer support (CPU, standard TPU), ``fetch`` is a
plain device_get.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _needs_encoding() -> bool:
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        return False
    try:
        np.asarray(jnp.zeros((1,), jnp.int32))
        return False
    except Exception:
        return True


def _encode_leaf(x):
    if jnp.iscomplexobj(x):
        return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(
            jnp.float32)
    return x.astype(jnp.float32)


@functools.lru_cache(maxsize=32)
def _encoder(treedef):
    def enc(flat):
        leaves = jax.tree.unflatten(treedef, flat)
        return [_encode_leaf(l) for l in jax.tree.leaves(leaves)]
    return jax.jit(enc)


def fetch(tree):
    """Device pytree -> host (NumPy) pytree, dtype-preserving."""
    if not _needs_encoding():
        return jax.tree.map(np.asarray, tree)
    flat, treedef = jax.tree.flatten(tree)
    dtypes = [np.dtype(l.dtype) for l in flat]
    enc = _encoder(treedef)(flat)
    host = [np.asarray(e) for e in enc]
    out = []
    for h, dt in zip(host, dtypes):
        if dt.kind == "c":
            out.append((h[..., 0] + 1j * h[..., 1]).astype(dt))
        else:
            out.append(h.astype(dt))
    return jax.tree.unflatten(treedef, out)
