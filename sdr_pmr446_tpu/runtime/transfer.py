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
    # Probing with an actual int32 transfer can HANG (not just fail) on the
    # tunnel, so decide from the platform alone.  The f32 encode pass is
    # harmless (one fused cast kernel) on backends with full transfer
    # support, so default to encoding on every accelerator.
    return jax.devices()[0].platform != "cpu"


def _encode_leaf(x):
    if jnp.iscomplexobj(x):
        out = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(
            jnp.float32)
    else:
        out = x.astype(jnp.float32)
    # scalars and 0-d arrays transfer unreliably on the tunnel: ship as (1,)
    if out.ndim == 0:
        out = out.reshape((1,))
    return out


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
    shapes = [tuple(l.shape) for l in flat]
    enc = _encoder(treedef)(flat)
    host = [np.asarray(e) if e.size else np.zeros(e.shape, np.float32)
            for e in enc]
    out = []
    for h, dt, shp in zip(host, dtypes, shapes):
        if dt.kind == "c":
            v = (h[..., 0] + 1j * h[..., 1]).astype(dt)
        else:
            v = h.astype(dt)
        out.append(v.reshape(shp))
    return jax.tree.unflatten(treedef, out)
