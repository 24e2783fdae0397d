"""Empirically probe the MXU contract precision for f32 matmuls.

Mosaic only emits ``#tpu.contract_precision<fp32>`` for
``jax.lax.Precision.HIGHEST`` (jax/_src/pallas/mosaic/lowering.py); the
default attribute is whatever the backend picks.  The chain's kernels use
``jnp.dot(..., preferred_element_type=f32)`` with default precision, so
whether the heavy dots contract in bf16 (one MXU pass, inputs rounded to
8-bit mantissa) or true f32 (multi-pass) is BOTH a perf and a numerics
question — and the interpret-mode tests (CPU, true f32) cannot answer it.

Method: dot a [128, 256] matrix of ``1 + 2**-12`` (representable in f32,
rounds to exactly 1.0 in bf16) against ones.  f32 contraction gives
256 * (1 + 2**-12) = 256.0625 exactly; bf16 contraction gives 256.0;
bf16x3 (3-pass) recovers the f32 value.  Run once under default precision
and once under HIGHEST, inside a Pallas kernel and as a plain XLA dot.

Readback caveat (CLAUDE.md): fetches early in a fresh process are the
safe class; run this FIRST in its own process.  f32 2-D fetches are the
most reliable kind.  If the fetch hangs, run under ``timeout``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

EPS = 2.0 ** -12           # bf16(1 + 2^-12) == 1.0; f32 keeps it
K = 256                    # contraction depth: f32 sum = 256.0625 exactly


def _kernel(precision):
    def body(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    return body


def main() -> None:
    a = np.full((128, K), 1.0 + EPS, np.float32)
    b = np.ones((K, 128), np.float32)
    exact = K * (1.0 + EPS)            # 256.0625
    rounded = float(K)                 # 256.0

    for name, prec in (("default", None),
                       ("highest", jax.lax.Precision.HIGHEST)):
        out = pl.pallas_call(
            _kernel(prec),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(b))
        v = float(np.asarray(jax.device_get(out))[0, 0])
        verdict = ("f32-contract" if abs(v - exact) < 2 ** -8 else
                   "bf16-contract" if abs(v - rounded) < 2 ** -8 else
                   f"other ({v!r})")
        print(f"pallas  {name:8s}: {v!r}  -> {verdict}", flush=True)

    for name, prec in (("default", None),
                       ("highest", jax.lax.Precision.HIGHEST)):
        f = jax.jit(lambda x, y: jnp.dot(
            x, y, precision=prec, preferred_element_type=jnp.float32))
        v = float(np.asarray(jax.device_get(f(jnp.asarray(a),
                                              jnp.asarray(b))))[0, 0])
        verdict = ("f32-contract" if abs(v - exact) < 2 ** -8 else
                   "bf16-contract" if abs(v - rounded) < 2 ** -8 else
                   f"other ({v!r})")
        print(f"xla     {name:8s}: {v!r}  -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
