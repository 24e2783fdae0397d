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
bf16x3 (3-pass) recovers the f32 value.  Probed under default precision
and HIGHEST, inside a Pallas kernel and as a plain XLA dot.

Isolation (ADVICE r3): a matmul is outside the tunnel's 'trivial
single-op' transfer-safe class, so the first fetch after a dot can poison
the process.  Each (path, precision) combination therefore runs in its
OWN subprocess (``--one PATH PREC``) with exactly one compute->fetch
round-trip; the default mode forks the four probes and aggregates.
Run under ``timeout`` if invoking --one by hand.
"""

from __future__ import annotations

import os
import subprocess
import sys

EPS = 2.0 ** -12           # bf16(1 + 2^-12) == 1.0; f32 keeps it
K = 256                    # contraction depth: f32 sum = 256.0625 exactly
COMBOS = [("pallas", "default"), ("pallas", "highest"),
          ("xla", "default"), ("xla", "highest")]


def _probe_one(path: str, prec_name: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    prec = None if prec_name == "default" else jax.lax.Precision.HIGHEST
    a = np.full((128, K), 1.0 + EPS, np.float32)
    b = np.ones((K, 128), np.float32)
    exact = K * (1.0 + EPS)            # 256.0625
    rounded = float(K)                 # 256.0

    if path == "pallas":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def body(a_ref, b_ref, o_ref):
            o_ref[:, :] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(b))
    else:
        f = jax.jit(lambda x, y: jnp.dot(
            x, y, precision=prec, preferred_element_type=jnp.float32))
        out = f(jnp.asarray(a), jnp.asarray(b))

    v = float(np.asarray(jax.device_get(out))[0, 0])
    verdict = ("f32-contract" if abs(v - exact) < 2 ** -8 else
               "bf16-contract" if abs(v - rounded) < 2 ** -8 else
               f"other ({v!r})")
    print(f"{path:7s} {prec_name:8s}: {v!r}  -> {verdict}", flush=True)


def main() -> None:
    if len(sys.argv) == 4 and sys.argv[1] == "--one":
        _probe_one(sys.argv[2], sys.argv[3])
        return
    for path, prec in COMBOS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", path, prec],
            capture_output=True, text=True, timeout=1800)
        line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
        if r.returncode != 0:
            tail = (r.stderr.strip().splitlines() or ["?"])[-1]
            line = f"{path:7s} {prec:8s}: FAILED rc={r.returncode} ({tail})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
