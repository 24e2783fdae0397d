"""Compile-only probe: does kernels/front_end.py lower on the real TPU?

Compiles (never runs) both front-end bodies at a small geometry, printing
one line per variant: PASS/FAIL + the first error line.  No device->host
transfers, safe on any tunnel.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from sdr_pmr446_tpu.kernels.front_end import PallasFrontEnd  # noqa: E402


def probe(name, fn, args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: PASS")
        return True
    except Exception as e:
        msg = str(e).splitlines()
        head = next((ln for ln in msg if ln.strip()), "?")
        print(f"{name}: FAIL {type(e).__name__}: {head[:200]}")
        for ln in msg[:30]:
            print(f"    {ln[:200]}")
        return False


def main():
    fe = PallasFrontEnd(tile_rows=448)
    dcx, dcy, hist = fe.init_state()
    t = 128 * 784            # one sub-chunk
    xr = jnp.zeros((t,), jnp.float32)
    xw = jnp.zeros((2 * t,), jnp.float32)
    ok = probe("planes", fe.apply_planes, (dcx, dcy, hist, xr, xr))
    ok &= probe("interleaved", fe.apply_interleaved, (dcx, dcy, hist, xw))
    ok &= probe("packed_cs16", fe.apply_packed, (dcx, dcy, hist, xr))
    few = PallasFrontEnd(tile_rows=448, wide=True)
    wdcx, wdcy, whist = few.init_state()
    xh = jnp.zeros((t // 2,), jnp.float32)
    ok &= probe("packed2_cu8",
                lambda a, b, c, d: few.apply_packed2(a, b, c, d, "cu8"),
                (wdcx, wdcy, whist, xh))
    ok &= probe("packed2_cs8",
                lambda a, b, c, d: few.apply_packed2(a, b, c, d, "cs8"),
                (wdcx, wdcy, whist, xh))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
