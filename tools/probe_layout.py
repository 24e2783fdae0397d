"""Compile-only probes for Mosaic layout capabilities on the real backend.

Each probe is a minimal pallas kernel exercising ONE layout operation that a
future fused front-end->PFB (group-major) kernel would need.  PASS means the
op lowers on this Mosaic build; FAIL prints the first error line.  Compile
only — no execution, no device->host transfers (tunnel-safe).

Ops probed (the known-good baseline ops are included as controls):
  scratch_store_off16   write a [8,16] value into scratch at lane offset 16
                        (the proven pfb_demod win-assembly idiom; control)
  scratch_read_off16    read scratch[:, 16:144] (128 wide, lane offset 16)
  scratch_read_narrow   read scratch[:, 16:32] (16 wide, lane offset 16)
  value_lane_off16      slice a VALUE at lane offset 16 (expected FAIL per
                        CLAUDE.md; control for the probe harness itself)
  value_stride_sub      strided sublane read of a value x[0::16, :]
  reshape_rows_wide     in-kernel reshape [128,128] -> [8,2048] (group-major)
  reshape_25_16         in-kernel reshape [128,25] -> [200,16] (frame-major)
  transpose_16          [128,16] -> [16,128] .T (proven by pfb demod; control)
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def probe(name, fn, args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: PASS", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()
        head = next((ln for ln in msg if ln.strip()), "?")
        print(f"{name}: FAIL {type(e).__name__}: {head[:160]}", flush=True)
        return False


def _call(body, out_shape, scratch=None, n_in=1, in_shape=(8, 256)):
    def fn(*xs):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=([pltpu.VMEM(scratch, jnp.float32)]
                            if scratch else []),
        )(*xs)
    args = tuple(jnp.zeros(in_shape, jnp.float32) for _ in range(n_in))
    return fn, args


def main():
    ok = True

    def b_store16(x_ref, o_ref, s_ref):
        s_ref[:, :] = x_ref[:, :]
        s_ref[:, 16:32] = x_ref[:, 0:16]
        o_ref[:, :] = s_ref[:, 0:128]
    fn, args = _call(b_store16, (8, 128), scratch=(8, 256))
    ok &= probe("scratch_store_off16", fn, args)

    def b_read16(x_ref, o_ref, s_ref):
        s_ref[:, :] = x_ref[:, :]
        o_ref[:, :] = s_ref[:, 16:144]
    fn, args = _call(b_read16, (8, 128), scratch=(8, 256))
    ok &= probe("scratch_read_off16", fn, args)

    def b_readnarrow(x_ref, o_ref, s_ref):
        s_ref[:, :] = x_ref[:, :]
        o_ref[:, :] = s_ref[:, 16:32]
    fn, args = _call(b_readnarrow, (8, 16), scratch=(8, 256))
    ok &= probe("scratch_read_narrow", fn, args)

    def b_val16(x_ref, o_ref):
        x = x_ref[:, :]
        o_ref[:, :] = x[:, 16:144]
    fn, args = _call(b_val16, (8, 128))
    ok &= probe("value_lane_off16", fn, args)

    def b_stride(x_ref, o_ref):
        x = x_ref[:, :]
        o_ref[:, :] = x[0::16, :]
    fn, args = _call(b_stride, (8, 256), in_shape=(128, 256))
    ok &= probe("value_stride_sub", fn, args)

    def b_reshape_wide(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].reshape(8, 2048)
    fn, args = _call(b_reshape_wide, (8, 2048), in_shape=(128, 128))
    ok &= probe("reshape_rows_wide", fn, args)

    def b_reshape2516(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].reshape(200, 16)
    fn, args = _call(b_reshape2516, (200, 16), in_shape=(128, 25))
    ok &= probe("reshape_25_16", fn, args)

    def b_t16(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T
    fn, args = _call(b_t16, (16, 128), in_shape=(128, 16))
    ok &= probe("transpose_16", fn, args)

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
