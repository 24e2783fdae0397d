"""Optimized-HLO buffer audit of the compiled scanner step.

The traffic model (utils/traffic.py) counts kernel-BOUNDARY bytes; XLA can
add hidden "glue" passes (relayouts, pads, concats) between the kernels
that the model never sees — in round 3 those measured 2-3x the modeled
traffic (RESULTS.md "hidden-glue audit").  This tool compiles the chain
step for a given geometry and counts every materialized ENTRY-computation
buffer in the optimized HLO: each non-parameter, non-tuple buffer >= 64 KiB
is one HBM write (and usually one read by its consumer).  Compile-only —
no device execution, safe on any tunnel.

    python tools/hlo_audit.py [--k 8] [--format cf32w] [--engine pallas]
                              [--no-fuse-ctcss] [--no-fuse-group] [--top 40]

Prints per-buffer lines (bytes, op, name hint) plus a total in
B/input-sample to compare against tools/traffic_model.py.
"""

import argparse
import os
import re
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from sdr_pmr446_tpu import config as C                        # noqa: E402
from sdr_pmr446_tpu.scanner.chain import (ScannerChain,       # noqa: E402
                                          make_runtime_params)

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "c64": 8, "f64": 8,
                "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "s64": 8, "u64": 8, "c128": 16}


def shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape literal like 'f32[16,1280,128]{...}'."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def audit_text(hlo: str, min_bytes: int):
    """Yield (bytes, line) for every materialized ENTRY buffer."""
    in_entry = False
    for line in hlo.splitlines():
        ls = line.strip()
        if ls.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ls == "}":
            break
        if not in_entry:
            continue
        m = re.match(r"(%?[\w.\-]+) = ([a-z0-9]+\[[0-9,]*\][^ ]*) (\w+)",
                     ls)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in ("parameter", "tuple", "get-tuple-element", "constant",
                  "bitcast"):
            continue
        b = shape_bytes(shape)
        if b >= min_bytes:
            yield b, op, name, shape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--format", default="cf32w")
    ap.add_argument("--engine", default="pallas",
                    choices=["pallas", "xla"])
    ap.add_argument("--no-fuse-ctcss", action="store_true")
    ap.add_argument("--no-fuse-group", action="store_true")
    ap.add_argument("--waterfall", type=int, default=0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--min-kib", type=int, default=64)
    args = ap.parse_args()

    chain = ScannerChain(
        C.BlockConfig(args.k), use_pallas=(args.engine == "pallas"),
        pallas_tiles=(1024, 512, 256), input_format=args.format,
        waterfall=args.waterfall,
        fuse_ctcss=not args.no_fuse_ctcss,
        fuse_group=not args.no_fuse_group)
    state = chain.init_state()
    if args.format == "cf32":
        iq = jnp.zeros(chain.step_arg_shape, jnp.complex64)
    else:
        iq = jnp.zeros(chain.step_arg_shape, jnp.float32)
    params = make_runtime_params(C.ScannerArgs())
    compiled = jax.jit(chain._step_impl).lower(state, iq, params).compile()
    hlo = compiled.as_text()

    rows = sorted(audit_text(hlo, args.min_kib * 1024), reverse=True)
    n_in = chain.input_len
    total = sum(r[0] for r in rows)
    print(f"# engine={args.engine} fmt={args.format} K={args.k} "
          f"fuse_ctcss={chain.fuse_ctcss} fuse_group={chain.fuse_group}")
    print(f"# {len(rows)} materialized ENTRY buffers >= {args.min_kib} KiB"
          f"; write total {total / n_in:.2f} B/input-sample")
    for b, op, name, shape in rows[:args.top]:
        print(f"{b / n_in:8.3f} B/smp  {b / 1024:10.0f} KiB  {op:<12} "
              f"{name[:40]:<40} {shape[:60]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
