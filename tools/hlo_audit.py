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
                              [--physical]

Prints per-buffer lines (bytes, op, name hint) plus LOGICAL and PHYSICAL
(tile-padded — what the DMA actually moves, VERDICT r4 #1) totals in
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


def shape_physical_bytes(shape_str: str) -> int:
    """TILE-PADDED bytes of one laid-out HLO shape (VERDICT r4 #1).

    TPU layouts annotate every buffer with a minor-to-major permutation
    and a tiling, e.g. 'f32[16,392,25]{2,1,0:T(8,128)S(1)}': the array is
    permuted to physical order, then each of the k minor-most physical
    dims is padded up to a multiple of the k-dim tile — (8 sublanes, 128
    lanes) for f32 — and the padding occupies HBM and rides every DMA.
    [16,392,25] is physically 16*392*128 elements: 5.12x its logical
    size.  Sub-tiles like the (2,1) of bf16's T(8,128)(2,1) pack p
    sublanes per 32-bit word, padding the second-minor dim to a multiple
    of 8*p.  Shapes without a tiled layout return their logical bytes.
    """
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\](?:\{([^}]*)\})?", shape_str)
    if not m:
        return 0
    dt, dims_s, layout = m.groups()
    eb = _DTYPE_BYTES.get(dt, 4)
    dims = [int(d) for d in dims_s.split(",") if d]
    if not dims:
        return eb
    if not layout or ":" not in layout:
        n = 1
        for d in dims:
            n *= d
        return n * eb
    perm_s, rest = layout.split(":", 1)
    try:
        perm = [int(p) for p in perm_s.split(",")]
        assert sorted(perm) == list(range(len(dims)))
    except Exception:
        return shape_bytes(shape_str)
    phys = [dims[p] for p in reversed(perm)]       # major -> minor order
    tm = re.match(r"T((?:\([0-9,]+\))+)", rest)
    if tm:
        tiles = [tuple(int(v) for v in g.split(","))
                 for g in re.findall(r"\(([0-9,]+)\)", tm.group(1))]
        t0 = tiles[0]
        k = min(len(t0), len(phys))
        for i in range(k):
            d_i = len(phys) - k + i
            t_i = t0[len(t0) - k + i]
            phys[d_i] = -(-phys[d_i] // t_i) * t_i
        for st in tiles[1:]:
            # sub-tile (p, 1): p sublanes packed per word
            if len(st) == 2 and st[1] == 1 and len(phys) >= 2:
                step = t0[0] * st[0]
                phys[-2] = -(-phys[-2] // step) * step
    n = 1
    for d in phys:
        n *= d
    return n * eb


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
        pb = shape_physical_bytes(shape)
        if max(b, pb) >= min_bytes:
            yield b, pb, op, name, shape


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
    ap.add_argument("--physical", action="store_true",
                    help="sort by tile-padded physical bytes (both "
                         "totals are always printed)")
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

    key = (lambda r: r[1]) if args.physical else (lambda r: r[0])
    rows = sorted(audit_text(hlo, args.min_kib * 1024), key=key,
                  reverse=True)
    n_in = chain.input_len
    total = sum(r[0] for r in rows)
    ptotal = sum(r[1] for r in rows)
    print(f"# engine={args.engine} fmt={args.format} K={args.k} "
          f"fuse_ctcss={chain.fuse_ctcss} fuse_group={chain.fuse_group}")
    print(f"# {len(rows)} materialized ENTRY buffers >= {args.min_kib} KiB"
          f"; write totals: logical {total / n_in:.2f}, PHYSICAL "
          f"(tile-padded) {ptotal / n_in:.2f} B/input-sample")
    for b, pb, op, name, shape in rows[:args.top]:
        print(f"{b / n_in:8.3f} B/smp  phys {pb / n_in:8.3f} "
              f"(x{pb / max(b, 1):4.2f})  {op:<12} "
              f"{name[:36]:<36} {shape[:60]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
