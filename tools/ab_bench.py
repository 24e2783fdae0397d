"""In-process interleaved A/B bench: XLA chain vs Pallas chain.

One process, one tunnel session: both step functions compiled up front,
then measured in alternating short segments so tunnel latency drift hits
both equally.  Reports per-segment and median throughput.

Every step gets unique arguments (rotated signal realizations + jittered
squelch scalar) — with a single repeated block the carried histories reach
a bit-exact fixpoint and the tunnel elides repeated executions (see
tools/bw_check.py / bench.py::_measure).
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--subchunks-per-step", type=int, default=160)
    p.add_argument("--segments", type=int, default=6)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--rot", type=int, default=4,
                   help="distinct input realizations rotated across steps")
    p.add_argument("--mode", choices=["engines", "fusion", "ctcss",
                                      "group", "precision", "band"],
                   default="engines",
                   help="engines: XLA vs fused-Pallas (cf32 input); "
                        "fusion: Pallas cf32w with the lp-DC/RSSI kernel "
                        "fusions ON vs OFF (isolates VERDICT r2 #1's "
                        "saving from tunnel drift); ctcss: the in-kernel "
                        "CTCSS DFT (lp plane never in HBM) ON vs OFF; "
                        "group: the GROUP-major band handoff ON vs OFF; "
                        "precision: kernel dots at HIGHEST (true f32, the "
                        "default policy) vs DEFAULT (single-pass bf16 "
                        "contraction — see kernels/precision.py); "
                        "band: front+PFB as ONE kernel (kernels/duo.py) "
                        "vs the two-kernel group path")
    args = p.parse_args()

    k = args.subchunks_per_step
    params = make_runtime_params(C.ScannerArgs())
    n = C.BlockConfig(k).input_len

    if args.mode == "engines":
        variants = (("xla", dict(use_pallas=False)),
                    ("pallas", dict(use_pallas=True)))
    elif args.mode == "ctcss":
        variants = (
            ("lp-plane",
             dict(use_pallas=True, input_format="cf32w",
                  fuse_ctcss=False)),
            ("dft-fused",
             dict(use_pallas=True, input_format="cf32w")),
        )
    elif args.mode == "group":
        variants = (
            ("row-band",
             dict(use_pallas=True, input_format="cf32w",
                  fuse_group=False)),
            ("group-band",
             dict(use_pallas=True, input_format="cf32w")),
        )
    elif args.mode == "band":
        variants = (
            ("trio",
             dict(use_pallas=True, input_format="cf32w")),
            ("duo",
             dict(use_pallas=True, input_format="cf32w",
                  fuse_band=True)),
        )
    elif args.mode == "precision":
        variants = (
            ("mxu-f32",
             dict(use_pallas=True, input_format="cf32w")),
            ("mxu-bf16",
             dict(use_pallas=True, input_format="cf32w",
                  _fast_mxu=True)),
        )
    else:
        variants = (
            ("unfused",
             dict(use_pallas=True, input_format="cf32w",
                  fuse_lp_dc=False, fuse_rssi=False)),
            ("fused",
             dict(use_pallas=True, input_format="cf32w")),
        )

    def pstep(i):
        return params._replace(squelch_level=jnp.float32(
            C.SDR_DEFAULT_SQUELCH_LEVEL + 1e-5 * i))

    def stage(sig, chain):
        if chain.input_format == "cf32w":
            import numpy as np
            w = np.empty(2 * len(sig), np.float32)
            w[0::2] = sig.real
            w[1::2] = sig.imag
            return jnp.asarray(w.reshape(chain.step_arg_shape))
        return jnp.asarray(sig, jnp.complex64)

    sigs = [synth.make_scanner_iq(n, channel=5, ctcss_code=12, seed=s)
            for s in range(args.rot)]
    chains = {}
    names = [name for name, _ in variants]
    for name, kw in variants:
        kw = dict(kw)
        # precision is a TRACE-time knob: toggle it around construction +
        # the compiling first step (kernels/precision.py)
        fast_mxu = kw.pop("_fast_mxu", False)
        from sdr_pmr446_tpu.kernels import precision as _prec
        _prec.set_fast(fast_mxu)
        try:
            chain = ScannerChain(C.BlockConfig(k), **kw)
            iqs = [stage(s, chain) for s in sigs]
            st = chain.init_state()
            st, out = chain.step(st, iqs[0], pstep(0))    # compile + warm
            jax.block_until_ready(out)
        finally:
            _prec.set_fast(False)
        chains[name] = (chain, iqs, st, 1)        # (chain, inputs, state, i)

    results = {name: [] for name in names}
    for seg in range(args.segments):
        for name in names:
            chain, iqs, st, i = chains[name]
            st, out = chain.step(st, iqs[i % args.rot], pstep(i))
            i += 1
            jax.block_until_ready(out)             # re-warm after swap
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, out = chain.step(st, iqs[i % args.rot], pstep(i))
                i += 1
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            chains[name] = (chain, iqs, st, i)
            ms = n * args.iters / dt / 1e6
            results[name].append(ms)
            print(f"seg {seg} {name:7s}: {ms:9.1f} Ms/s", flush=True)

    for name, vals in results.items():
        vals = sorted(vals)
        med = vals[len(vals) // 2]
        print(f"{name:7s} median {med:9.1f} Ms/s  "
              f"(min {vals[0]:.1f} max {vals[-1]:.1f})", flush=True)


if __name__ == "__main__":
    main()
