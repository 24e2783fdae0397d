"""Scaling-efficiency benchmark for the sharded scanner.

Runs the (stream x time)-sharded chain on 1..N devices and reports
samples/s and parallel efficiency vs the 1-device run — the >=80 %
scaling-efficiency target of BASELINE.json.

On this dev environment only one real TPU chip is attached; with
--platform cpu the same measurement runs on a virtual 8-device CPU mesh
(useful for halo-overhead sanity, not absolute numbers).  On a real pod
slice, run as-is.

Prints one JSON line per device count.
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=[None, "cpu"],
                   nargs="?")
    p.add_argument("--devices", type=int, nargs="*", default=None)
    p.add_argument("--subchunks-per-step", type=int, default=0,
                   help="0 = auto: 64 for the fused engine (divisible by "
                        "8 per shard at every device count), 40 for XLA")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--engine", choices=["auto", "xla", "pallas"],
                   default="auto",
                   help="auto: the recorded fused engine on TPU (scaling "
                        "numbers should measure the engine deployments "
                        "run), XLA elsewhere")
    args = p.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.parallel.scanner_sharded import (ShardedScannerChain,
                                                         make_mesh)
    from sdr_pmr446_tpu.scanner.chain import make_runtime_params

    from sdr_pmr446_tpu.runtime.driver import resolve_engine
    engine = resolve_engine(args.engine)
    use_pallas = engine.startswith("pallas")
    n_avail = len(jax.devices())
    counts = args.devices or [d for d in (1, 2, 4, 8) if d <= n_avail]
    k = args.subchunks_per_step or (64 if use_pallas else 40)
    params = make_runtime_params(C.ScannerArgs())

    base = None
    for d in counts:
        mesh = make_mesh(1, d)
        chain = ShardedScannerChain(
            mesh, C.BlockConfig(k), use_pallas=use_pallas,
            pallas_interpret=jax.default_backend() != "tpu")
        if use_pallas and not chain.fused:
            print(f"# d={d}: K={k} not divisible by 8 per shard — "
                  f"round-1 kernel set runs instead of the fused engine",
                  file=sys.stderr)
        state = chain.init_state(1)
        n = chain.block.input_len
        iq = jnp.asarray(
            synth.make_scanner_iq(n, channel=5, ctcss_code=12)[None],
            jnp.complex64)
        state, out = chain.step(state, iq, params)   # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, out = chain.step(state, iq, params)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        msps = n * args.iters / dt / 1e6
        if base is None:
            base = msps
        eff = msps / (base * d)
        print(json.dumps({
            "devices": d,
            "Msamples_per_sec": round(msps, 1),
            "scaling_efficiency": round(eff, 3),
            "vs_realtime": round(msps / 1.024, 1),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
