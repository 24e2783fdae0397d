"""Benchmark: IQ Msamples/s/chip through the full 16-channel scanner chain.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}

vs_baseline is the real-time multiple over the reference's sustained input
rate (1.024 Msps, the implicit baseline of BASELINE.md — the C app is a live
receiver, so 1x real time is what it provably achieves).  The north-star
target is >=1000x per chip (BASELINE.json).
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--subchunks-per-step", type=int, default=40)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--secs", type=float, default=20.0,
                   help="max wall time for the measured loop")
    args = p.parse_args()

    import jax
    # persistent compile cache: the TPU toolchain here compiles remotely and
    # slowly; caching makes repeat bench runs start in seconds
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params
    from sdr_pmr446_tpu.io import synth

    chain = ScannerChain(C.BlockConfig(args.subchunks_per_step))
    params = make_runtime_params(C.ScannerArgs())
    state = chain.init_state()
    n = chain.block.input_len
    iq = jnp.asarray(synth.make_scanner_iq(n, channel=5, ctcss_code=12),
                     jnp.complex64)

    # compile + warmup
    for _ in range(args.warmup):
        state, out = chain.step(state, iq, params)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    iters = 0
    while iters < args.iters and time.perf_counter() - t0 < args.secs:
        state, out = chain.step(state, iq, params)
        iters += 1
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    msps = n * iters / dt / 1e6
    result = {
        "metric": "16ch PMR446 scanner chain input throughput per chip",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / (C.SDR_SAMPLERATE / 1e6), 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
