"""Known-traffic HBM bandwidth probe — calibrates bench.py's methodology.

The chain benchmarks report Msamples/s; whether a number is *physically
defensible* depends on the chip's HBM bandwidth: the chain must at minimum
read its complex64 input (8 B/sample) from HBM every step, and the fused
Pallas chain moves ~52 B/sample total across its kernel boundaries
(tools/traffic_model.py).  This probe measures what the SAME timing loop
(donated evolving state, per-call-unique executions, pipelined and
sync-each variants — bench.py::_measure's regime) reports for workloads
whose HBM traffic is KNOWN:

  read:  s' = s + sum(X)*(1 + 1e-6*s)     traffic = N*4 B read / step
  copy:  X' = X * 1.001                   traffic = N*4 read + N*4 write

Elision detection: both recurrences shift their final value by a
measurable amount EVERY step (linear growth / 0.1%-per-step scaling), so
a stack that skips or memoizes executions produces a wrong final value,
not a flattering time.  Final values are fetched and checked against a
host replay; a probe whose value check fails prints "UNSOUND".

If the reported GB/s exceeds the chip's plausible HBM bandwidth, the
methodology (not the chain) is overstating at that scale, and chain
numbers implying more traffic than the probe sustains must not be
recorded.
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=512,
                   help="array size in MiB (f32)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from sdr_pmr446_tpu.runtime import transfer

    n = args.mb * (1 << 20) // 4
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal(n).astype(np.float32) * 0.001
    results = {}

    # ---- read probe ----------------------------------------------------
    def read_impl(s, x):
        # grows ~sum(x) per step: a skipped execution shifts the final
        # value by a full step; 1e-6*s keeps every execution value-unique
        return s + jnp.sum(x) * (1.0 + 1e-6 * s)

    read_step = jax.jit(read_impl, donate_argnums=(0,))

    sum_dev = float(np.asarray(transfer.fetch(
        [jnp.sum(jnp.asarray(x_host))])[0]))
    x = jnp.asarray(x_host)
    total_steps = 0
    for mode in ("pipelined", "sync"):
        s = jnp.float32(1.0)
        total_steps = args.warmup
        for _ in range(args.warmup):
            s = read_step(s, x)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = read_step(s, x)
            if mode == "sync":
                jax.block_until_ready(s)
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        total_steps += args.iters
        results[f"read_{mode}_GBps"] = round(
            n * 4 * args.iters / dt / 1e9, 1)
    # host replay with the device's own sum value (scalar recurrence in
    # f64; device f32 scalar noise << one step's shift)
    s_dev = float(np.asarray(transfer.fetch([s])[0]))
    s_ref = 1.0
    for _ in range(total_steps):
        s_ref = s_ref + sum_dev * (1.0 + 1e-6 * s_ref)
    step_size = abs(sum_dev) if sum_dev else 1.0
    miss_steps = abs(s_dev - s_ref) / step_size
    results["read_value_missing_steps"] = round(miss_steps, 3)
    if miss_steps > 0.5:
        results["read_verdict"] = "UNSOUND"

    # ---- copy probe: read + write the full array -----------------------
    def copy_impl(x):
        return x * jnp.float32(1.001)

    copy_step = jax.jit(copy_impl, donate_argnums=(0,))
    for mode in ("pipelined", "sync"):
        x = jnp.asarray(x_host)
        for _ in range(args.warmup):
            x = copy_step(x)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x = copy_step(x)
            if mode == "sync":
                jax.block_until_ready(x)
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        results[f"copy_{mode}_GBps"] = round(
            n * 4 * 2 * args.iters / dt / 1e9, 1)
    # per-element factor is 1.001^steps: one missing step = 0.1% shift,
    # ~1e4x above f32 rounding noise
    steps = args.warmup + args.iters
    idx = [0, n // 2, n - 1]
    got = np.asarray(transfer.fetch([jnp.take(x, jnp.asarray(idx))])[0])
    factor32 = np.float32(1.001) ** np.arange(steps + 2)
    want = x_host[idx, None] * factor32[None, :]
    # which step count best explains each element
    best = np.argmin(np.abs(got[:, None] - want), axis=1)
    results["copy_value_steps_seen"] = [int(b) for b in best]
    if not np.all(best == steps):
        results["copy_verdict"] = "UNSOUND"

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
