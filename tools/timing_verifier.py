"""Readback-free execution proof: verify the on-device chain via a
timing channel.

tools/verified_bench.py proves every step executed by fetching an output
checksum — but this tunnel class PERMANENTLY breaks device->host fetches
once any nontrivial program has run (CLAUDE.md), so that instrument cannot
complete here.  This tool closes the loop WITHOUT any readback: the
checksum comparison itself runs on the device, and its one-bit verdict is
exfiltrated through the only channel the tunnel cannot poison — wall-clock
time.

    verdict(c, e) = spin(SLOW iterations)   if |c - e| exceeds tolerance
                    spin(1x iterations)     otherwise

where ``spin`` is a dependency-chained f32 matmul loop (the workload class
that demonstrably runs at real wall-clock speed on this tunnel — the
~150 TFLOP/s fetch-verified probe in RESULTS.md) with a TRACED trip count,
so the device itself decides how long to run based on the comparison.
The host then reads the verdict off a stopwatch:

  t_match   ~= t_cal(1)      -> every step's compute influenced c: PROOF
  t_mismatch~= t_cal(SLOW)   -> checksum off: elision/corruption FLAGGED

Phases (one process):
  A. calibrate spin(1) and spin(SLOW) with CONSTANT factors, before any
     chain program (clean runtime); self-check that the ratio is visible —
     if the tunnel faked even this, the tool reports itself unsound.
  B. run S scanner steps on the TPU with per-step-unique inputs,
     accumulating a step-weighted checksum c of the STABLE outputs
     (audio, RSSI sums, active-channel sums — noise-channel filter
     histories are excluded: they are chaotic under 1-ulp cross-backend
     differences and carry no decision information).
  C. replay the identical step sequence on the host CPU backend (local
     fetches — unaffected by the tunnel) -> expected e + tolerances.
  D. run the comparator spin on the TPU with (c, e) and time it.

The integer-derived checksum component (sum of active channels) is immune
to f32 cross-backend rounding: one elided/corrupted step shifts it by
O(K), far above the 0.5 flag threshold.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import json
import sys
import time

SLOW = 8                    # mismatch spin multiplier


def _spin_fn(dim):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # orthogonal-ish fixed matrix (NumPy closure constant: device-array
    # constants break tracing on this tunnel, CLAUDE.md); tanh keeps the
    # iterate bounded so the loop cannot overflow into Infs that might
    # enable short-circuit folding
    w = (rng.standard_normal((dim, dim)) / np.sqrt(dim)).astype(np.float32)

    def spin(n_iters, x):
        def body(i, a):
            return jnp.tanh(a @ w)

        return jax.lax.fori_loop(0, n_iters, body, x)

    return jax.jit(spin)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=10,
                   help="sub-chunks per step (CPU replay cost scales with "
                        "k*steps)")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--spin-iters", type=int, default=12000,
                   help="base spin trip count (1024x1024 matmuls)")
    p.add_argument("--spin-dim", type=int, default=1024)
    p.add_argument("--inject-error", action="store_true",
                   help="self-test: corrupt the device checksum and check "
                        "the verifier FLAGS it")
    args = p.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    out = {"backend": jax.default_backend(), "k": args.k,
           "steps": args.steps, "slow_factor": SLOW}

    # ---- phase A: calibrate the spin with constant trip counts ---------
    spin = _spin_fn(args.spin_dim)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (args.spin_dim, args.spin_dim)).astype(np.float32))

    def _time_spin(n):
        r = spin(n, x0)
        jax.block_until_ready(r)          # compile outside the clock
        t0 = time.perf_counter()
        jax.block_until_ready(spin(n, x0))
        return time.perf_counter() - t0

    t1 = min(_time_spin(args.spin_iters) for _ in range(2))
    tS = min(_time_spin(SLOW * args.spin_iters) for _ in range(2))
    out["t_spin_1x_s"] = round(t1, 3)
    out["t_spin_slow_s"] = round(tS, 3)
    # FLOP sanity: each iteration is 2*dim^3 FLOPs; a faked clock would
    # report a rate beyond any real part
    tflops = 2 * args.spin_dim ** 3 * args.spin_iters / max(t1, 1e-9) / 1e12
    out["spin_tflops"] = round(tflops, 1)
    if tS < 3.0 * t1 or tflops > 2000.0:
        out["verdict"] = "INSTRUMENT-UNSOUND"
        out["why"] = ("spin timing does not scale with trip count on this "
                      "runtime; the timing channel is unavailable")
        print(json.dumps(out))
        return 1

    # ---- phase B/C: chain on TPU, replay on host CPU -------------------
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.scanner.chain import (ScannerChain,
                                              make_runtime_params)

    iqs_np = [synth.make_scanner_iq(C.BlockConfig(args.k).input_len,
                                    channel=5, ctcss_code=12, seed=s)
              for s in range(args.steps)]

    def run(device):
        with jax.default_device(device):
            chain = ScannerChain(
                C.BlockConfig(args.k),
                use_pallas=args.pallas and device.platform == "tpu")
            params0 = make_runtime_params(C.ScannerArgs())

            def step(carry, iq, params):
                state, csum = carry
                state, o = chain._step_impl(state, iq, params)
                upd = jnp.stack([
                    jnp.sum(o.audio),
                    jnp.sum(o.rssi_db) * 1e-3,
                    jnp.sum(o.rel_rssi) * 1e-2,
                    jnp.sum(o.active_chan.astype(jnp.float32)),
                ])
                # step-weighted fold: reordering two steps also shifts c
                w = 1.0 + 0.25 * csum[4]
                return (state, jnp.concatenate(
                    [csum[:4] + w * upd, csum[4:] + 1.0])), None

            jstep = jax.jit(step, donate_argnums=(0,))
            carry = (chain.init_state(), jnp.zeros((5,), jnp.float32))
            for i in range(args.steps):
                params = params0._replace(squelch_level=jnp.float32(
                    C.SDR_DEFAULT_SQUELCH_LEVEL + 1e-5 * i))
                carry, _ = jstep(carry, jnp.asarray(iqs_np[i],
                                                    jnp.complex64), params)
            return carry[1]

    t0 = time.perf_counter()
    c_dev = run(jax.devices()[0])                      # TPU (no fetch!)
    # the checksum is data-dependent on every step; its buffer existing
    # does not prove execution — that is the comparator spin's job
    out["t_chain_dispatch_s"] = round(time.perf_counter() - t0, 3)

    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    e_host = np.asarray(run(cpu), np.float64)          # local fetch: safe
    out["t_cpu_replay_s"] = round(time.perf_counter() - t0, 3)
    out["expected_csum"] = [float(v) for v in e_host]

    # tolerances: component 3 (active-channel sum) is integer-derived ->
    # 0.5 absolute; float components get 1e-3 relative to the per-step
    # contribution (cross-backend f32 rounding is orders below that)
    per_step = np.maximum(np.abs(e_host[:4]) / args.steps, 1e-3)
    tol = np.asarray([per_step[0] * 0.5, per_step[1] * 0.5,
                      per_step[2] * 0.5, 0.5], np.float32)

    # ---- phase D: on-device comparator -> traced spin trip count -------
    e_dev = jnp.asarray(e_host[:4], jnp.float32)       # host->device: fine
    tol_dev = jnp.asarray(tol)

    def verdict_spin(c, e, t, x):
        bad = jnp.any(jnp.abs(c[:4] - e) > t)
        if args.inject_error:
            bad = jnp.logical_or(bad, c[4] > -1.0)     # force mismatch path
        n = args.spin_iters * jnp.where(bad, SLOW, 1).astype(jnp.int32)
        return spin(n, x)

    vspin = jax.jit(verdict_spin)
    jax.block_until_ready(vspin(c_dev, e_dev, tol_dev, x0))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(vspin(c_dev, e_dev, tol_dev, x0))
    t_v = time.perf_counter() - t0
    out["t_verdict_s"] = round(t_v, 3)

    # decide by log-midpoint between the calibrated levels
    mid = (t1 * tS) ** 0.5
    matched = t_v < mid
    out["verdict"] = ("VERIFIED" if matched and not args.inject_error else
                      "FLAGGED" if not matched else
                      "SELF-TEST-FAILED")
    if args.inject_error:
        out["verdict"] = "SELF-TEST-OK" if not matched else \
            "SELF-TEST-FAILED"
    print(json.dumps(out))
    return 0 if out["verdict"] in ("VERIFIED", "SELF-TEST-OK") else 1


if __name__ == "__main__":
    sys.exit(main())
