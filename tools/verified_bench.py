"""Execution-PROOF chain timing: throughput + an output checksum.

bw_check.py showed the dev tunnel elides repeated executions; bench.py
counters that with per-step-unique inputs.  This tool goes further and
PROVES the device ran every step: the jitted step carries a running
checksum of its outputs (audio / RSSI / active-channel sums) in the
donated state, so the final checksum depends on every step's full compute
graph.  After timing, the checksum is fetched and compared against a CPU
replay of the *identical* step sequence — one step elided anywhere shifts
the checksum by a full step's contribution (~1/n_steps, orders above f32
cross-backend rounding).

Run on the TPU:      python tools/verified_bench.py --k 160 [--pallas]
CPU reference mode:  JAX_PLATFORMS=cpu python tools/verified_bench.py \
                         --k 160 --cpu-ref   (prints the checksum JSON)

The TPU run spawns the CPU reference itself (subprocess) unless
--no-ref is given.
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import argparse
import json
import os
import subprocess
import sys
import time


def run_chain(k, iters, warmup, rot, use_pallas, time_it):
    import jax
    import jax.numpy as jnp
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.scanner.chain import (ScannerChain,
                                              make_runtime_params)

    chain = ScannerChain(C.BlockConfig(k), use_pallas=use_pallas,
                         pallas_interpret=(use_pallas and
                                           jax.default_backend() != "tpu"))
    params0 = make_runtime_params(C.ScannerArgs())
    n = chain.block.input_len
    iqs = [jnp.asarray(
        synth.make_scanner_iq(n, channel=5, ctcss_code=12, seed=s),
        jnp.complex64) for s in range(rot)]

    def step(carry, iq, params):
        state, csum = carry
        state, out = chain._step_impl(state, iq, params)
        upd = jnp.stack([
            jnp.sum(out.audio),
            jnp.sum(out.rssi_db) * 1e-3,
            jnp.sum(out.rel_rssi) * 1e-2,
            jnp.sum(out.active_chan.astype(jnp.float32)),
        ])
        return (state, csum + upd), out

    step = jax.jit(step, donate_argnums=(0,))

    def pstep(i):
        return params0._replace(squelch_level=jnp.float32(
            C.SDR_DEFAULT_SQUELCH_LEVEL + 1e-5 * i))

    assert warmup >= 1
    from sdr_pmr446_tpu.runtime.transfer import fetch
    import numpy as np

    def fetch_csum(arr, tries=8):
        # tunnel transfers after chain execution are extremely flaky: a
        # SUCCESSFUL fetch has been observed to take >2 min, and failures
        # come back as UNIMPLEMENTED after ~1-3 min.  Retry with backoff —
        # the checksum is 4 floats, so the only cost is patience.
        last = None
        for t in range(tries):
            try:
                return np.asarray(fetch([arr])[0], np.float64)
            except Exception as e:          # tunnel transfers are flaky
                last = e
                time.sleep(min(2.0 ** t, 60.0))
        print(f"checksum fetch failed: {last}", file=sys.stderr)
        return np.full(4, np.nan)

    carry = (chain.init_state(), jnp.zeros((4,), jnp.float32))
    i = 0
    for _ in range(warmup):
        carry, out = step(carry, iqs[i % rot], pstep(i))
        i += 1
    jax.block_until_ready(out)
    # pre-warm the fetch path (compiles the f32 encoder — remote compiles
    # can queue for minutes and must not land inside the timed region),
    # then calibrate its round-trip on drained state
    fetch_csum(carry[1])
    t_r0 = time.perf_counter()
    fetch_csum(carry[1])
    fetch_rtt = time.perf_counter() - t_r0

    t0 = time.perf_counter()
    done = 0
    while done < iters:
        carry, out = step(carry, iqs[i % rot], pstep(i))
        i += 1
        done += 1
    jax.block_until_ready(out)
    dt_ready = time.perf_counter() - t0
    # the checksum VALUE cannot exist before every step's compute finished:
    # dt_fetched - fetch_rtt bounds true completion even if ready is
    # signaled early by the tunnel
    csum = fetch_csum(carry[1])
    dt_fetched = time.perf_counter() - t0
    out = {"csum": [float(v) for v in csum], "steps": i, "k": k,
           "backend": jax.default_backend()}
    if time_it:
        out["msps_ready"] = round(n * done / dt_ready / 1e6, 1)
        out["msps_fetched"] = round(n * done / dt_fetched / 1e6, 1)
        out["dt_ready_s"] = round(dt_ready, 4)
        out["dt_fetched_s"] = round(dt_fetched, 4)
        out["fetch_rtt_s"] = round(fetch_rtt, 4)
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=160)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--rot", type=int, default=4)
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--cpu-ref", action="store_true",
                   help="CPU reference mode: print checksum JSON and exit")
    p.add_argument("--no-ref", action="store_true")
    args = p.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if args.cpu_ref:
        jax.config.update("jax_platforms", "cpu")
        res = run_chain(args.k, args.iters, args.warmup, args.rot,
                        use_pallas=False, time_it=False)
        print(json.dumps(res))
        return 0

    res = run_chain(args.k, args.iters, args.warmup, args.rot,
                    use_pallas=args.pallas, time_it=True)
    if not args.no_ref:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        ref_out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-ref",
             "--k", str(args.k), "--iters", str(args.iters),
             "--warmup", str(args.warmup), "--rot", str(args.rot)],
            capture_output=True, text=True, env=env, check=True)
        ref = json.loads(ref_out.stdout.strip().splitlines()[-1])
        import numpy as np
        got = np.asarray(res["csum"])
        want = np.asarray(ref["csum"])
        # one elided step shifts a component by ~|csum|/steps; flag at half
        per_step = np.abs(want) / res["steps"]
        miss = np.abs(got - want) / np.maximum(per_step, 1e-9)
        res["ref_csum"] = ref["csum"]
        res["missing_steps_estimate"] = round(float(np.min(miss)), 3)
        res["worst_component_miss"] = round(float(np.max(miss)), 3)
        # the active-chan component (index 3) is integer-derived: immune to
        # f32 cross-backend rounding, one elided step shifts it by ~1
        res["verified"] = bool(miss[3] < 0.5)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
