"""ms-per-block latency of the scanner chain at small K (VERDICT r4 #5).

The reference is a real-time app: one 97.66 ms chunk (100352 samples,
src/sdr_pmr446.c:30) per loop iteration.  bench.py's story is pure
throughput at K=40; this tool records the LATENCY operating point —
milliseconds per dispatched block at K=1/4/8 — and the real-time margin
(block duration / latency).

Honesty on this tunnel (RESULTS.md methodology): ready signals are not
completion, so each K runs in a FRESH subprocess that measures two ways:
  - wall: N dependency-chained steps (unique inputs, rotated) ended by a
    probe-class drain reduce — a LOWER bound on per-block latency (the
    dispatch pipeline's number when the tunnel elides);
  - fetch: the same region ended by a runtime/transfer.fetch of a small
    f32 output leaf — a fetch cannot return before the value exists, so
    when it survives (the chain's complex64 ops can poison the transfer
    path, CLAUDE.md) this is an HONEST upper-bound-free measurement.
The recorded number is the fetch-anchored one when available, else the
wall bound, labeled accordingly.

    python tools/latency_bench.py [--ks 1,4,8] [--steps 40] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

#: reference real-time block cadence: 100352 samples at 1.024 Msps
BLOCK_MS = 100352 / 1.024e6 * 1e3                    # 98.0 ms per K=1


def _one_main(k: int, steps: int, fetch_timeout: int = 90) -> int:
    """Subprocess body: measure one K, print one JSON line."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.scanner.chain import (ScannerChain,
                                              make_runtime_params)

    chain = None
    for use_pallas in (True, False):
        try:
            chain = ScannerChain(C.BlockConfig(k), use_pallas=use_pallas,
                                 input_format="cu8" if use_pallas
                                 else "cf32")
            state = chain.init_state()
            break
        except Exception as e:
            print(f"latency: K={k} pallas={use_pallas} failed: {e}",
                  file=sys.stderr)
            chain = None
    if chain is None:
        print(json.dumps({"k": k, "error": "no engine"}))
        return 1
    params = make_runtime_params(C.ScannerArgs())
    n = chain.block.input_len

    def stage(seed):
        sig = synth.make_scanner_iq(n, channel=5, ctcss_code=12, seed=seed)
        if chain.input_format == "cf32":
            return jnp.asarray(sig, jnp.complex64)
        from sdr_pmr446_tpu.ops import decode
        w = decode.pack_iq(sig, chain.input_format)
        return jnp.asarray(w.reshape(chain.step_arg_shape))

    n_rot = min(steps, 8)
    iqs = [stage(s) for s in range(n_rot)]
    variants = [
        (iqs[i % n_rot],
         params._replace(squelch_level=jnp.float32(
             C.SDR_DEFAULT_SQUELCH_LEVEL + 1e-5 * i)))
        for i in range(4 + 2 * steps)]

    state, out = chain.step(state, *variants[0])     # compile
    jax.block_until_ready(out)
    for v in range(1, 4):                            # warmup
        state, out = chain.step(state, *variants[v])
    jax.block_until_ready(out)

    # ---- wall (drain-bounded lower bound)
    rng = np.random.default_rng(1)
    x_big = jnp.asarray(rng.standard_normal(16 << 20).astype(np.float32))

    def _dep(tree):
        tot = jnp.float32(0.0)
        for leaf in jax.tree.leaves(tree):
            tot = tot + jnp.sum(jnp.real(leaf).astype(jnp.float32))
        return tot

    drain = jax.jit(lambda st, o, x: jnp.sum(x) * (1.0 + 1e-20
                                                   * _dep((st, o))))
    jax.block_until_ready(drain(state, out, x_big))
    t0 = time.perf_counter()
    for i in range(steps):
        state, out = chain.step(state, *variants[4 + i])
    jax.block_until_ready(drain(state, out, x_big))
    wall_ms = (time.perf_counter() - t0) / steps * 1e3

    # ---- fetch-anchored (honest when the transfer path survives)
    fetch_ms = None
    try:
        from sdr_pmr446_tpu.runtime.transfer import fetch

        def _alarm(signum, frame):
            raise TimeoutError("fetch hang")
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(fetch_timeout)
        t0 = time.perf_counter()
        for i in range(steps):
            state, out = chain.step(state, *variants[4 + steps + i])
        got = fetch([out.rel_rssi])[0]               # small f32 leaf
        dt = time.perf_counter() - t0
        signal.alarm(0)
        if np.all(np.isfinite(got)):
            fetch_ms = dt / steps * 1e3
    except Exception as e:
        signal.alarm(0)
        print(f"latency: K={k} fetch-anchor unavailable: {e}",
              file=sys.stderr)

    print(json.dumps({
        "k": k, "engine": "pallas" if chain.use_pallas else "xla",
        "input_format": chain.input_format,
        "wall_ms_per_block": round(wall_ms, 3),
        "fetch_ms_per_block": (round(fetch_ms, 3)
                               if fetch_ms is not None else None),
        "block_ms": round(k * BLOCK_MS, 2),
    }))
    return 0


def _decompose_main(steps: int) -> int:
    """Where does the K=1 block latency go?  Interleaved in ONE process
    (tunnel drift hits all three equally): (a) a trivial one-op dispatch,
    (b) the FSM phases alone (fsm_phase_a + fsm_phase_c — the 'many tiny
    sequential HLOs' NEXT r2 #4 flagged), (c) the full chain step.  If
    (b) ~= (a), the floor is DISPATCH-bound and an FSM op-count trim
    cannot move it; prints the three medians and the implied FSM share.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.scanner.chain import (ScannerChain,
                                              make_runtime_params)
    from sdr_pmr446_tpu.scanner.fsm import (FsmCarry, fsm_phase_a,
                                            fsm_tone_sums, fsm_phase_c)

    k = 1
    ns = C.SUBCHUNK_AUDIO
    chain = ScannerChain(C.BlockConfig(k), use_pallas=True,
                         input_format="cu8")
    params = make_runtime_params(C.ScannerArgs())
    n = chain.block.input_len

    @jax.jit
    def triv(x, eps):
        return jnp.sum(x) * (1.0 + eps)

    def fsm_only(carry, rssi_db, lp_cm, mask, sq, lockm):
        sched = fsm_phase_a(carry, rssi_db, mask, sq, lockm, ns)
        s_pre, s_mem = fsm_tone_sums(sched, None, lp_cm, ns)
        return fsm_phase_c(carry, sched, s_pre, s_mem)
    fsm_j = jax.jit(fsm_only)

    st = chain.init_state()
    carry = FsmCarry(st.fsm_state, st.active_chan, st.rssi, st.ct_count,
                     st.ct_carry, st.ct_detected, st.ct_max_idx,
                     st.ct_freq)
    rng = np.random.default_rng(3)
    rssis = [jnp.asarray(rng.standard_normal((k, 16)), jnp.float32)
             for _ in range(8)]
    lps = [jnp.asarray(rng.standard_normal((16, k, ns)), jnp.float32)
           for _ in range(8)]
    from sdr_pmr446_tpu.ops import decode
    iqs = []
    for s in range(8):
        sig = synth.make_scanner_iq(n, channel=5, ctcss_code=12, seed=s)
        iqs.append(jnp.asarray(decode.pack_iq(sig, "cu8").reshape(
            chain.step_arg_shape)))
    x_triv = jnp.asarray(rng.standard_normal(1024).astype(np.float32))

    state = chain.init_state()
    state, out = chain.step(state, iqs[0], params)
    jax.block_until_ready(out)
    jax.block_until_ready(fsm_j(carry, rssis[0], lps[0],
                                params.channel_mask, params.squelch_level,
                                params.lock_max))
    jax.block_until_ready(triv(x_triv, jnp.float32(0.0)))

    meds = {}
    for name in ("trivial", "fsm_only", "chain"):
        times = []
        for seg in range(5):
            t0 = time.perf_counter()
            for i in range(steps):
                j = (seg * steps + i) % 8
                if name == "trivial":
                    r = triv(x_triv, jnp.float32(1e-6 * (seg * steps + i)))
                elif name == "fsm_only":
                    c2, _ = fsm_j(carry, rssis[j], lps[j],
                                  params.channel_mask,
                                  params.squelch_level + 1e-5 * i,
                                  params.lock_max)
                    r = c2
                else:
                    state, r = chain.step(
                        state, iqs[j],
                        params._replace(squelch_level=jnp.float32(
                            18.0 + 1e-5 * (seg * steps + i))))
            jax.block_until_ready(r)
            times.append((time.perf_counter() - t0) / steps * 1e3)
        meds[name] = sorted(times)[len(times) // 2]
        print(f"latency-decompose: {name:>9}: segments "
              f"{[round(t, 3) for t in times]} ms -> median "
              f"{meds[name]:.3f}", file=sys.stderr)
    print(json.dumps({
        "k": 1,
        "trivial_ms": round(meds["trivial"], 3),
        "fsm_only_ms": round(meds["fsm_only"], 3),
        "chain_ms": round(meds["chain"], 3),
        "fsm_over_dispatch_ms": round(meds["fsm_only"]
                                      - meds["trivial"], 3),
    }))
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ks", default="1,4,8")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--decompose", action="store_true",
                   help="K=1 floor decomposition: trivial dispatch vs "
                        "FSM-only vs full chain, interleaved")
    p.add_argument("--one", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--json", action="store_true",
                   help="print one JSON line with all rows")
    args = p.parse_args()
    if args.decompose:
        return _decompose_main(args.steps)
    if args.one:
        return _one_main(args.one, args.steps)

    rows = []
    for k in (int(v) for v in args.ks.split(",")):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--one", str(k), "--steps", str(args.steps)],
            capture_output=True, text=True, timeout=1800)
        sys.stderr.write(r.stderr)
        try:
            rows.append(json.loads(r.stdout.strip().splitlines()[-1]))
        except Exception:
            rows.append({"k": k, "error": f"rc={r.returncode}"})
    if args.json:
        print(json.dumps(rows))
        return 0
    print(f"{'K':>3} {'engine':>7} {'fmt':>6} {'block ms':>9} "
          f"{'wall ms/blk':>12} {'fetch ms/blk':>13} {'margin':>8}")
    for r in rows:
        if "error" in r:
            print(f"{r['k']:>3} ERROR {r['error']}")
            continue
        lat = r["fetch_ms_per_block"] or r["wall_ms_per_block"]
        tag = "" if r["fetch_ms_per_block"] else " (wall bound)"
        print(f"{r['k']:>3} {r['engine']:>7} {r['input_format']:>6} "
              f"{r['block_ms']:>9.1f} {r['wall_ms_per_block']:>12.3f} "
              f"{str(r['fetch_ms_per_block']):>13} "
              f"{r['block_ms'] / lat:>7.0f}x{tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
