#!/usr/bin/env bash
# First-healthy-host checklist (RESULTS.md "measurement debts"): every
# instrument the dev tunnel could not complete, one command, results
# appended to RESULTS.md.  Run this the moment a TPU host with working
# device->host transfers and honest completion signals is available:
#
#   bash tools/healthy_host.sh [results-file]
#
# Order matters: the probes that say whether the host is sound run first
# (each in its own process — a fetch poisons later chain executes on
# unhealthy tunnels, and one bad instrument must not contaminate the
# next), then the proof instruments, then the recorded sweep.
#
# 1. timing_verifier  — are wall-clock numbers trustable at all? (1 min)
# 2. bw_check         — ready-anchored HBM read/copy envelope
# 3. bench --envelope-probe-only — fetch-anchored envelope (subprocess)
# 4. verified_bench   — CHECKSUM-PROOF of chain throughput (the one
#                       instrument that proves the rate end-to-end)
# 5. ab_bench K=160   — XLA vs Pallas engine separation geometry
# 6. tpu_smoke        — driver e2e on-device
# 7. bench_scaling    — multi-chip ICI efficiency (>=80% target; no-ops
#                       gracefully on a single-chip host)
# 8. bench sweep      — record all five configs with the live envelope cap

set -u
cd "$(dirname "$0")/.."
OUT="${1:-RESULTS.md}"
STAMP=$(date -u +"%Y-%m-%dT%H:%M:%SZ")

run() {
    local name="$1"; shift
    echo "=== $name: $*" | tee -a "$OUT.healthy.log"
    {
        echo
        echo "### $name ($STAMP)"
        echo '```'
    } >> "$OUT"
    # 35 min: remote compiles can queue for 30 (CLAUDE.md)
    timeout 2100 "$@" 2>&1 | tee -a "$OUT.healthy.log" | tail -30 >> "$OUT"
    local rc=${PIPESTATUS[0]}
    echo '```' >> "$OUT"
    if [ $rc -ne 0 ]; then
        echo "**exit $rc** — see $OUT.healthy.log" >> "$OUT"
    fi
    return 0   # keep going: one failing instrument must not stop the rest
}

{
    echo
    echo "## Healthy-host run $STAMP (tools/healthy_host.sh)"
} >> "$OUT"

run timing_verifier python tools/timing_verifier.py
run probe_precision python tools/probe_precision.py
run value_verify    python tools/value_verify_kernel.py
run bw_check        python tools/bw_check.py
run envelope_probe  python bench.py --envelope-probe-only
run verified_bench  python tools/verified_bench.py --pallas --k 40
run ab_bench_k160   python tools/ab_bench.py --subchunks-per-step 160
run ab_group_k160   python tools/ab_bench.py --mode group --subchunks-per-step 160
run ab_mxu_k160     python tools/ab_bench.py --mode precision --subchunks-per-step 160
run ab_band_k160    python tools/ab_bench.py --mode band --subchunks-per-step 160
run tpu_smoke       python tools/tpu_smoke.py
run bench_scaling   python bench_scaling.py
run bench_scanner   python bench.py --config scanner
run bench_waterfall python bench.py --config waterfall
run bench_dsd       python bench.py --config dsd
run bench_single    python bench.py --config single
run bench_batch8    python bench.py --config batch8
run latency         python tools/latency_bench.py --ks 1,4,8
run latency_decomp  python tools/latency_bench.py --decompose

echo "healthy_host: done — results appended to $OUT"
