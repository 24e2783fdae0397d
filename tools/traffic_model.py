"""CLI wrapper for the analytic HBM traffic model.

The model itself lives in sdr_pmr446_tpu/utils/traffic.py (single source
of truth shared with bench.py's per-engine envelope cap); this tool
prints the per-boundary breakdown for the common engine configurations
and, given a measured bandwidth (tools/bw_check.py), the implied
speed-of-light input throughput of each.
"""

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from sdr_pmr446_tpu.utils.traffic import chain_traffic  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--gbps", type=float, default=None,
                   help="measured HBM GB/s (bw_check.py); prints the "
                        "implied SOL input throughput")
    p.add_argument("--fuse-lp-dc", action="store_true",
                   help="model the audio-DC-fused audio bank")
    p.add_argument("--fuse-rssi", action="store_true",
                   help="model the RSSI-fused PFB kernel")
    p.add_argument("--fuse-ctcss", action="store_true",
                   help="model the in-kernel CTCSS DFT (lp plane never "
                        "in HBM)")
    p.add_argument("--fuse-band", action="store_true",
                   help="model the DUO engine (front+PFB one kernel — "
                        "the band never in HBM; kernels/duo.py)")
    p.add_argument("--physical", action="store_true",
                   help="count TILE-PADDED bytes for the audited planes "
                        "(what the DMA actually moves; bench.py's cap "
                        "uses this mode — VERDICT r4 #1)")
    a = p.parse_args()
    fused = dict(fuse_lp_dc=a.fuse_lp_dc, fuse_rssi=a.fuse_rssi,
                 fuse_ctcss=a.fuse_ctcss, fuse_band=a.fuse_band,
                 physical=a.physical)
    configs = {
        "xla_cf32": dict(input_format="cf32", use_pallas=False),
        "pallas_cf32w": dict(input_format="cf32w", **fused),
        "pallas_cs16": dict(input_format="cs16", **fused),
        "pallas_cu8": dict(input_format="cu8", **fused),
    }
    out = {name: chain_traffic(**kw) for name, kw in configs.items()}
    result = {"bytes_per_input_sample": out, "input_read_only_B": 8}
    if a.gbps:
        result["sol_Msps"] = {
            name: round(a.gbps * 1e3 / t["total"], 1)
            for name, t in out.items()}
        result["sol_input_read_only_Msps"] = round(a.gbps * 1e3 / 8, 1)
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
