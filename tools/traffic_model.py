"""Analytic HBM traffic model of the fused-Pallas scanner chain.

Every intermediate between pallas_call/XLA-op boundaries is an HBM round
trip (VMEM only lives within one kernel), so the chain's minimum HBM
traffic per INPUT sample is a sum of rate-weighted reads+writes.  Dividing
the chip's measured HBM bandwidth (tools/bw_check.py) by this gives the
speed-of-light input throughput — the ceiling against which bench.py
numbers must be sanity-checked (NEXT.md #1: record only defensible
numbers).

Rates relative to the 1.024 MHz input:
  band     = 25/128          (200 kHz resampler output)
  channels = 25/128          (16 channels x 12.5 kHz = 200 k samples/s)
  audio    = 25/128/16       (one active channel)
"""

import argparse
import json

BAND = 25.0 / 128.0
CH = BAND                    # aggregate over 16 channels
AUDIO = BAND / 16.0


def pallas_chain_traffic(fused_front_end: bool = False,
                         input_bytes: float = 8.0) -> dict:
    """Bytes of HBM traffic per input sample, per stage boundary.

    fused_front_end: kernels/front_end.py consumes the WIRE bytes in
    place — the split and DC-blocker round trips vanish and the front end
    is the input read + band write alone.  input_bytes: 8 for cf32w, 4
    for cs16 (decoded in-kernel via apply_packed).
    """
    if fused_front_end:
        front = {"front_end": input_bytes + 2 * 4 * BAND}
    else:
        front = {
            # iq complex64 read + two f32 planes written (split)
            "split": 8 + 8,
            # dc blocker: planes read + written (exact two-level scan: ~2
            # passes over the data internally; count the external boundary
            # only = lower bound)
            "dc_blocker": 8 + 8,
            # resampler kernel: planes in, band planes out
            "resampler": 8 + 2 * 4 * BAND,
        }
    t = {
        **front,
        # pfb+demod kernel: band planes in; demod + |y| out (f32 each)
        "pfb_demod": 2 * 4 * BAND + 2 * 4 * CH,
        # rssi: |y| read (writes are K-sized, negligible)
        "rssi": 4 * CH,
        # audio bank kernel: demod in, audio + lp branch out
        "audio_bank": 4 * CH + 2 * 4 * CH,
        # audio-branch dc blocker: lp in/out
        "lp_dc": 4 * CH + 4 * CH,
        # ctcss windowed dft: lp_dcb read
        "ctcss": 4 * CH,
        # active-channel select: audio read, [K, ns] written
        "select": 4 * CH + 4 * 16 * AUDIO,
    }
    t["total"] = round(sum(t.values()), 2)
    return t


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--gbps", type=float, default=None,
                   help="measured HBM GB/s (bw_check.py); prints the "
                        "implied SOL input throughput")
    a = p.parse_args()
    t = pallas_chain_traffic()
    tf = pallas_chain_traffic(fused_front_end=True)
    tp = pallas_chain_traffic(fused_front_end=True, input_bytes=4.0)
    out = {"bytes_per_input_sample": t,
           "bytes_per_input_sample_fused_front_end": tf,
           "bytes_per_input_sample_fused_cs16": tp,
           "input_read_only_B": 8}
    if a.gbps:
        out["sol_full_chain_Msps"] = round(a.gbps * 1e3 / t["total"], 1)
        out["sol_fused_front_end_Msps"] = round(a.gbps * 1e3 / tf["total"], 1)
        out["sol_fused_cs16_Msps"] = round(a.gbps * 1e3 / tp["total"], 1)
        out["sol_input_read_only_Msps"] = round(a.gbps * 1e3 / 8, 1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
