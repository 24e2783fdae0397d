"""Analytic HBM traffic model of the scanner chain, per engine + format.

Every intermediate between pallas_call/XLA-op boundaries is an HBM round
trip (VMEM only lives within one kernel), so the chain's minimum HBM
traffic per INPUT sample is a sum of rate-weighted reads+writes.  Dividing
the chip's measured HBM bandwidth (tools/bw_check.py) by this gives the
speed-of-light input throughput — the ceiling against which bench.py
numbers are capped (RESULTS.md methodology: a reported loop rate above
what the chain's own traffic admits is the dispatch pipeline, not
compute, and must not be recorded).

Single source of truth for both tools/traffic_model.py (the CLI) and
bench.py's per-run cap, keyed on the engine actually benchmarked
(ADVICE r2: a cap keyed on input format alone is ~30% looser than the
unfused engine's real minimum).

Rates relative to the 1.024 MHz input:
  band     = 25/128          (200 kHz resampler output)
  channels = 25/128          (16 channels x 12.5 kHz = 200 k samples/s)
  audio    = 25/128/16       (one active channel)
"""

from __future__ import annotations

BAND = 25.0 / 128.0
CH = BAND                    # aggregate over 16 channels
AUDIO = BAND / 16.0

#: wire bytes per complex input sample by format (ops/decode.py)
WIRE_BYTES = {"cf32": 8.0, "cf32w": 8.0, "cs16": 4.0,
              "cu8": 2.0, "cs8": 2.0}

# --- physical (tile-padded) byte factors, VERDICT r4 #1 -------------------
# TPU HBM buffers are stored in (8, 128) f32 tiles: the minor dim pads to a
# multiple of 128 lanes, the second-minor to 8 sublanes, and the DMA moves
# the padding.  A cap keyed on LOGICAL bytes therefore understates the
# engine's real minimum traffic and overstates the rate bound.  The factors
# below are read off the optimized-HLO layouts of the compiled flagship
# step (tools/hlo_audit.py --physical; layouts are geometry-stable):
#   demod plane   f32[16, F/25*K, 25]{2,1,0:T(8,128)}  -> minor 25 -> 128
#   audio rows    f32[.., 80, 128] per subchunk (1225 -> 1280 lanes)
#   RSSI selector f32[49K, 2, 16]{2,1,0:T(2,128)}      -> minor 16 -> 128
DEMOD_PAD = 128.0 / 25.0       # 5.12x, the dominant padded plane
AUDIO_PAD = 1280.0 / 1225.0    # 1.0449x
SEL_PAD = 128.0 / 16.0         # 8x (tiny logical term)


def chain_traffic(input_format: str = "cf32w",
                  use_pallas: bool = True,
                  fuse_dc: bool = True,
                  fuse_lp_dc: bool = False,
                  fuse_rssi: bool = False,
                  fuse_ctcss: bool = False,
                  waterfall: bool = False,
                  fuse_band: bool = False,
                  physical: bool = False) -> dict:
    """Bytes of HBM traffic per input sample, per stage boundary.

    The returned ``total`` is a LOWER bound on what the configured engine
    demonstrably moves (boundary traffic only; intra-op passes ignored),
    so envelope/total is an upper bound on its achievable input rate.

    physical=True counts TILE-PADDED bytes for the planes whose compiled
    layouts are known from the optimized-HLO audit (DEMOD_PAD/AUDIO_PAD/
    SEL_PAD above) — the bytes the DMA engines actually move.  Terms
    whose layouts have not been audited stay logical, keeping the total
    a defensible lower bound in both modes.

    use_pallas=False: the XLA op chain (scanner/chain.py else-branch) —
    fuse flags are ignored; its front end always splits planes and
    round-trips the DC blocker.

    fuse_dc: kernels/front_end.py consumes the WIRE bytes in place — the
    split and DC-blocker round trips vanish and the front end is the
    input read + band write alone (cf32 still pays one XLA interleave
    pass, apply_iq; cf32w/cs16/cu8/cs8 are consumed/decoded in-kernel).

    fuse_lp_dc: the audio-branch DC blocker runs as the audio-bank
    kernel's epilogue (kernels/audio_bank.py) — the lp round trip
    vanishes.

    fuse_rssi: the per-sub-chunk |y| sums come out of the PFB kernel as
    tiny per-tile partials (kernels/pfb_demod.py) — the [16, F]
    magnitude write + read-back vanishes (a ~f_pad*8-byte selector read
    remains, counted below).

    fuse_ctcss: the CTCSS windowed DFT runs as the audio-bank kernel's
    epilogue on the in-VMEM DC-blocked lp rows, driven by the RSSI-only
    FSM schedule (audio_bank.apply_dc_ctcss + fsm_phase_a) — the lp
    plane is never written to HBM at all and the FSM consumes [K, 38]
    tone sums (negligible).  Implies fuse_lp_dc.
    """
    wire = WIRE_BYTES[input_format]
    if not use_pallas:
        fuse_dc = fuse_lp_dc = fuse_rssi = fuse_ctcss = fuse_band = False
    if fuse_ctcss:
        fuse_lp_dc = True
    if fuse_band and not fuse_dc:
        fuse_band = False
    # tile-padding multipliers (1.0 in logical mode)
    dp = DEMOD_PAD if physical else 1.0
    ap = AUDIO_PAD if physical else 1.0
    sp = SEL_PAD if physical else 1.0
    t: dict[str, float] = {}
    if fuse_band:
        # DUO kernel (kernels/duo.py): front end + PFB in one launch —
        # the band never reaches HBM; at the bench waterfall width the
        # hop-PSD epilogue runs IN KERNEL too (only [K, w] sums leave:
        # crumbs), so the waterfall adds no modeled traffic here.  (The
        # band_out + XLA-tap fallback for unsupported widths would add
        # the band write + spgram terms — not the bench configuration.)
        pre = 16.0 if input_format == "cf32" else 0.0
        t["duo"] = pre + wire + 4 * CH * dp
    elif fuse_dc:
        # cf32 complex64 input pays one XLA interleave pass (read 8 +
        # write 8) before the kernel's 8 B wire read (apply_iq)
        pre = 16.0 if input_format == "cf32" else 0.0
        t["front_end"] = pre + wire + 2 * 4 * BAND
    else:
        t["input_decode"] = (
            # cf32: iq complex64 read + two f32 planes written (split);
            # packed: wire read + two f32 planes written (decode_planes)
            wire + 8
        )
        # dc blocker: planes read + written (exact two-level scan: ~2
        # passes over the data internally; count the external boundary
        # only = lower bound)
        t["dc_blocker"] = 8 + 8
        # resampler kernel: planes in, band planes out
        t["resampler"] = 8 + 2 * 4 * BAND
    if not fuse_band:
        # pfb+demod kernel: band planes in; demod out (f32)
        t["pfb_demod"] = 2 * 4 * BAND + 4 * CH * dp
    if fuse_rssi:
        # per-tile segment-sum outputs are negligible; the per-frame
        # [*, 2] f32 boundary-selector input is not: 8 B per PFB frame
        # (physically f32[49K, 2, 16]{T(2,128)} -> 16 lanes pad to 128)
        t["rssi"] = 8.0 * CH / 16.0 * sp
    else:
        # |y| written by the kernel, read back by the XLA reduction
        t["pfb_mag"] = 4 * CH
        t["rssi"] = 4 * CH
    # audio bank kernel: demod in (padded plane), audio out (+ the lp
    # branch plane unless the CTCSS DFT consumed it in VMEM)
    t["audio_bank"] = 4 * CH * dp + (4 * CH * ap if fuse_ctcss
                                     else 2 * 4 * CH * ap)
    if not fuse_lp_dc:
        # audio-branch dc blocker: lp in/out (XLA scan between kernels)
        t["lp_dc"] = 4 * CH * ap + 4 * CH * ap
    if not fuse_ctcss:
        # ctcss windowed dft: the FSM's phase B gathers the ACTIVE
        # channel's lp_dcb rows channel-major (scanner/chain.py step 7)
        # — it reads the selected 1/16th only, in contiguous 4.9 KB spans
        t["ctcss"] = 4 * AUDIO
    # active-channel select: same row gather on audio_all + the selected
    # [K, ns] write (no channel-minor copy is materialized)
    t["select"] = 4 * AUDIO + 4 * AUDIO * ap
    if waterfall and not fuse_band:
        # spgram tap (round-4 plane pipeline, ops/spectrogram.py): band
        # planes re-read + the packed hop-window matrix [n, w] and packed
        # spectra [n, 2w] writes (n = band/(w/4) hops) — w=80 is the
        # bench waterfall config's width.  Lower bound: writes only.
        w = 80.0
        t["waterfall"] = 8 * BAND + BAND * w / 4.0 + BAND * w / 2.0
    t["total"] = round(sum(t.values()), 2)
    return t


def min_traffic_b_per_sample(input_format: str = "cf32w",
                             use_pallas: bool = True,
                             fuse_dc: bool = True,
                             fuse_lp_dc: bool = False,
                             fuse_rssi: bool = False,
                             fuse_ctcss: bool = False,
                             waterfall: bool = False,
                             fuse_band: bool = False,
                             physical: bool = False) -> float:
    """The bench cap denominator for the configured engine.

    bench.py passes physical=True (VERDICT r4 #1): the cap must bound the
    rate at which the hardware can move the engine's buffers, and those
    are tile-padded in HBM.
    """
    return chain_traffic(input_format, use_pallas, fuse_dc,
                         fuse_lp_dc, fuse_rssi, fuse_ctcss,
                         waterfall, fuse_band, physical)["total"]
