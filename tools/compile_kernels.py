"""Compile-only probe: do ALL Pallas kernels lower on the real TPU?

Interpret-mode tests prove math, not Mosaic lowering (CLAUDE.md) — this
compiles (never runs) every kernel entry point at a small geometry and
prints one PASS/FAIL line each.  No device->host transfers, safe on any
tunnel.  Covers: front-end variants (also probed by compile_front_end),
PFB+demod (plain and RSSI-fused), audio bank (plain and DC-fused).
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from sdr_pmr446_tpu import config as C                        # noqa: E402
from tools.compile_front_end import probe, main as fe_main    # noqa: E402


def main():
    ok = fe_main() == 0                   # the five front-end variants

    from sdr_pmr446_tpu.kernels.pfb_demod import PallasPfbDemod
    # 512: the largest row-path tile that fits VMEM with HIGHEST-precision
    # dots (kernels/precision.py); 768+ OOMs the compile (probed 2026-08-20)
    pfb = PallasPfbDemod(tile_f=512)
    t = 2 * C.SUBCHUNK_AUDIO * 16
    br = jnp.zeros((t,), jnp.float32)
    hist = jnp.zeros((400,), jnp.complex64)
    prev = jnp.zeros((16,), jnp.complex64)
    par = jnp.zeros((), jnp.int32)
    ok &= probe("pfb_demod", pfb.call_planes, (br, br, hist, par, prev))
    ok &= probe("pfb_demod_rssi", pfb.call_planes_rssi,
                (br, br, hist, par, prev))

    from sdr_pmr446_tpu.kernels.audio_bank import PallasAudioBank
    bank = PallasAudioBank(tile_r=256)
    f = 2 * C.SUBCHUNK_AUDIO
    hist_a = jnp.zeros((16, bank.hist), jnp.float32)
    demod = jnp.zeros((16, f), jnp.float32)
    dcv = jnp.zeros((16,), jnp.float32)
    g = jnp.float32(4.0)
    ok &= probe("audio_bank", bank.apply, (hist_a, demod, g))
    ok &= probe("audio_bank_dc", bank.apply_dc,
                (hist_a, dcv, dcv, demod, g))
    k_sub = 8
    f8 = k_sub * C.SUBCHUNK_AUDIO
    demod8 = jnp.zeros((16, f8), jnp.float32)
    b_arr = jnp.zeros((k_sub,), jnp.int32)
    sel = jnp.zeros((k_sub,), jnp.int32)
    ok &= probe("audio_bank_dc_ctcss",
                lambda *a: bank.apply_dc_ctcss(*a, out_len=f8),
                (hist_a, dcv, dcv, demod8, g, b_arr, sel))

    # GROUP-major band path (K % 8 == 0 geometry): front-end group
    # emitters x4 + the PFB group kernel
    from sdr_pmr446_tpu.kernels.front_end import PallasFrontEnd
    fe = PallasFrontEnd(tile_rows=448)
    dcx, dcy, fhist = fe.init_state()
    tg = 8 * C.SUBCHUNK_IN
    xr = jnp.zeros((tg,), jnp.float32)
    xw = jnp.zeros((2 * tg,), jnp.float32)
    ok &= probe("front_group_planes",
                lambda a, b, c, d, e: fe.apply_planes(a, b, c, d, e,
                                                      group_out=True),
                (dcx, dcy, fhist, xr, xr))
    ok &= probe("front_group_ilv",
                lambda a, b, c, d: fe.apply_interleaved(a, b, c, d,
                                                        group_out=True),
                (dcx, dcy, fhist, xw))
    ok &= probe("front_group_cs16",
                lambda a, b, c, d: fe.apply_packed(a, b, c, d,
                                                   group_out=True),
                (dcx, dcy, fhist, xr))
    few = PallasFrontEnd(tile_rows=448, wide=True)
    wdcx, wdcy, whist = few.init_state()
    xh = jnp.zeros((tg // 2,), jnp.float32)
    ok &= probe("front_group_cu8",
                lambda a, b, c, d: few.apply_packed2(a, b, c, d, "cu8",
                                                     group_out=True),
                (wdcx, wdcy, whist, xh))
    g_total = tg // 2048
    bw = jnp.zeros((g_total, 400), jnp.float32)
    ok &= probe("pfb_group",
                lambda *a: pfb.call_group(*a, packed=False),
                (bw, bw, hist, par, prev))
    ok &= probe("pfb_group_packed",
                lambda *a: pfb.call_group(*a, packed=True),
                (bw, bw, hist, par, prev))

    # fused dsd_in / single-channel tail (kernels/chan_tail.py)
    from sdr_pmr446_tpu.kernels.chan_tail import (PallasChanTail,
                                                  PallasMonoChain)
    for mode, kw in (("dsd", {}), ("single", dict(channel=5,
                                                  audio_gain=4.0))):
        tl = PallasChanTail(mode, **kw)
        bh, sp, dh = tl.init_state()
        args = (bh, sp, dh, bw, bw) + (
            (jnp.ones((), jnp.complex64),) if mode == "single" else ())
        ok &= probe(f"chan_tail_{mode}", tl.apply, args)

    # DUO scanner kernel: front end + packed PFB in ONE launch
    from sdr_pmr446_tpu.kernels.duo import PallasScannerDuo
    for fmt in ("cf32w", "cs16", "cu8"):
        duo = PallasScannerDuo(fmt)
        st = duo.init_state()
        rows = (8 * C.SUBCHUNK_IN // 256 if fmt in ("cu8", "cs8")
                else 8 * C.SUBCHUNK_IN // 128)
        xwidth = 256 if fmt == "cf32w" else 128
        wire = jnp.zeros((rows, xwidth), jnp.float32)
        ok &= probe(f"duo_{fmt}", duo.apply, (*st, wire))
    # wire-direct sharded pre-pass summaries (kernels/summary.py)
    from sdr_pmr446_tpu.kernels.summary import zero_summary_wire
    tsum = 8 * C.SUBCHUNK_IN
    for sfmt, swidth, spw in (("cf32w", 256, 128), ("cs16", 128, 128),
                              ("cu8", 128, 256), ("cs8", 128, 256)):
        swire = jnp.zeros((tsum // spw, swidth), jnp.float32)
        ok &= probe(f"summary_{sfmt}",
                    lambda w, _f=sfmt: zero_summary_wire(w, _f), (swire,))

    # waterfall variants: band planes as grid outputs (XLA tap) and the
    # in-kernel hop-PSD epilogue (only [K, w] sums leave VMEM)
    duo = PallasScannerDuo("cf32w")
    st = duo.init_state()
    wire = jnp.zeros((8 * C.SUBCHUNK_IN // 128, 256), jnp.float32)
    ok &= probe("duo_cf32w_band",
                lambda *a: duo.apply(*a, band_out=True), (*st, wire))
    for w in (64, 80):
        ok &= probe(f"duo_cf32w_wf{w}",
                    lambda *a, _w=w: duo.apply(*a, waterfall_w=_w),
                    (*st, wire))
    # GENERAL widths (hop not dividing the group row): phase-class
    # row-selector epilogue at phase-reset geometries (first probed
    # PASS 2026-08-20: w=120 K=24 21s, w=128 K=16 12s)
    for w, kq in ((120, 24), (128, 16)):
        wire_g = jnp.zeros((kq * C.SUBCHUNK_IN // 128, 256), jnp.float32)
        ok &= probe(f"duo_cf32w_wf{w}_general",
                    lambda *a, _w=w: duo.apply(*a, waterfall_w=_w),
                    (*st, wire_g))
    # the cu8 (wide-row) duo with the in-kernel waterfall — the bench
    # waterfall config's default wire since round 5 (first probed PASS
    # 2026-08-20: w=80 K=40 16s, w=120 K=24 11s, full chain step)
    duo8 = PallasScannerDuo("cu8")
    st8 = duo8.init_state()
    for w in (80, 120):
        kq = 24 if w == 120 else 8
        wire8k = jnp.zeros((kq * C.SUBCHUNK_IN // 256, 128), jnp.float32)
        ok &= probe(f"duo_cu8_wf{w}",
                    lambda *a, _w=w: duo8.apply(*a, waterfall_w=_w),
                    (*st8, wire8k))

    # MONO chains: front end + tail in ONE kernel (band never in HBM)
    for mode, fmt, kw in (("dsd", "cf32w", {}), ("dsd", "cs16", {}),
                          ("dsd", "cu8", {}),
                          ("single", "cf32w", dict(channel=5,
                                                   audio_gain=4.0))):
        mc = PallasMonoChain(mode, fmt, **kw)
        st = mc.init_state()
        rows = (8 * C.SUBCHUNK_IN // 256 if fmt in ("cu8", "cs8")
                else 8 * C.SUBCHUNK_IN // 128)
        xwidth = 256 if fmt == "cf32w" else 128
        wire = jnp.zeros((rows, xwidth), jnp.float32)
        args = (*st, wire) + ((jnp.ones((), jnp.complex64),)
                              if mode == "single" else ())
        ok &= probe(f"mono_{mode}_{fmt}", mc.apply, args)

    # the sharded mono single STEP ((1,1) mesh): the exact-state
    # pre-pass + mixer-table halo rebuild + unmodified kernel as one
    # compiled program (first probed PASS 2026-08-20)
    from sdr_pmr446_tpu.parallel.single_sharded import ShardedSingleChain
    from sdr_pmr446_tpu.parallel.scanner_sharded import make_mesh
    mesh = make_mesh(1, 1)
    for sfmt in ("cf32", "cf32w"):
        chs = ShardedSingleChain(mesh, channel=5, subchunks_per_step=8,
                                 use_pallas=True, input_format=sfmt)
        assert chs.mono
        sts = chs.init_state(1)
        arg = (jnp.zeros((1, chs.input_len), jnp.complex64)
               if sfmt == "cf32"
               else jnp.zeros((1, 2 * chs.input_len), jnp.float32))
        ok &= probe(f"sharded_single_mono_{sfmt}",
                    lambda s, a, _c=chs: _c._step(s, a), (sts, arg))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
