"""Pallas TPU kernel: the scanner's front end + PFB/demod in ONE launch.

Round-4 follow-on to the GROUP-major band handoff: the handoff itself
(band group rows written by the front end, read back by the PFB kernel —
2 planes x f32 x 25/128 rate each way = 3.1 B/input-sample) is the
largest remaining INTER-kernel traffic of the flagship chain.  This
module composes the two kernels: the front end's DC + wire decode +
25/128 resampler emits band group rows into VMEM SCRATCH, and the packed
PFB + discriminator core (kernels/pfb_demod.py::_pfb_group_core) consumes
them in place.  Modeled chain traffic (with the audio bank unchanged):
cf32w 13.66 -> 10.5 B/sample, cs16 9.66 -> 6.5, cu8 7.66 -> 4.5.

Same proven pattern as kernels/chan_tail.py::PallasMonoChain (the dsd/
single chains' one-kernel engine): front bodies imported from
kernels/front_end.py, the consumer refactored into a VALUES-consuming
core, scratch carries across the sequential grid, carried state in/out
as tiny whole-block refs.

The waterfall tap needs the band in HBM: ``band_out=True`` turns the
band scratch into grid-block OUTPUTS (same refs, different pallas slots)
so the spgram tap reads the kernel's own emission — the waterfall config
runs the duo too, paying only the band WRITE (the trio also paid the
PFB's read-back).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.kernels import front_end as FE
from sdr_pmr446_tpu.kernels import pfb_demod as PD

NCH = C.NUM_CHANNELS
GL = 16 * C.RESAMP_L          # 400 band samples per group row
W4 = PD.NTAPS + 3 * NCH       # 464 packed-window halfwidth


def _duo_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, h_ref, prev_ref,
                    yh_r, yh_i, xwrow, ysc, bprev, prevp):
    @pl.when(s == 0)
    def _():
        yh_r[:, :] = fhr_ref[:, :]
        yh_i[:, :] = fhi_ref[:, :]
        xwrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]
        PD._pfb_packed_init(h_ref, prev_ref, bprev, prevp)


def _duo_unpack(rest, band_out: bool, wf_w: int, wf_p: int = 1):
    """Split the positional tail into (pfb consts, wf consts, outputs
    incl. the optional band planes / waterfall segments, scratches):
    with ``band_out`` the band planes are grid-block OUTPUTS (the XLA
    waterfall tap reads them); with ``wf_w`` the hop-PSD epilogue runs
    IN KERNEL instead (extra consts kwf/wffold — plus the phase-class
    row selectors selc/selp/scat when the hop phase drifts across group
    rows, ``wf_p > 1`` — a wf segment output and a window scratch) and
    no band ever leaves."""
    consts = rest[:18]
    rest = rest[18:]
    selc_ref = selp_ref = scat_ref = None
    if wf_w:
        kwf_ref, wffold_ref = rest[:2]
        rest = rest[2:]
        if wf_p > 1:
            selc_ref, selp_ref, scat_ref = rest[:3]
            rest = rest[3:]
    else:
        kwf_ref = wffold_ref = None
    (demod_out, seg_out, prev_out, obr, ohr, ohi, ocy) = rest[:7]
    rest = rest[7:]
    if wf_w:
        wfseg_out = rest[0]
        rest = rest[1:]
    else:
        wfseg_out = None
    wf_sel = (selc_ref, selp_ref, scat_ref)
    if band_out:
        bwr_sc, bwi_sc = rest[:2]
        rest = rest[2:]
        (yh_r, yh_i, xwrow, ysc, gw, win_g) = rest[:6]
        rest = rest[6:]
    else:
        (yh_r, yh_i, xwrow, ysc, gw, win_g) = rest[:6]
        bwr_sc, bwi_sc = rest[6:8]
        rest = rest[8:]
    (bprev, prevp, bext_r, bext_i, winc) = rest[:5]
    winw = rest[5] if wf_w else None
    return (consts, kwf_ref, wffold_ref, wf_sel, demod_out, seg_out,
            prev_out, obr, ohr, ohi, ocy, wfseg_out,
            yh_r, yh_i, xwrow, ysc, gw, win_g, bwr_sc, bwi_sc,
            bprev, prevp, bext_r, bext_i, winc, winw)


def _wf_epilogue(bext_r, bext_i, winw, kwf_ref, wffold_ref, wf_sel,
                 sel_ref, wfseg_out, w: int):
    """In-kernel hop-PSD waterfall: per group row 1600/w hops, each a
    [wl]-window at stride w/4 (liquid spgram semantics, same window+DFT
    matrix as ops/spectrogram._dft_win_packed); |S|^2 summed per hop via
    a fold matmul (lane-offset value slices don't relayout) and per-row
    sums segment-reduced with the PFB's own group-aligned selector.  The
    hop ending at band[400g + 16h + w/4] belongs to group row g, and 49
    rows = one sub-chunk, so the segments line up with seg_out's.

    One hop at a time through a single [gt, w] scratch window (stores at
    offset 0, dot, accumulate): batching all 1600 window lanes per row
    OOM'd scoped VMEM by 200 KiB at the bench geometry K=40 (the audit
    caught it; K=8 compiled) — the per-hop form needs w lanes only and
    serializes nothing the MXU wasn't already serializing.

    General widths (hop w/4 does not divide the 400-sample row, e.g. the
    reference-legal -w 120; VERDICT r4 #4): hop offsets repeat with
    period P = delay/gcd(400, delay) rows, so ``wf_sel`` carries one-hot
    PHASE-CLASS row selectors (Mosaic has no strided row slicing;
    row-space gathers are matmuls): selc picks every P-th current row,
    selp the corresponding previous rows (for windows crossing a row
    boundary), scat scatters each class's [gt/P, w] hop-PSD sums back to
    row positions.  Same FLOPs as the uniform path, P-way smaller
    matmul batches; engages only at phase-reset geometries
    (ops/spectrogram.kernel_wf_supported(w, k=K))."""
    import math as _math
    gt = bext_r.shape[0] - 1
    wl = w // 2
    delay = w // 4
    selc_ref, selp_ref, scat_ref = wf_sel
    if selc_ref is None:                           # uniform: w | 1600
        hops = GL // delay                         # 1600 / w
        acc = None
        for h in range(hops):
            a = h * delay - delay                  # window start lane
            if a < 0:
                winw[:, 0:-a] = bext_r[0:gt, GL + a:]
                winw[:, -a:wl] = bext_r[1:gt + 1, 0:wl + a]
                winw[:, wl:wl - a] = bext_i[0:gt, GL + a:]
                winw[:, wl - a:2 * wl] = bext_i[1:gt + 1, 0:wl + a]
            else:
                winw[:, 0:wl] = bext_r[1:gt + 1, a:a + wl]
                winw[:, wl:2 * wl] = bext_i[1:gt + 1, a:a + wl]
            sp = FE._dot(winw[:, :], kwf_ref[:])
            p = FE._dot(sp * sp, wffold_ref[:])    # [gt, w] |S|^2
            acc = p if acc is None else acc + p
        wfseg_out[:, :] = FE._dot(sel_ref[:], acc)
        return
    P = delay // _math.gcd(GL, delay)
    gtp = gt // P
    acc = None
    for c in range(P):
        sc = selc_ref[c * gtp:(c + 1) * gtp, :]
        sp_ = selp_ref[c * gtp:(c + 1) * gtp, :]
        phi = (c * GL) % delay
        e0 = (delay - phi) if phi else delay
        accc = None
        for e in range(e0, GL + 1, delay):         # hop END offsets
            a = e - wl                             # window start lane
            if a < 0:
                winw[0:gtp, 0:-a] = FE._dot(sp_, bext_r[:, GL + a:])
                winw[0:gtp, -a:wl] = FE._dot(sc, bext_r[:, 0:wl + a])
                winw[0:gtp, wl:wl - a] = FE._dot(sp_, bext_i[:, GL + a:])
                winw[0:gtp, wl - a:2 * wl] = FE._dot(sc,
                                                     bext_i[:, 0:wl + a])
            else:
                winw[0:gtp, 0:wl] = FE._dot(sc, bext_r[:, a:a + wl])
                winw[0:gtp, wl:2 * wl] = FE._dot(sc, bext_i[:, a:a + wl])
            spv = FE._dot(winw[0:gtp, :], kwf_ref[:])
            p = FE._dot(spv * spv, wffold_ref[:])  # [gt/P, w] |S|^2
            accc = p if accc is None else accc + p
        part = FE._dot(scat_ref[:, c * gtp:(c + 1) * gtp], accc)
        acc = part if acc is None else acc + part
    wfseg_out[:, :] = FE._dot(sel_ref[:], acc)


def _pfb_tail(bwr_sc, bwi_sc, pfb_refs, demod_out, seg_out, prev_out,
              obr, bprev, prevp, bext_r, bext_i, winc):
    (k4_ref, k1_ref, altc_ref, sel_ref, swap_ref, sh32_ref, sel96_ref,
     fa_ref, fb_ref, fold4_ref, sre_ref, sim_ref, ep0_ref, ep1_ref,
     ep2_ref, ep3_ref, srow_ref, ones_ref) = pfb_refs
    PD._pfb_group_core(bwr_sc[:, :], bwi_sc[:, :], k4_ref, k1_ref,
                       altc_ref, sel_ref, swap_ref, sh32_ref, sel96_ref,
                       fa_ref, fb_ref, fold4_ref, sre_ref, sim_ref,
                       ep0_ref, ep1_ref, ep2_ref, ep3_ref, srow_ref,
                       ones_ref, demod_out, seg_out, prev_out,
                       bprev, prevp, bext_r, bext_i, winc)
    obr[:, :] = bprev[:, :]


def _duo_body_ilv(xw_ref, fhr_ref, fhi_ref, cx_ref, cy_ref, h_ref,
                  prev_ref,
                  wcr_ref, wci_ref, u0_ref, pj_ref, tt_ref, pvec_ref,
                  k2_ref, el_ref, ewr_ref, ewi_ref,
                  *rest, band_out: bool, wf_w: int, wf_p: int):
    (consts, kwf_ref, wffold_ref, wf_sel, demod_out, seg_out, prev_out,
     obr, ohr, ohi, ocy, wfseg_out,
     yh_r, yh_i, xwrow, ysc, gw, win_g, bwr_sc, bwi_sc,
     bprev, prevp, bext_r, bext_i, winc, winw) = _duo_unpack(
        rest, band_out, wf_w, wf_p)
    tile = xw_ref.shape[0]
    s = pl.program_id(0)
    _duo_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, h_ref, prev_ref,
                    yh_r, yh_i, xwrow, ysc, bprev, prevp)

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xw = xw_ref[:]
    xwprev = jnp.concatenate([xwrow[0:1, :], xw[:tile - 1, :]], axis=0)
    prev_r = FE._dot(xwprev, ewr_ref[:])
    prev_i = FE._dot(xwprev, ewi_ref[:])
    yloc_r = FE._dot(xw, wcr_ref[:]) - FE._dot(prev_r, u0_ref[:])
    yloc_i = FE._dot(xw, wci_ref[:]) - FE._dot(prev_i, u0_ref[:])
    y_r, yl_r = FE._plane_dc(yloc_r, ysc[0:1, 0:1], tt, pvec, pj_ref,
                             e_last, FE._PJ_LAST)
    y_i, yl_i = FE._plane_dc(yloc_i, ysc[1:2, 0:1], tt, pvec, pj_ref,
                             e_last, FE._PJ_LAST)
    FE._emit_group(y_r, yh_r, k2_ref, gw, win_g, bwr_sc, FE.M,
                   FE.HIST_ROWS)
    FE._emit_group(y_i, yh_i, k2_ref, gw, win_g, bwi_sc, FE.M,
                   FE.HIST_ROWS)
    xwrow[0:1, :] = xw[tile - 1:tile, :]
    FE._store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi,
                      ocy)
    _pfb_tail(bwr_sc, bwi_sc, consts, demod_out, seg_out, prev_out,
              obr, bprev, prevp, bext_r, bext_i, winc)
    if wf_w:
        # sel_ref is consts[3] (the group-aligned segment selector)
        _wf_epilogue(bext_r, bext_i, winw, kwf_ref, wffold_ref, wf_sel,
                     consts[3], wfseg_out, wf_w)


def _duo_body_cs16(xw_ref, fhr_ref, fhi_ref, cx_ref, cy_ref, h_ref,
                   prev_ref,
                   w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref,
                   el_ref,
                   *rest, band_out: bool, wf_w: int, wf_p: int):
    (consts, kwf_ref, wffold_ref, wf_sel, demod_out, seg_out, prev_out,
     obr, ohr, ohi, ocy, wfseg_out,
     yh_r, yh_i, xwrow, ysc, gw, win_g, bwr_sc, bwi_sc,
     bprev, prevp, bext_r, bext_i, winc, winw) = _duo_unpack(
        rest, band_out, wf_w, wf_p)
    tile = xw_ref.shape[0]
    s = pl.program_id(0)
    _duo_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, h_ref, prev_ref,
                    yh_r, yh_i, xwrow, ysc, bprev, prevp)

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xr, xi = FE._decode_cs16(xw_ref[:])
    xprev_r = jnp.concatenate([xwrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xwrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = FE._ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = FE._ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)
    y_r, yl_r = FE._plane_dc(yloc_r, ysc[0:1, 0:1], tt, pvec, pj_ref,
                             e_last, FE._PJ_LAST)
    y_i, yl_i = FE._plane_dc(yloc_i, ysc[1:2, 0:1], tt, pvec, pj_ref,
                             e_last, FE._PJ_LAST)
    FE._emit_group(y_r, yh_r, k2_ref, gw, win_g, bwr_sc, FE.M,
                   FE.HIST_ROWS)
    FE._emit_group(y_i, yh_i, k2_ref, gw, win_g, bwi_sc, FE.M,
                   FE.HIST_ROWS)
    xwrow[0:1, :] = xr[tile - 1:tile, :]
    xwrow[1:2, :] = xi[tile - 1:tile, :]
    FE._store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi,
                      ocy)
    _pfb_tail(bwr_sc, bwi_sc, consts, demod_out, seg_out, prev_out,
              obr, bprev, prevp, bext_r, bext_i, winc)
    if wf_w:
        # sel_ref is consts[3] (the group-aligned segment selector)
        _wf_epilogue(bext_r, bext_i, winw, kwf_ref, wffold_ref, wf_sel,
                     consts[3], wfseg_out, wf_w)


def _duo_body_pk2(xw_ref, fhr_ref, fhi_ref, cx_ref, cy_ref, h_ref,
                  prev_ref,
                  w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref,
                  el_ref, g0_ref, g1_ref,
                  *rest, signed: bool, band_out: bool, wf_w: int, wf_p: int):
    (consts, kwf_ref, wffold_ref, wf_sel, demod_out, seg_out, prev_out,
     obr, ohr, ohi, ocy, wfseg_out,
     yh_r, yh_i, xwrow, ysc, gw, win_g, bwr_sc, bwi_sc,
     bprev, prevp, bext_r, bext_i, winc, winw) = _duo_unpack(
        rest, band_out, wf_w, wf_p)
    tile = xw_ref.shape[0]
    s = pl.program_id(0)
    _duo_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, h_ref, prev_ref,
                    yh_r, yh_i, xwrow, ysc, bprev, prevp)

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    b0, b1, b2, b3 = FE._decode_bytes(xw_ref[:], signed)
    g0 = g0_ref[:]
    g1 = g1_ref[:]
    xr = FE._dot(b0, g0) + FE._dot(b2, g1)
    xi = FE._dot(b1, g0) + FE._dot(b3, g1)
    xprev_r = jnp.concatenate([xwrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xwrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = FE._ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = FE._ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)
    y_r, yl_r = FE._plane_dc(yloc_r, ysc[0:1, 0:1], tt, pvec, pj_ref,
                             e_last, FE._PJ_LAST_W)
    y_i, yl_i = FE._plane_dc(yloc_i, ysc[1:2, 0:1], tt, pvec, pj_ref,
                             e_last, FE._PJ_LAST_W)
    FE._emit_group(y_r, yh_r, k2_ref, gw, win_g, bwr_sc, FE.W2,
                   FE.HIST_ROWS_W)
    FE._emit_group(y_i, yh_i, k2_ref, gw, win_g, bwi_sc, FE.W2,
                   FE.HIST_ROWS_W)
    xwrow[0:1, :] = xr[tile - 1:tile, :]
    xwrow[1:2, :] = xi[tile - 1:tile, :]
    yh_r[:, :] = y_r[tile - FE.HIST_ROWS_W:, :]
    yh_i[:, :] = y_i[tile - FE.HIST_ROWS_W:, :]
    ysc[0:1, 0:1] = yl_r[tile - 1:tile, :]
    ysc[1:2, 0:1] = yl_i[tile - 1:tile, :]
    ohr[:, :] = yh_r[:, :]
    ohi[:, :] = yh_i[:, :]
    ocy[:, :] = ysc[:, :]
    _pfb_tail(bwr_sc, bwi_sc, consts, demod_out, seg_out, prev_out,
              obr, bprev, prevp, bext_r, bext_i, winc)
    if wf_w:
        # sel_ref is consts[3] (the group-aligned segment selector)
        _wf_epilogue(bext_r, bext_i, winw, kwf_ref, wffold_ref, wf_sel,
                     consts[3], wfseg_out, wf_w)


class PallasScannerDuo:
    """Front end + PFB/discriminator as ONE kernel: wire in, demod3 +
    per-sub-chunk |y| segments out; the band lives only in VMEM.

    apply(dc_x, dc_y, front_hist, pfb_hist, parity, prev, wire, ns) ->
      (dc_x', dc_y', front_hist', demod3 [16, G, 25], mag_sums [K, 16],
       pfb_hist' [400] c64, parity', prev' [16] c64)

    Same carried state as (PallasFrontEnd, PallasPfbDemod.call_group)
    concatenated; the band carries are bit-exact vs the two-kernel pair
    and demod agrees to f32 rounding (matmul-shape accumulation order).
    """

    def __init__(self, fmt: str, tile_rows: int = 640,
                 interpret: bool = False):
        # 640 rows (gt=40 at the bench geometries): gt=56 tiles crash the
        # remote compiler (same class as the documented gt=256 / XLA
        # K=320 crashes); gt<=40 compile-probed PASS
        assert fmt in ("cf32", "cf32w", "cs16", "cu8", "cs8")
        self.fmt = fmt
        self.wide = fmt in ("cu8", "cs8")
        self.tile_rows = tile_rows
        self.interpret = interpret
        self.fcn = (FE._row_consts_wide() if self.wide
                    else FE._row_consts())
        self.front_hist_len = FE.HIST_W if self.wide else FE.HIST
        self.pc = PD._packed_consts()

    def init_state(self):
        return (jnp.zeros((), jnp.complex64), jnp.zeros((), jnp.complex64),
                jnp.zeros((self.front_hist_len,), jnp.complex64),
                jnp.zeros((PD.HIST,), jnp.complex64),
                jnp.zeros((), jnp.int32),
                jnp.zeros((NCH,), jnp.complex64))

    @staticmethod
    def waterfall_supported(w: int, k: int | None = None) -> bool:
        """In-kernel hop-PSD support: uniform path needs whole hops per
        group row (w | 1600); general widths (e.g. -w 120) need the
        phase-reset geometry (ops/spectrogram.kernel_wf_supported with
        k).  Unsupported widths fall back to band_out + the XLA asgram."""
        from sdr_pmr446_tpu.ops import spectrogram
        return spectrogram.kernel_wf_supported(w, k=k)

    def apply(self, dc_x, dc_y, front_hist, pfb_hist, parity, prev,
              wire, ns: int = C.SUBCHUNK_AUDIO, band_out: bool = False,
              waterfall_w: int = 0):
        from sdr_pmr446_tpu.ops.decode import decode_planes
        fmt = self.fmt
        cn = self.fcn
        pc = self.pc
        m = FE.M

        if fmt == "cf32":
            xw = jnp.stack([jnp.real(wire), jnp.imag(wire)],
                           axis=-1).reshape(-1).astype(jnp.float32)
            wire = xw.reshape(wire.shape[-1] // m, 2 * m)
            fmt = "cf32w"
        import math
        wf_w = waterfall_w
        wf_p = 1
        if wf_w:
            assert not band_out, "waterfall_w replaces band_out"
            delay_wf = wf_w // 4
            if not (1600 % wf_w == 0 and GL % delay_wf == 0):
                # general width: hop phase repeats every P group rows
                wf_p = delay_wf // math.gcd(GL, delay_wf)
        if fmt == "cf32w":
            rows, width, x_width = wire.shape[0], m, 2 * m
            body = functools.partial(_duo_body_ilv, band_out=band_out,
                                     wf_w=wf_w, wf_p=wf_p)
            cxv = jnp.stack([jnp.real(dc_x),
                             jnp.imag(dc_x)]).astype(jnp.float32)
            sel = np.zeros((2, 2 * m), np.float32)
            sel[0, 2 * m - 2] = 1.0
            sel[1, 2 * m - 1] = 1.0
            cx_row = (cxv[:, None] * sel).sum(axis=0, keepdims=True)
            fcon = (cn["wcat_r"], cn["wcat_i"])
            fcon_tail = (cn["ew_r"], cn["ew_i"])
        elif fmt == "cs16":
            rows, width, x_width = wire.shape[0], m, m
            body = functools.partial(_duo_body_cs16, band_out=band_out,
                                     wf_w=wf_w, wf_p=wf_p)
            cxv = jnp.stack([jnp.real(dc_x),
                             jnp.imag(dc_x)]).astype(jnp.float32)
            sel = np.zeros((1, m), np.float32)
            sel[0, m - 1] = 1.0
            cx_row = cxv[:, None] * sel
            fcon = (cn["w1"],)
            fcon_tail = ()
        else:
            rows, width, x_width = wire.shape[0], FE.W2, m
            body = functools.partial(_duo_body_pk2, signed=fmt == "cs8",
                                     band_out=band_out, wf_w=wf_w,
                                     wf_p=wf_p)
            cxv = jnp.stack([jnp.real(dc_x),
                             jnp.imag(dc_x)]).astype(jnp.float32)
            sel = np.zeros((1, FE.W2), np.float32)
            sel[0, FE.W2 - 1] = 1.0
            cx_row = cxv[:, None] * sel
            fcon = (cn["w1"],)
            fcon_tail = (cn["g0"], cn["g1"])

        row_mult = 64 if self.wide else 128
        # general waterfall widths (wf_p > 1): the tile must be a
        # multiple of row_mult * P so hop phases repeat per tile and
        # each phase class keeps a sublane-multiple row count
        tile = FE.pick_tile_group(rows, self.tile_rows, row_mult * wf_p)
        n_tiles = rows // tile
        gt = tile * width // (16 * m)
        g_total = rows * width // (16 * m)
        f_total = 25 * g_total
        hist_rows = FE.HIST_ROWS_W if self.wide else FE.HIST_ROWS
        tt, pvec = FE._tile_consts(tile, width)
        k2 = FE._row_consts()["k2"]
        nsg = ns // 25
        assert g_total % nsg == 0
        if wf_w:
            assert self.waterfall_supported(wf_w, k=g_total // nsg), wf_w
        sel_np, scatter_np = PD._group_selectors(gt, n_tiles, g_total, nsg)
        n_seg = sel_np.shape[1]
        altc = np.where(np.arange(gt)[:, None] % 2 == 0, 1.0,
                        -1.0).astype(np.float32)

        psign = (1.0 - 2.0 * (parity % 2)).astype(jnp.float32)
        fhr = jnp.real(front_hist).astype(jnp.float32).reshape(hist_rows,
                                                               width)
        fhi = jnp.imag(front_hist).astype(jnp.float32).reshape(hist_rows,
                                                               width)
        cy = FE.PallasFrontEnd._cy_rows(dc_y)
        hist_ri = jnp.stack([jnp.real(pfb_hist),
                             jnp.imag(pfb_hist)]).astype(jnp.float32)
        prev_ri = (jnp.stack([jnp.real(prev), jnp.imag(prev)]
                             ).astype(jnp.float32) * psign)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        grid_block = lambda w: pl.BlockSpec((tile, w), lambda s: (s, 0),
                                            memory_space=pltpu.VMEM)
        whole = lambda shape: pl.BlockSpec(
            shape, lambda s: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        band_specs = ([pl.BlockSpec((gt, GL), lambda s: (s, 0),
                                    memory_space=pltpu.VMEM)] * 2
                      if band_out else [])
        band_shapes = ([jax.ShapeDtypeStruct((g_total, GL), jnp.float32)] * 2
                       if band_out else [])
        band_scratch = ([] if band_out
                        else [pltpu.VMEM((gt, GL), jnp.float32)] * 2)
        if wf_w:
            from sdr_pmr446_tpu.ops.spectrogram import _dft_win_packed
            kwf = _dft_win_packed(wf_w)                # [w, 2w]
            wff = np.zeros((2 * wf_w, wf_w), np.float32)
            wff[np.arange(wf_w), np.arange(wf_w)] = 1.0
            wff[wf_w + np.arange(wf_w), np.arange(wf_w)] = 1.0
            wf_in = [jnp.asarray(kwf), jnp.asarray(wff)]
            wf_in_specs = [vmem(), vmem()]
            if wf_p > 1:
                # one-hot phase-class row selectors (see _wf_epilogue):
                # selc picks current rows of class c, selp their
                # predecessors, scat scatters class sums back to rows
                gtp = gt // wf_p
                selc = np.zeros((wf_p * gtp, gt + 1), np.float32)
                selp = np.zeros((wf_p * gtp, gt + 1), np.float32)
                scat = np.zeros((gt, wf_p * gtp), np.float32)
                for c in range(wf_p):
                    for i in range(gtp):
                        r0 = c + wf_p * i
                        selc[c * gtp + i, 1 + r0] = 1.0
                        selp[c * gtp + i, r0] = 1.0
                        scat[r0, c * gtp + i] = 1.0
                wf_in += [jnp.asarray(selc), jnp.asarray(selp),
                          jnp.asarray(scat)]
                wf_in_specs += [vmem()] * 3
            wf_out_specs = [pl.BlockSpec((None, n_seg, wf_w),
                                         lambda s: (s, 0, 0),
                                         memory_space=pltpu.VMEM)]
            wf_out_shapes = [jax.ShapeDtypeStruct(
                (n_tiles, n_seg, wf_w), jnp.float32)]
            # ONE hop's packed window [wr | wi]: w lanes, reused per hop
            # (a full 1600-lane window batch OOM'd scoped VMEM at K=40)
            wf_scratch = [pltpu.VMEM((gt, wf_w), jnp.float32)]
        else:
            wf_in, wf_in_specs = [], []
            wf_out_specs, wf_out_shapes, wf_scratch = [], [], []
        outs = pl.pallas_call(
            body,
            grid=(n_tiles,),
            in_specs=[
                grid_block(x_width),
                whole((hist_rows, width)), whole((hist_rows, width)),
                whole(cx_row.shape), whole((2, m)),
                whole((2, GL)),                    # pfb hist row
                whole((2, NCH)),                   # prev frame
            ] + [vmem()] * (len(fcon) + 6 + len(fcon_tail)) + [
                vmem(), vmem(), vmem(),            # k4, k1, altc
                pl.BlockSpec((None, n_seg, gt), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),   # seg selector
            ] + [vmem()] * 14 + wf_in_specs,       # packed consts (+ wf)
            out_specs=[
                pl.BlockSpec((NCH, gt, 25), lambda s: (0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n_seg, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                whole((2, NCH)),
                whole((2, GL)),
                whole((hist_rows, width)), whole((hist_rows, width)),
                whole((2, m)),
            ] + wf_out_specs + band_specs,
            out_shape=[
                jax.ShapeDtypeStruct((NCH, g_total, 25), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, n_seg, NCH), jnp.float32),
                jax.ShapeDtypeStruct((2, NCH), jnp.float32),
                jax.ShapeDtypeStruct((2, GL), jnp.float32),
                jax.ShapeDtypeStruct((hist_rows, width), jnp.float32),
                jax.ShapeDtypeStruct((hist_rows, width), jnp.float32),
                jax.ShapeDtypeStruct((2, m), jnp.float32),
            ] + wf_out_shapes + band_shapes,
            scratch_shapes=[
                pltpu.VMEM((hist_rows, width), jnp.float32),   # yh_r
                pltpu.VMEM((hist_rows, width), jnp.float32),   # yh_i
                pltpu.VMEM(cx_row.shape, jnp.float32),         # xwrow
                pltpu.VMEM((2, m), jnp.float32),               # ysc
                pltpu.VMEM((1, 16 * m), jnp.float32),          # gw
                pltpu.VMEM((gt, FE.W_PAD), jnp.float32),       # win_g
            ] + band_scratch + [
                pltpu.VMEM((2, GL), jnp.float32),              # bprev
                pltpu.VMEM((1, 128), jnp.float32),             # prevp
                pltpu.VMEM((gt + 1, GL), jnp.float32),         # bext_r
                pltpu.VMEM((gt + 1, GL), jnp.float32),         # bext_i
                pltpu.VMEM((gt, 2 * W4), jnp.float32),         # winc
            ] + wf_scratch,
            interpret=self.interpret,
        )(wire, fhr, fhi, cx_row, cy, hist_ri, prev_ri,
          *(jnp.asarray(c) for c in fcon),
          jnp.asarray(cn["u0"]), jnp.asarray(cn["pj"]),
          jnp.asarray(tt), jnp.asarray(pvec), jnp.asarray(k2),
          jnp.asarray(cn["e_last"]),
          *(jnp.asarray(c) for c in fcon_tail),
          jnp.asarray(pc["k4"]), jnp.asarray(pc["k1"]),
          jnp.asarray(altc), jnp.asarray(sel_np),
          jnp.asarray(pc["swap"]), jnp.asarray(pc["sh32"]),
          jnp.asarray(pc["sel96"]), jnp.asarray(pc["fa"]),
          jnp.asarray(pc["fb"]), jnp.asarray(pc["fold4"]),
          jnp.asarray(pc["sre"]), jnp.asarray(pc["sim"]),
          jnp.asarray(pc["ep"][0]), jnp.asarray(pc["ep"][1]),
          jnp.asarray(pc["ep"][2]), jnp.asarray(pc["ep"][3]),
          jnp.asarray(pc["srow"]), jnp.asarray(pc["ones_row"]), *wf_in)

        (demod3, segs, oprev, obr, ohr, ohi, ocy) = outs[:7]
        wf_segs = outs[7] if wf_w else None
        bw_r = outs[7] if band_out else None
        bw_i = outs[8] if band_out else None
        mag_sums = jnp.einsum("tsc,tsk->kc", segs, jnp.asarray(scatter_np),
                              precision=jax.lax.Precision.HIGHEST)
        new_dc_y = jax.lax.complex(ocy[0, 0], ocy[1, 0])
        new_fh = jax.lax.complex(ohr.reshape(-1), ohi.reshape(-1))
        new_hist = jax.lax.complex(obr[0], obr[1])
        new_parity = (parity + f_total) % 2
        new_prev = (jax.lax.complex(oprev[0], oprev[1])
                    * psign).astype(jnp.complex64)
        if fmt == "cf32w":
            new_dc_x = jax.lax.complex(wire[rows - 1, 2 * m - 2],
                                       wire[rows - 1, 2 * m - 1])
        elif fmt == "cs16":
            xr_l, xi_l = decode_planes(wire[rows - 1, m - 1:m], "cs16")
            new_dc_x = jax.lax.complex(xr_l[0], xi_l[0])
        else:
            xr_l, xi_l = decode_planes(wire[rows - 1, m - 1:m], self.fmt)
            new_dc_x = jax.lax.complex(xr_l[1], xi_l[1])
        out = (new_dc_x, new_dc_y, new_fh, demod3, mag_sums, new_hist,
               new_parity, new_prev)
        if wf_w:
            # per-sub-chunk |S|^2 sums [K, w]: same scatter as mag_sums
            wf_sums = jnp.einsum("tsw,tsk->kw", wf_segs,
                                 jnp.asarray(scatter_np),
                                 precision=jax.lax.Precision.HIGHEST)
            return out + (wf_sums,)
        return out + ((bw_r, bw_i),) if band_out else out
