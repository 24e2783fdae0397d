"""Pallas TPU kernel: fused PFB channelizer + NBFM discriminator.

The "metric kernel" of SURVEY.md §7 step 5: one pass over the 200 kHz band
computes, per 16-sample frame,

  1. the 16-channel critically-sampled PFB analysis (prototype FIR x DFT16 x
     NCO mixer folded into one static [416, 32] real kernel — same math as
     ops/pfb.py),
  2. the (-1)^frame mixer parity,
  3. the NBFM quadrature discriminator against the previous frame,
  4. the channel magnitudes (squelch/RSSI input),

without materializing the complex channel matrix in HBM.  Per grid step the
tile's new frames plus a 400-sample history row arrive as ordinary
non-overlapping BlockSpec tiles (the host pre-slices the 5%-duplicated
history rows, so the pallas pipeline auto-DMAs and double-buffers
everything; this Mosaic build has no dynamic-slice DMA).  The windows matrix
[TILE_F, 416] is assembled with 26 aligned row-block copies and hit with one
MXU matmul against the fused [416, 32] kernel for Re/Im of all 16 channels.
The previous frame's outputs persist in VMEM scratch across the (sequential)
TPU grid, so the discriminator adds no HBM traffic.

Mosaic tiling requires 128-divisible frame tiles while the scanner's frame
count per block (K*1225) has no factor of two, so the band is zero-padded up
to a whole number of tiles and the surplus frames are sliced off on the
host; the carried previous-sample state is reconstructed exactly from the
true last frame with a single 416-tap dot outside the kernel.

Sign bookkeeping: y_true[f] = (-1)^(n0+f) * conv_f with n0 the carried global
frame parity.  The caller folds (-1)^(n0) into the input (linearity); the
kernel applies (-1)^(local f); outputs are therefore already in true space.

A pure-JAX reference path (reference_impl) defines the exact semantics;
tests compare both (kernel in interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.ops.pfb import make_pfb_kernel
from sdr_pmr446_tpu.kernels import kmath, precision

NCH = C.NUM_CHANNELS                  # 16
NTAPS = 2 * NCH * C.PFB_SEMILENGTH    # 416
HIST = NTAPS - NCH                    # 400
SUB = NTAPS // NCH                    # 26 row-blocks per window


def _dot(a, b):
    # HIGHEST: the backend default contracts f32 in bf16 (kernels/precision)
    return jnp.dot(a, b, precision=precision.get(),
                   preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _fused_kernel_matrix() -> np.ndarray:
    """CK split into Re/Im planes: [2, 416, 16] f32."""
    from sdr_pmr446_tpu.taps import design as D
    ck = make_pfb_kernel(D.pfb_prototype())      # [416, 16] complex
    return np.stack([ck.real, ck.imag]).astype(np.float32)


def _body(fr_ref, fi_ref, hr_ref, hi_ref, kr_ref, ki_ref, prev_ref,
          demod_out, mag_out,
          win_r, win_i, prev_scratch):
    tile_f = demod_out.shape[1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        prev_scratch[:, :] = prev_ref[:, :]

    # this tile's band slice = 25 history frames + tile_f new frames, all in
    # [*, 16] frame-matrix layout (non-overlapping BlockSpec tiles, auto-
    # DMA'd and double-buffered by the pallas pipeline)
    xr_frames = jnp.concatenate([hr_ref[:], fr_ref[:]], axis=0)
    xi_frames = jnp.concatenate([hi_ref[:], fi_ref[:]], axis=0)
    for i in range(SUB):
        win_r[:, i * NCH:(i + 1) * NCH] = xr_frames[i:i + tile_f, :]
        win_i[:, i * NCH:(i + 1) * NCH] = xi_frames[i:i + tile_f, :]

    kr = kr_ref[:]
    ki = ki_ref[:]
    wr = win_r[:]
    wi = win_i[:]
    yr = _dot(wr, kr) - _dot(wi, ki)
    yi = _dot(wr, ki) + _dot(wi, kr)

    # (-1)^(local frame index); tile_f is even so the step offset is even too
    f_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_f, NCH), 0)
    sign = jnp.where((f_idx % 2) == 0, 1.0, -1.0).astype(jnp.float32)
    yr = yr * sign
    yi = yi * sign

    # discriminator vs previous frame
    pr = jnp.concatenate([prev_scratch[0:1, :], yr[:-1, :]], axis=0)
    pi = jnp.concatenate([prev_scratch[1:2, :], yi[:-1, :]], axis=0)
    dr = yr * pr + yi * pi
    di = yi * pr - yr * pi
    # write channel-major [16, tile] directly (in-VMEM transpose) so the
    # host needs no layout pass on the [16, F] outputs
    demod_out[:, :] = (kmath.atan2(di, dr)
                       * (1.0 / (2.0 * math.pi * C.FM_KF))).T
    mag_out[:, :] = jnp.sqrt(yr * yr + yi * yi).T
    # slice-syntax only: integer indexing lowers to dynamic_slice, which
    # this Mosaic build does not implement
    prev_scratch[0:1, :] = yr[tile_f - 1:tile_f, :]
    prev_scratch[1:2, :] = yi[tile_f - 1:tile_f, :]


def _body_group(br_ref, bi_ref, h_ref, kr_ref, ki_ref, prev_ref, alt_ref,
                sel_ref,
                demod_out, seg_out, prev_out, bprev, prev_sc,
                bext_r, bext_i, win_r, win_i):
    """GROUP-major variant: consumes the band exactly as the front-end
    group kernel emits it (bw[g, 25u+q] = band[2048g + 25u + q]) — no XLA
    relayout, pad, or history concat ever touches the band.  Per grid
    step the 25 frame phases are materialized as [gt, 416] windows
    assembled from two lane slices of the (carry-extended) group rows
    into scratch, each hit with the fused [416, 32] kernel (re|im
    columns).  The PFB history is ONE group row (400 samples), carried
    in scratch; the sub-chunk |y| sums ride per-group rows (ns = 1225
    frames = exactly 49 groups, so segment boundaries are group-aligned).
    Sign: (-1)^frame = (-1)^(row+u) and per-tile row offsets are even
    (gt % 8 == 0), so alt[g] = (-1)^g covers it; the global parity sign
    is folded into the prev carry by the caller (demod and |y| are
    invariant to it)."""
    gt = br_ref.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        bprev[:, :] = h_ref[:, :]          # [2, 400] re/im last group row
        prev_sc[:, :] = prev_ref[:, :]     # [2, 16] previous frame

    # carry-extended band rows live in SCRATCH (bext), not as values: two
    # [gt+1, 400] live vectors across 25 iterations overflow the stack
    bext_r[0:1, :] = bprev[0:1, :]
    bext_r[1:, :] = br_ref[:]
    bext_i[0:1, :] = bprev[1:2, :]
    bext_i[1:, :] = bi_ref[:]
    kr = kr_ref[:]                         # [416, 16]
    ki = ki_ref[:]
    alt = alt_ref[:]                       # [gt, 16] (-1)^g
    scale = 1.0 / (2.0 * math.pi * C.FM_KF)
    # one pass over the 25 frame phases, emitting each phase's demod as
    # soon as its predecessor exists (keeping all 25 [gt,16] pairs live
    # overflows Mosaic's stack at gt=392); only phase 0 waits for phase
    # 24 (its predecessor is the previous GROUP row's last frame)
    y0 = yprev = ylast = None
    msum = None
    for u in range(25):
        # frame (g, u) window = band[400(g-1) + 16u : 400(g-1) + 16u + 416]
        w1 = 400 - 16 * u
        win_r[:, 0:w1] = bext_r[0:gt, 16 * u:]
        win_r[:, w1:NTAPS] = bext_r[1:gt + 1, 0:16 * u + NCH]
        win_i[:, 0:w1] = bext_i[0:gt, 16 * u:]
        win_i[:, w1:NTAPS] = bext_i[1:gt + 1, 0:16 * u + NCH]
        # four offset-0 matmuls (slicing a stacked [416,32] product makes
        # lane-offset-16 values that tpu.concatenate can't relayout)
        wr = win_r[:]
        wi = win_i[:]
        yr = _dot(wr, kr) - _dot(wi, ki)
        yi = _dot(wr, ki) + _dot(wi, kr)
        m = jnp.sqrt(yr * yr + yi * yi)    # |y| is sign-invariant
        msum = m if msum is None else msum + m
        sgn = alt if u % 2 == 0 else -alt
        yr = yr * sgn
        yi = yi * sgn
        if u == 0:
            y0 = (yr, yi)
        else:
            pr, pi = yprev
            dr = yr * pr + yi * pi
            di = yi * pr - yr * pi
            demod_out[:, :, u] = (kmath.atan2(di, dr) * scale).T
        yprev = (yr, yi)
        if u == 24:
            ylast = (yr, yi)
    # phase 0: previous frame = phase 24 of the previous group row
    y24r, y24i = ylast
    pr = jnp.concatenate([prev_sc[0:1, :], y24r[:gt - 1, :]], axis=0)
    pi = jnp.concatenate([prev_sc[1:2, :], y24i[:gt - 1, :]], axis=0)
    yr, yi = y0
    dr = yr * pr + yi * pi
    di = yi * pr - yr * pi
    demod_out[:, :, 0] = (kmath.atan2(di, dr) * scale).T
    seg_out[:, :] = _dot(sel_ref[:], msum)
    prev_sc[0:1, :] = y24r[gt - 1:gt, :]
    prev_sc[1:2, :] = y24i[gt - 1:gt, :]
    prev_out[:, :] = prev_sc[:, :]
    bprev[0:1, :] = br_ref[gt - 1:gt, :]
    bprev[1:2, :] = bi_ref[gt - 1:gt, :]


@functools.lru_cache(maxsize=None)
def _packed_consts() -> dict:
    """Constants for the phase-PACKED group body (_body_group_packed).

    The unpacked body issues 4 matmuls of [gt, 416] x [416, 16] per phase
    (100 per tile) — each using 16 of the MXU's 128 output lanes (12.5%
    utilization).  Packing 4 consecutive phases per dot fills the lanes:
    phases u0..u0+3 share a 464-sample window (phase u0+p's 416 taps sit
    at offset 16p), and stacking [wr | wi] on the contraction axis folds
    the complex combination into the SAME dot, so ONE
    [gt, 928] x [928, 128] matmul yields [yr_p | yi_p] x 4 phases at
    full lane utilization.  The discriminator + magnitude epilogue then
    runs in the packed layout via one-hot fold matmuls (lane-offset
    value slices don't relayout on this Mosaic — CLAUDE.md).

    Layout of a packed vector P [*, 128]: lane 32*p + c holds, for
    c < 16, yr of phase u0+p channel c; for 16 <= c < 32, yi of channel
    c-16.
    """
    km = _fused_kernel_matrix()                  # [2, 416, 16]
    kr, ki = km[0].astype(np.float64), km[1].astype(np.float64)
    w4 = NTAPS + 3 * NCH                         # 464-sample pack window
    k4 = np.zeros((2 * w4, 4 * 2 * NCH), np.float64)
    k1 = np.zeros((2 * w4, 4 * 2 * NCH), np.float64)
    for p in range(4):
        rows = slice(16 * p, 16 * p + NTAPS)
        k4[rows, 32 * p:32 * p + 16] = kr        # wr -> yr
        k4[rows, 32 * p + 16:32 * p + 32] = ki   # wr -> yi
        k4[w4 + 16 * p:w4 + 16 * p + NTAPS, 32 * p:32 * p + 16] = -ki
        k4[w4 + 16 * p:w4 + 16 * p + NTAPS, 32 * p + 16:32 * p + 32] = kr
    k1[0:NTAPS, 0:16] = kr                       # phase-24 single pack
    k1[0:NTAPS, 16:32] = ki
    k1[w4:w4 + NTAPS, 0:16] = -ki
    k1[w4:w4 + NTAPS, 16:32] = kr

    eye16 = np.eye(NCH, dtype=np.float32)
    swap = np.zeros((128, 128), np.float32)      # yr <-> yi within a slot
    sh32 = np.zeros((128, 128), np.float32)      # slot p <- slot p-1
    sel96 = np.zeros((128, 128), np.float32)     # slot 0 <- slot 3
    fa = np.zeros((128, 64), np.float32)         # out 16p+c = A + B
    fb = np.zeros((128, 64), np.float32)         # out 16p+c = A - B
    fold4 = np.zeros((64, NCH), np.float32)      # sum the 4 phase slots
    for p in range(4):
        a = slice(32 * p, 32 * p + 16)
        b = slice(32 * p + 16, 32 * p + 32)
        o = slice(16 * p, 16 * p + 16)
        swap[b, a] = eye16
        swap[a, b] = eye16
        if p:
            sh32[32 * (p - 1):32 * (p - 1) + 32, 32 * p:32 * p + 32] = \
                np.eye(32, dtype=np.float32)
        fa[a, o] = eye16
        fa[b, o] = eye16
        fb[a, o] = eye16
        fb[b, o] = -eye16
        fold4[o, :] = eye16
    sel96[96:128, 0:32] = np.eye(32, dtype=np.float32)
    sre = np.zeros((128, NCH), np.float32)       # packed slot 0 -> re row
    sim = np.zeros((128, NCH), np.float32)
    sre[0:16, :] = eye16
    sim[16:32, :] = eye16
    ep = [np.zeros((64, NCH), np.float32) for _ in range(4)]
    for p in range(4):                           # per-phase demod extract
        ep[p][16 * p:16 * p + 16, :] = eye16
    srow = np.where(np.arange(128)[None, :] // 32 % 2 == 0, 1.0,
                    -1.0).astype(np.float32)     # (-1)^p per packed slot
    return dict(k4=k4.astype(np.float32), k1=k1.astype(np.float32),
                swap=swap, sh32=sh32, sel96=sel96, fa=fa, fb=fb,
                fold4=fold4, sre=sre, sim=sim, ep=ep, srow=srow,
                ones_row=np.ones((1, 128), np.float32))


def _body_group_packed(br_ref, bi_ref, h_ref, k4_ref, k1_ref, prev_ref,
                       altc_ref, sel_ref, swap_ref, sh32_ref, sel96_ref,
                       fa_ref, fb_ref, fold4_ref, sre_ref, sim_ref,
                       ep0_ref, ep1_ref, ep2_ref, ep3_ref,
                       srow_ref, ones_ref,
                       demod_out, seg_out, prev_out,
                       bprev, prevp, bext_r, bext_i, winc):
    """Phase-packed group body: same math as _body_group, 25 phases in
    7 full-lane dots (see _packed_consts).  Phase 24 runs FIRST so that
    phase 0's discriminator (previous group row's phase 24) is a plain
    sublane shift of an already-computed value instead of a deferred
    write."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        _pfb_packed_init(h_ref, prev_ref, bprev, prevp)

    _pfb_group_core(br_ref[:], bi_ref[:], k4_ref, k1_ref, altc_ref,
                    sel_ref, swap_ref, sh32_ref, sel96_ref, fa_ref,
                    fb_ref, fold4_ref, sre_ref, sim_ref, ep0_ref,
                    ep1_ref, ep2_ref, ep3_ref, srow_ref, ones_ref,
                    demod_out, seg_out, prev_out, bprev, prevp,
                    bext_r, bext_i, winc)


def _pfb_packed_init(h_ref, prev_ref, bprev, prevp):
    """s == 0 scratch init shared by _body_group_packed and the DUO
    (front-end-merged) scanner body."""
    bprev[:, :] = h_ref[:, :]                    # [2, 400] re/im last row
    # packed prev-frame row: [yr24 | yi24 | 0...] of the previous
    # tile's last group row (signed/kernel space, like prev_sc was)
    prevp[:, :] = jnp.zeros((1, 128), jnp.float32)
    prevp[0:1, 0:NCH] = prev_ref[0:1, :]
    prevp[0:1, NCH:2 * NCH] = prev_ref[1:2, :]


def _pfb_group_core(bw_r, bw_i, k4_ref, k1_ref, altc_ref, sel_ref,
                    swap_ref, sh32_ref, sel96_ref, fa_ref, fb_ref,
                    fold4_ref, sre_ref, sim_ref, ep0_ref, ep1_ref,
                    ep2_ref, ep3_ref, srow_ref, ones_ref,
                    demod_out, seg_out, prev_out,
                    bprev, prevp, bext_r, bext_i, winc):
    """Packed PFB+discriminator over band group-row VALUES — shared by
    the standalone kernel (_body_group_packed) and the DUO scanner body
    whose front end leaves the band in VMEM scratch.  Scratch init at
    s == 0 (_pfb_packed_init) is the caller's job."""
    gt = bw_r.shape[0]
    w4 = NTAPS + 3 * NCH                         # 464
    bext_r[0:1, :] = bprev[0:1, :]
    bext_r[1:, :] = bw_r
    bext_i[0:1, :] = bprev[1:2, :]
    bext_i[1:, :] = bw_i
    scale = 1.0 / (2.0 * math.pi * C.FM_KF)
    alt_col = altc_ref[:]                        # [gt, 1] = (-1)^g
    sgn = _dot(alt_col, srow_ref[:])             # [gt, 128]
    sgn24 = _dot(alt_col, ones_ref[:])

    dot = _dot

    # ---- phase 24 first: window = bext[g, 384:400] ++ bext[g+1, 0:400]
    winc[:, 0:16] = bext_r[0:gt, 384:400]
    winc[:, 16:416] = bext_r[1:gt + 1, :]
    winc[:, 416:w4] = jnp.zeros((gt, w4 - 416), jnp.float32)
    winc[:, w4:w4 + 16] = bext_i[0:gt, 384:400]
    winc[:, w4 + 16:w4 + 416] = bext_i[1:gt + 1, :]
    winc[:, w4 + 416:2 * w4] = jnp.zeros((gt, w4 - 416), jnp.float32)
    p24 = dot(winc[:], k1_ref[:])                # [gt, 128], slot 0 only
    p24s = p24 * sgn24                           # (-1)^24 = +1 -> row sign
    # phase 0's prev = previous row's signed phase 24 (sublane shift)
    carry0 = jnp.concatenate([prevp[0:1, :], p24s[:gt - 1, :]], axis=0)

    msum64 = None
    carry = carry0
    eps = (ep0_ref, ep1_ref, ep2_ref, ep3_ref)
    for k in range(6):                           # packs u0 = 0,4,...,20
        u0 = 4 * k
        cut = 400 - 16 * u0                      # lanes from row g
        winc[:, 0:cut] = bext_r[0:gt, 16 * u0:]
        winc[:, cut:w4] = bext_r[1:gt + 1, 0:w4 - cut]
        winc[:, w4:w4 + cut] = bext_i[0:gt, 16 * u0:]
        winc[:, w4 + cut:2 * w4] = bext_i[1:gt + 1, 0:w4 - cut]
        p = dot(winc[:], k4_ref[:])              # [gt, 128] packed 4 phases
        msq = dot(p * p, fa_ref[:])              # per-phase |y|^2 [gt, 64]
        m = jnp.sqrt(msq)
        msum64 = m if msum64 is None else msum64 + m
        ps = p * sgn
        pprev = dot(ps, sh32_ref[:]) + carry
        q1 = ps * pprev
        q2 = dot(ps, swap_ref[:]) * pprev
        dr = dot(q1, fa_ref[:])                  # [gt, 64]
        di = dot(q2, fb_ref[:])
        dem = kmath.atan2(di, dr) * scale
        for p_i in range(4):
            demod_out[:, :, u0 + p_i] = dot(dem, eps[p_i][:]).T
        carry = dot(ps, sel96_ref[:])            # slot 0 <- phase u0+3
    # phase 24 epilogue: 1-slot pack, prev = phase 23 (carry)
    msum64 = msum64 + jnp.sqrt(dot(p24 * p24, fa_ref[:]))
    q1 = p24s * carry
    q2 = dot(p24s, swap_ref[:]) * carry
    dem24 = kmath.atan2(dot(q2, fb_ref[:]), dot(q1, fa_ref[:])) * scale
    demod_out[:, :, 24] = dot(dem24, ep0_ref[:]).T
    seg_out[:, :] = dot(sel_ref[:], dot(msum64, fold4_ref[:]))
    prevp[0:1, :] = p24s[gt - 1:gt, :]
    prev_out[0:1, :] = dot(prevp[0:1, :], sre_ref[:])
    prev_out[1:2, :] = dot(prevp[0:1, :], sim_ref[:])
    bprev[0:1, :] = bw_r[gt - 1:gt, :]
    bprev[1:2, :] = bw_i[gt - 1:gt, :]


@functools.lru_cache(maxsize=None)
def _group_selectors(gt: int, n_tiles: int, g_total: int, nsg: int):
    """(sel [n_tiles, n_seg, gt], scatter [n_tiles, n_seg, K]) f32 for
    per-GROUP-row |y| segment sums: sub-chunk k covers group rows
    [nsg*k, nsg*(k+1)) (nsg = ns/25 = 49, always group-aligned)."""
    k_total = g_total // nsg
    n_seg = (gt + nsg - 2) // nsg + 1
    sel = np.zeros((n_tiles, n_seg, gt), np.float32)
    scatter = np.zeros((n_tiles, n_seg, k_total), np.float32)
    for s in range(n_tiles):
        base = (s * gt) // nsg
        for seg in range(n_seg):
            if base + seg < k_total:
                scatter[s, seg, base + seg] = 1.0
        for g in range(gt):
            k = (s * gt + g) // nsg
            sel[s, k - base, g] = 1.0
    return sel, scatter


def _body_rssi(fr_ref, fi_ref, hr_ref, hi_ref, kr_ref, ki_ref, prev_ref,
               sel_ref, demod_out, seg_out,
               win_r, win_i, prev_scratch):
    """RSSI-fused variant: instead of materializing |y| [16, F] for an
    XLA reduction to read back (two audio-rate HBM passes), the kernel
    reduces the magnitudes against a static per-tile segment selector
    (segment = the sub-chunk a frame belongs to; a tile straddles at
    most n_seg of them) — the RSSI input leaves the kernel as a tiny
    [n_seg, 16] block per tile (VERDICT r2 #1)."""
    tile_f = demod_out.shape[1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        prev_scratch[:, :] = prev_ref[:, :]

    xr_frames = jnp.concatenate([hr_ref[:], fr_ref[:]], axis=0)
    xi_frames = jnp.concatenate([hi_ref[:], fi_ref[:]], axis=0)
    for i in range(SUB):
        win_r[:, i * NCH:(i + 1) * NCH] = xr_frames[i:i + tile_f, :]
        win_i[:, i * NCH:(i + 1) * NCH] = xi_frames[i:i + tile_f, :]

    kr = kr_ref[:]
    ki = ki_ref[:]
    wr = win_r[:]
    wi = win_i[:]
    yr = _dot(wr, kr) - _dot(wi, ki)
    yi = _dot(wr, ki) + _dot(wi, kr)

    f_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_f, NCH), 0)
    sign = jnp.where((f_idx % 2) == 0, 1.0, -1.0).astype(jnp.float32)
    yr = yr * sign
    yi = yi * sign

    pr = jnp.concatenate([prev_scratch[0:1, :], yr[:-1, :]], axis=0)
    pi = jnp.concatenate([prev_scratch[1:2, :], yi[:-1, :]], axis=0)
    dr = yr * pr + yi * pi
    di = yi * pr - yr * pi
    demod_out[:, :] = (kmath.atan2(di, dr)
                       * (1.0 / (2.0 * math.pi * C.FM_KF))).T
    mag = jnp.sqrt(yr * yr + yi * yi)                     # [tile, NCH]
    seg_out[:, :] = _dot(sel_ref[:], mag)
    prev_scratch[0:1, :] = yr[tile_f - 1:tile_f, :]
    prev_scratch[1:2, :] = yi[tile_f - 1:tile_f, :]


@functools.lru_cache(maxsize=None)
def _rssi_selectors(tile: int, n_tiles: int, f_total: int, ns: int):
    """(sel [n_tiles, n_seg, tile], scatter [n_tiles, n_seg, K]) f32.

    sel[s, g // ns - first_row(s), j] = 1 for global frame g = s*tile + j
    (zero for padded frames), so sel @ mag is the per-sub-chunk magnitude
    sum restricted to tile s; scatter routes each tile segment to its
    global sub-chunk row on the host (a tiny static matmul)."""
    n_seg = tile // ns + 2
    k = -(-f_total // ns)
    sel = np.zeros((n_tiles, n_seg, tile), np.float32)
    scatter = np.zeros((n_tiles, n_seg, k), np.float32)
    for s in range(n_tiles):
        base = (s * tile) // ns
        for seg in range(n_seg):
            if base + seg < k:
                scatter[s, seg, base + seg] = 1.0
        for j in range(tile):
            g = s * tile + j
            if g < f_total:
                sel[s, g // ns - base, j] = 1.0
    return sel, scatter


class PallasPfbDemod:
    """Fused replacement for pfb.apply + fm.fm_demod + |y| (RSSI input)."""

    def __init__(self, tile_f: int = 512, interpret: bool = False):
        assert tile_f % 8 == 0 and tile_f % 2 == 0
        assert tile_f >= SUB - 1    # history-row slice trick needs tile >= 25
        self.tile_f = tile_f
        self.interpret = interpret
        self.kmat = _fused_kernel_matrix()       # [2, 416, 16] numpy

    def __call__(self, band: jax.Array, hist: jax.Array, parity: jax.Array,
                 prev: jax.Array):
        """band [T_r] c64, hist [400] c64, parity i32 scalar, prev [16] c64.

        Returns (demod [16,F] f32, mag [16,F] f32, new_hist [400] c64,
        new_parity i32, new_prev [16] c64).
        """
        return self.call_planes(jnp.real(band).astype(jnp.float32),
                                jnp.imag(band).astype(jnp.float32),
                                hist, parity, prev)

    def call_planes(self, band_r: jax.Array, band_i: jax.Array,
                    hist: jax.Array, parity: jax.Array, prev: jax.Array):
        """Re/im-plane path: feeds directly from PallasResampler.apply_planes
        with zero complex round-trips (VERDICT r1 #1).

        band_r/band_i: [T_r] f32 (or any shape reshapable to [T_r], e.g. the
        resampler's [F_res, L] outputs); hist [400] c64; parity i32; prev
        [16] c64.  Returns (demod [16,F] f32, mag [16,F] f32, new_hist [400]
        c64, new_parity i32, new_prev [16] c64).
        """
        band_r = band_r.reshape(-1)
        band_i = band_i.reshape(-1)
        t = band_r.shape[-1]
        f_total = t // NCH
        tile = self.tile_f
        n_tiles = -(-f_total // tile)
        f_pad = n_tiles * tile
        psign = (1.0 - 2.0 * (parity % 2)).astype(jnp.float32)
        pad_n = (f_pad - f_total) * NCH
        # the global (-1)^parity flips every y identically, and both demod
        # (a conjugate product) and |y| are invariant under a global sign
        # flip — so it only needs applying to the 16-element prev carry,
        # never to the band (saves a full pass over the block)
        hr = jnp.real(hist).astype(jnp.float32)
        hi = jnp.imag(hist).astype(jnp.float32)
        zpad = jnp.zeros((pad_n,), jnp.float32)
        xr_p = jnp.concatenate([hr, band_r, zpad])
        xi_p = jnp.concatenate([hi, band_i, zpad])
        prev_ri = (jnp.stack([jnp.real(prev), jnp.imag(prev)]
                             ).astype(jnp.float32) * psign)

        # split into non-overlapping per-tile views in frame-matrix layout:
        # new frames [F_pad, 16] and per-tile history frames
        # [n_tiles, 25, 16] (x[s*tile*16 : +400]) — 5% duplicated bytes buys
        # BlockSpec-pipelined tiles instead of manual dynamic-slice DMA
        # (unsupported on this Mosaic build)
        frames_r = xr_p[HIST:].reshape(f_pad, NCH)
        frames_i = xi_p[HIST:].reshape(f_pad, NCH)
        # history rows for tile s are extended-frames [s*tile, s*tile+25):
        # slice+reshape row-blocks, no gather
        ext_r = xr_p.reshape(SUB - 1 + f_pad, NCH)
        ext_i = xi_p.reshape(SUB - 1 + f_pad, NCH)
        hist_r = ext_r[:n_tiles * tile].reshape(
            n_tiles, tile, NCH)[:, :SUB - 1]
        hist_i = ext_i[:n_tiles * tile].reshape(
            n_tiles, tile, NCH)[:, :SUB - 1]
        demod_p, mag_p = pl.pallas_call(
            _body,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, NCH), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),     # frames re
                pl.BlockSpec((tile, NCH), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),     # frames im
                pl.BlockSpec((None, SUB - 1, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),     # hist re
                pl.BlockSpec((None, SUB - 1, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),     # hist im
                pl.BlockSpec(memory_space=pltpu.VMEM),     # kr
                pl.BlockSpec(memory_space=pltpu.VMEM),     # ki
                pl.BlockSpec(memory_space=pltpu.VMEM),     # prev
            ],
            out_specs=[
                pl.BlockSpec((NCH, tile), lambda s: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NCH, tile), lambda s: (0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NCH, f_pad), jnp.float32),
                jax.ShapeDtypeStruct((NCH, f_pad), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, NTAPS), jnp.float32),
                pltpu.VMEM((tile, NTAPS), jnp.float32),
                pltpu.VMEM((2, NCH), jnp.float32),
            ],
            interpret=self.interpret,
        )(frames_r, frames_i, hist_r, hist_i,
          jnp.asarray(self.kmat[0]), jnp.asarray(self.kmat[1]), prev_ri)

        demod = demod_p[:, :f_total]
        mag = mag_p[:, :f_total]
        new_hist, new_parity, new_prev = self._carries(
            xr_p, xi_p, t, f_total, parity, psign)
        return demod, mag, new_hist, new_parity, new_prev

    def call_planes_rssi(self, band_r: jax.Array, band_i: jax.Array,
                         hist: jax.Array, parity: jax.Array,
                         prev: jax.Array, ns: int = C.SUBCHUNK_AUDIO,
                         padded_demod: bool = False):
        """RSSI-fused path: returns (demod [16,F], mag_sums [K,16],
        new_hist, new_parity, new_prev) where mag_sums[k, c] is the |y|
        sum of sub-chunk k (ns frames) on channel c — the [16, F]
        magnitude plane never reaches HBM (VERDICT r2 #1).  Requires
        F % ns == 0 (the chain's static geometry guarantees it).

        ``padded_demod=True`` returns demod UNSLICED ([16, F_pad],
        F_pad = n_tiles*tile_f, trailing frames garbage): feeding that
        straight into the audio bank (which re-tiles it as a free view)
        skips the slice-copy here AND the audio bank's own pad pass."""
        band_r = band_r.reshape(-1)
        band_i = band_i.reshape(-1)
        t = band_r.shape[-1]
        f_total = t // NCH
        assert f_total % ns == 0, (f_total, ns)
        tile = self.tile_f
        n_tiles = -(-f_total // tile)
        f_pad = n_tiles * tile
        psign = (1.0 - 2.0 * (parity % 2)).astype(jnp.float32)
        pad_n = (f_pad - f_total) * NCH
        hr = jnp.real(hist).astype(jnp.float32)
        hi = jnp.imag(hist).astype(jnp.float32)
        zpad = jnp.zeros((pad_n,), jnp.float32)
        xr_p = jnp.concatenate([hr, band_r, zpad])
        xi_p = jnp.concatenate([hi, band_i, zpad])
        prev_ri = (jnp.stack([jnp.real(prev), jnp.imag(prev)]
                             ).astype(jnp.float32) * psign)

        frames_r = xr_p[HIST:].reshape(f_pad, NCH)
        frames_i = xi_p[HIST:].reshape(f_pad, NCH)
        ext_r = xr_p.reshape(SUB - 1 + f_pad, NCH)
        ext_i = xi_p.reshape(SUB - 1 + f_pad, NCH)
        hist_r = ext_r[:n_tiles * tile].reshape(
            n_tiles, tile, NCH)[:, :SUB - 1]
        hist_i = ext_i[:n_tiles * tile].reshape(
            n_tiles, tile, NCH)[:, :SUB - 1]
        sel_np, scatter_np = _rssi_selectors(tile, n_tiles, f_total, ns)
        n_seg = sel_np.shape[1]
        demod_p, segs = pl.pallas_call(
            _body_rssi,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, NCH), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, NCH), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, SUB - 1, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, SUB - 1, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),     # kr
                pl.BlockSpec(memory_space=pltpu.VMEM),     # ki
                pl.BlockSpec(memory_space=pltpu.VMEM),     # prev
                pl.BlockSpec((None, n_seg, tile), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),     # segment selector
            ],
            out_specs=[
                pl.BlockSpec((NCH, tile), lambda s: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n_seg, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NCH, f_pad), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, n_seg, NCH), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, NTAPS), jnp.float32),
                pltpu.VMEM((tile, NTAPS), jnp.float32),
                pltpu.VMEM((2, NCH), jnp.float32),
            ],
            interpret=self.interpret,
        )(frames_r, frames_i, hist_r, hist_i,
          jnp.asarray(self.kmat[0]), jnp.asarray(self.kmat[1]), prev_ri,
          jnp.asarray(sel_np))

        demod = demod_p if padded_demod else demod_p[:, :f_total]
        # route tile segments to global sub-chunk rows: a tiny static
        # einsum over [n_tiles, n_seg] — the only RSSI data XLA touches
        mag_sums = jnp.einsum("tsc,tsk->kc", segs, jnp.asarray(scatter_np),
                              precision=jax.lax.Precision.HIGHEST)
        new_hist, new_parity, new_prev = self._carries(
            xr_p, xi_p, t, f_total, parity, psign)
        return demod, mag_sums, new_hist, new_parity, new_prev

    def call_group(self, bw_r: jax.Array, bw_i: jax.Array,
                   hist: jax.Array, parity: jax.Array, prev: jax.Array,
                   ns: int = C.SUBCHUNK_AUDIO, tile_g: int = 56,
                   packed: bool = True):
        """GROUP-major path: bw_r/bw_i [G, 400] straight from the
        front-end group kernel (PallasFrontEnd.apply_*(group_out=True)).

        Returns (demod3 [16, G, 25], mag_sums [K, 16], new_hist [400]
        c64, new_parity, new_prev [16] c64) — demod3.reshape(16, -1) is
        the standard channel-major [16, F] plane as a FREE view (F =
        25*G exactly: the group geometry has no tail padding at all).
        Requires ns % 25 == 0 and G divisible by a multiple-of-8 tile
        (chain gates this on subchunks_per_step % 8 == 0).

        ``packed=True`` (default) runs the phase-PACKED body: 25 phases
        in 7 full-lane MXU dots instead of 100 sixteen-lane ones (~4x
        fewer MXU cycles, same math to f32 summation rounding —
        interleaving re/im in one contraction reorders the adds);
        ``packed=False`` keeps the one-dot-per-phase body for A/B."""
        from sdr_pmr446_tpu.kernels.front_end import pick_tile
        g_total = bw_r.shape[0]
        assert ns % 25 == 0
        nsg = ns // 25                   # group rows per sub-chunk (49)
        assert g_total % nsg == 0, (g_total, nsg)
        gt = pick_tile(g_total, tile_g)
        n_tiles = g_total // gt
        f_total = 25 * g_total
        psign = (1.0 - 2.0 * (parity % 2)).astype(jnp.float32)
        hist_ri = jnp.stack([jnp.real(hist),
                             jnp.imag(hist)]).astype(jnp.float32)
        prev_ri = (jnp.stack([jnp.real(prev), jnp.imag(prev)]
                             ).astype(jnp.float32) * psign)
        sel_np, scatter_np = _group_selectors(gt, n_tiles, g_total, nsg)
        n_seg = sel_np.shape[1]
        if packed:
            return self._call_group_packed(
                bw_r, bw_i, hist_ri, prev_ri, psign, parity, gt, n_tiles,
                g_total, f_total, sel_np, scatter_np, n_seg)
        alt = np.where(np.arange(gt)[:, None] % 2 == 0, 1.0,
                       -1.0).astype(np.float32) * np.ones((1, NCH),
                                                          np.float32)

        demod3, segs, ocp = pl.pallas_call(
            _body_group,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((gt, 16 * 25), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),     # bw re
                pl.BlockSpec((gt, 16 * 25), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),     # bw im
                pl.BlockSpec(memory_space=pltpu.VMEM),     # hist [2, 400]
                pl.BlockSpec(memory_space=pltpu.VMEM),     # kr
                pl.BlockSpec(memory_space=pltpu.VMEM),     # ki
                pl.BlockSpec(memory_space=pltpu.VMEM),     # prev [2, 16]
                pl.BlockSpec(memory_space=pltpu.VMEM),     # alt
                pl.BlockSpec((None, n_seg, gt), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),     # seg selector
            ],
            out_specs=[
                pl.BlockSpec((NCH, gt, 25), lambda s: (0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n_seg, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, NCH), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NCH, g_total, 25), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, n_seg, NCH), jnp.float32),
                jax.ShapeDtypeStruct((2, NCH), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 16 * 25), jnp.float32),    # band carry row
                pltpu.VMEM((2, NCH), jnp.float32),        # prev frame
                pltpu.VMEM((gt + 1, 16 * 25), jnp.float32),
                pltpu.VMEM((gt + 1, 16 * 25), jnp.float32),
                pltpu.VMEM((gt, NTAPS), jnp.float32),
                pltpu.VMEM((gt, NTAPS), jnp.float32),
            ],
            interpret=self.interpret,
        )(bw_r, bw_i, hist_ri, jnp.asarray(self.kmat[0]),
          jnp.asarray(self.kmat[1]), prev_ri,
          jnp.asarray(alt), jnp.asarray(sel_np))

        mag_sums = jnp.einsum("tsc,tsk->kc", segs, jnp.asarray(scatter_np),
                              precision=jax.lax.Precision.HIGHEST)
        new_hist = jax.lax.complex(bw_r[g_total - 1], bw_i[g_total - 1])
        new_parity = (parity + f_total) % 2
        # the kernel's carried last frame is exact (no padding) but lives
        # in kernel space ((-1)^f * conv = true * (-1)^parity_in): unfold
        # the global parity sign to return the TRUE-space carry
        new_prev = (jax.lax.complex(ocp[0], ocp[1])
                    * psign).astype(jnp.complex64)
        return demod3, mag_sums, new_hist, new_parity, new_prev

    def _call_group_packed(self, bw_r, bw_i, hist_ri, prev_ri, psign,
                           parity, gt, n_tiles, g_total, f_total,
                           sel_np, scatter_np, n_seg):
        """pallas_call plumbing for _body_group_packed (see call_group)."""
        pc = _packed_consts()
        w4 = NTAPS + 3 * NCH
        altc = np.where(np.arange(gt)[:, None] % 2 == 0, 1.0,
                        -1.0).astype(np.float32)          # [gt, 1]
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        demod3, segs, ocp = pl.pallas_call(
            _body_group_packed,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((gt, 16 * 25), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),     # bw re
                pl.BlockSpec((gt, 16 * 25), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),     # bw im
                vmem(),                                    # hist [2, 400]
                vmem(), vmem(),                            # k4, k1
                vmem(),                                    # prev [2, 16]
                vmem(),                                    # alt col [gt, 1]
                pl.BlockSpec((None, n_seg, gt), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),     # seg selector
                vmem(), vmem(), vmem(),                    # swap, sh32, sel96
                vmem(), vmem(), vmem(),                    # fa, fb, fold4
                vmem(), vmem(),                            # sre, sim
                vmem(), vmem(), vmem(), vmem(),            # ep0..ep3
                vmem(), vmem(),                            # srow, ones_row
            ],
            out_specs=[
                pl.BlockSpec((NCH, gt, 25), lambda s: (0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n_seg, NCH), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, NCH), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NCH, g_total, 25), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, n_seg, NCH), jnp.float32),
                jax.ShapeDtypeStruct((2, NCH), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 16 * 25), jnp.float32),    # band carry row
                pltpu.VMEM((1, 128), jnp.float32),        # packed prev frame
                pltpu.VMEM((gt + 1, 16 * 25), jnp.float32),
                pltpu.VMEM((gt + 1, 16 * 25), jnp.float32),
                pltpu.VMEM((gt, 2 * w4), jnp.float32),    # [wr | wi] window
            ],
            interpret=self.interpret,
        )(bw_r, bw_i, hist_ri, jnp.asarray(pc["k4"]), jnp.asarray(pc["k1"]),
          prev_ri, jnp.asarray(altc), jnp.asarray(sel_np),
          jnp.asarray(pc["swap"]), jnp.asarray(pc["sh32"]),
          jnp.asarray(pc["sel96"]), jnp.asarray(pc["fa"]),
          jnp.asarray(pc["fb"]), jnp.asarray(pc["fold4"]),
          jnp.asarray(pc["sre"]), jnp.asarray(pc["sim"]),
          jnp.asarray(pc["ep"][0]), jnp.asarray(pc["ep"][1]),
          jnp.asarray(pc["ep"][2]), jnp.asarray(pc["ep"][3]),
          jnp.asarray(pc["srow"]), jnp.asarray(pc["ones_row"]))

        mag_sums = jnp.einsum("tsc,tsk->kc", segs, jnp.asarray(scatter_np),
                              precision=jax.lax.Precision.HIGHEST)
        new_hist = jax.lax.complex(bw_r[g_total - 1], bw_i[g_total - 1])
        new_parity = (parity + f_total) % 2
        new_prev = (jax.lax.complex(ocp[0], ocp[1])
                    * psign).astype(jnp.complex64)
        return demod3, mag_sums, new_hist, new_parity, new_prev

    def _carries(self, xr_p, xi_p, t, f_total, parity, psign):
        # carried history is tiny (400 samples): complex for state-pytree
        # compatibility with the XLA path
        new_hist = jax.lax.complex(xr_p[t:t + HIST], xi_p[t:t + HIST])
        new_parity = (parity + f_total) % 2
        # exact previous-sample carry: recompute the true last frame with one
        # 416-tap dot (the kernel's own last frame may be a padded one)
        kr = jnp.asarray(self.kmat[0])                    # [416, 16]
        ki = jnp.asarray(self.kmat[1])
        lwr = xr_p[HIST + t - NTAPS:HIST + t][:, None]
        lwi = xi_p[HIST + t - NTAPS:HIST + t][:, None]
        last_sign = psign * (1.0 - 2.0 * ((f_total - 1) % 2))
        new_prev = jax.lax.complex(
            jnp.sum(lwr * kr - lwi * ki, axis=0),
            jnp.sum(lwr * ki + lwi * kr, axis=0)) * last_sign
        new_prev = new_prev.astype(jnp.complex64)
        return new_hist, new_parity, new_prev


def last_frame_output(tail_r: jax.Array, tail_i: jax.Array,
                      sign: jax.Array) -> jax.Array:
    """Channel outputs of the final PFB frame from the last 416 extended
    samples (re/im planes); sign = (-1)^(global index of that frame).

    This is the discriminator's previous-sample halo for time-sharded
    execution: each shard computes its own last frame with one 416-tap dot
    and ppermutes it to the right neighbor (parallel/scanner_sharded.py).
    Identical math to call_planes' new_prev.
    """
    kmat = _fused_kernel_matrix()
    kr = jnp.asarray(kmat[0])
    ki = jnp.asarray(kmat[1])
    lwr = tail_r[:, None]
    lwi = tail_i[:, None]
    y = jax.lax.complex(jnp.sum(lwr * kr - lwi * ki, axis=0),
                        jnp.sum(lwr * ki + lwi * kr, axis=0))
    return (y * sign).astype(jnp.complex64)


def reference_impl(band, hist, parity, prev):
    """Pure-JAX semantics: ops/pfb + ops/fm + magnitude."""
    from sdr_pmr446_tpu.ops.pfb import PFBChannelizer
    from sdr_pmr446_tpu.ops import fm
    from sdr_pmr446_tpu.taps import design as D
    pfb = PFBChannelizer(D.pfb_prototype())
    (new_hist, new_parity), chan = pfb.apply((hist, parity), band)
    new_prev, demod = fm.fm_demod(prev, chan)
    return demod, jnp.abs(chan), new_hist, new_parity, new_prev
