"""Pallas TPU kernel: fused IQ DC blocker + 25/128 polyphase resampler.

NEXT.md round-2 item #0 — the largest remaining HBM saving in the scanner
front end.  Unfused, the chain moves ~24 B per input sample before the band
even exists: the one-pole DC blocker (reference: src/sdr_pmr446.c:422,795)
reads the input planes and writes the blocked planes (16 B), which the
resampler kernel then reads back (8 B).  Here the recurrence runs INSIDE the
resampler kernel, so the front end's HBM traffic is the 8 B/sample input
read plus the 25/128-rate band write — nothing else.

The recurrence y[n] = p*y[n-1] + g*(x[n] - x[n-1]) is TPU-hostile only in
its per-sample form.  On 128-sample rows it is three MXU steps, all O(row)
work (same two-level decomposition as ops/iir.py, re-expressed as matmuls
so the whole thing lives in one kernel invocation):

  1. row-local zero-state response:  ylocal = x @ W1 - prev_col @ u0,
     where W1[m, j] = g*(p^(j-m) - p^(j-m-1)) folds the backward difference
     AND the p-power convolution into one [128, 128] constant; the boundary
     column prev_col[r] = x[r-1, 127] comes from a sublane row-shift of x
     (scratch-carried across tiles) hit with a one-hot selector matmul;
  2. row carries: carry[r] = sum_{r'<r} p^(128(r-1-r')) * yend[r'] + Y0*p^(128r)
     — one [tile, tile] lower-triangular constant matmul against the rows'
     local endpoints (Y0 = the DC carry into the tile, VMEM scratch across
     the sequential TPU grid);
  3. y = ylocal + carry @ pj  (a k=1 outer-product matmul).

Mosaic layout rules shape the implementation (learned the hard way — the
first version died in `tpu.concatenate` layout inference): vector-value
slices must keep lane offset 0 or a 128-multiple, so every "previous
sample" access is a FULL-ROW sublane shift (the proven pfb_demod carry
idiom) followed by a one-hot selector matmul, never a lane-127 column
slice; broadcasts of [tile,1]/[1,128] operands are written as k=1 matmuls.

The resampler math is identical to kernels/resample_kernel.py except the
window history convention: carried history is 384 = 3x128 DC-BLOCKED samples
(>= the true filter history of 345), so window rows align with the x-row
grid and the 3-row look-behind comes from VMEM scratch instead of host-side
look-ahead slices.  The polyphase kernel matrix is left-padded by
384 - 345 = 39 zero rows.

Three input layouts share the math:
  - apply_planes: xr/xi f32 planes (fed by ops/decode.py packed decodes);
  - apply_interleaved: the cf32 WIRE itself — interleaved (re, im) f32,
    byte-identical to a complex64 capture — de-interleaved inside the
    first matmul (W1 placed on even/odd rows of a [256, 128] constant), so
    the front end's only input traffic is the 8 B/sample wire read;
  - apply_packed ("cs16"): the SC16 WIRE bytes as f32 transport words (one
    complex sample per word, ops/decode.py convention) — bitcast + shift/
    mask decoded to planes INSIDE the kernel, cutting the input read to
    4 B/sample.  The decode is bit-exact vs ops/decode.py::decode_planes
    (16-bit ints are exact in f32 and 1/32768 is a power of two).
  - apply_packed2 ("cu8"/"cs8", wide=True): the rtl_tcp / HackRF wire — 4
    bytes = TWO complex samples per word — decoded in-kernel for a
    2 B/sample input read.  Two samples per word means one 128-word row
    carries 256 consecutive samples, so this variant runs the whole
    pipeline on 256-wide rows: width-256 DC-recurrence constants, a
    512-sample (2-row) resampler history, and per row TWO output frames
    (k2a/k2b matrices) re-interleaved to the standard [frames, 25] layout
    by one-hot row matmuls.  Byte placement (even/odd sample) is done
    with one-hot spreading matmuls, never lane slices (Mosaic layout
    rule).  Decode is bit-exact vs ops/decode.py (same f32 expressions).

Exactness: the same arithmetic fixed point as the sequential recurrence up
to f32 rounding (summation order differs from ops/iir.py's scan, so outputs
match the op chain to ~1e-6 relative, not bit-for-bit; test-enforced SNR
> 100 dB in tests/test_front_end.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.taps import design as D
from sdr_pmr446_tpu.kernels import precision
from sdr_pmr446_tpu.ops.resample import _kernel_matrix

L = C.RESAMP_L            # 25
M = C.RESAMP_M            # 128
HIST_ROWS = 3             # carried DC-blocked history rows (384 >= 345)
HIST = HIST_ROWS * M      # 384
W_PAD = (HIST_ROWS + 1) * M   # 512-wide window; true 468 window at rows 39+

_P = 1.0 - C.DC_BLOCK_ALPHA
_G = (1.0 + _P) / 2.0
_PJ_LAST = float(_P ** M)     # pj[M-1] = p^M: the row-end carry decay

# wide-row (cu8/cs8) geometry: one 128-word row = 256 samples = 2 frames
W2 = 2 * M                    # 256-wide sample rows
HIST_ROWS_W = 2               # carried history rows (512 >= 345)
HIST_W = HIST_ROWS_W * W2     # 512
W_PAD_W = (HIST_ROWS_W + 1) * W2  # 768-wide window
_PJ_LAST_W = float(_P ** W2)


@functools.lru_cache(maxsize=None)
def _row_consts() -> dict:
    """f32 constants shared by both bodies (keyed by name)."""
    j = np.arange(M, dtype=np.float64)
    # U[m, j] = p^(j-m) for j >= m (zero-state response of the pole)
    diff = j[None, :] - j[:, None]
    u = np.where(diff >= 0, _P ** np.maximum(diff, 0), 0.0)
    ushift = np.vstack([u[1:], np.zeros((1, M))])
    w1 = (_G * (u - ushift)).astype(np.float32)            # [M, M]
    u0 = (_G * u[0])[None, :].astype(np.float32)           # [1, M]
    pj = (_P ** (j + 1.0))[None, :].astype(np.float32)     # [1, M]
    k = _kernel_matrix(tuple(D.resampler_taps().tolist()), L, M)  # [25, 468]
    hist_len = len(D.resampler_taps()) // L - 1                   # 345
    left_pad = HIST - hist_len                                    # 39
    assert 0 <= left_pad and left_pad + k.shape[1] <= W_PAD
    k2 = np.zeros((W_PAD, L), dtype=np.float32)
    k2[left_pad:left_pad + k.shape[1], :] = k.T
    e_last = np.zeros((M, 1), dtype=np.float32)            # selects col M-1
    e_last[M - 1, 0] = 1.0
    # interleaved layout: W1 on even rows -> re plane, odd rows -> im plane
    wcat_r = np.zeros((2 * M, M), dtype=np.float32)
    wcat_i = np.zeros((2 * M, M), dtype=np.float32)
    wcat_r[0::2, :] = w1
    wcat_i[1::2, :] = w1
    ew_r = np.zeros((2 * M, 1), dtype=np.float32)          # selects re x[127]
    ew_i = np.zeros((2 * M, 1), dtype=np.float32)          # selects im x[127]
    ew_r[2 * M - 2, 0] = 1.0
    ew_i[2 * M - 1, 0] = 1.0
    return dict(w1=w1, u0=u0, pj=pj, k2=k2, e_last=e_last,
                wcat_r=wcat_r, wcat_i=wcat_i, ew_r=ew_r, ew_i=ew_i)


@functools.lru_cache(maxsize=None)
def _row_consts_wide() -> dict:
    """Width-256 (wide-row) f32 constants for the cu8/cs8 variant."""
    j = np.arange(W2, dtype=np.float64)
    diff = j[None, :] - j[:, None]
    u = np.where(diff >= 0, _P ** np.maximum(diff, 0), 0.0)
    ushift = np.vstack([u[1:], np.zeros((1, W2))])
    w1 = (_G * (u - ushift)).astype(np.float32)            # [W2, W2]
    u0 = (_G * u[0])[None, :].astype(np.float32)           # [1, W2]
    pj = (_P ** (j + 1.0))[None, :].astype(np.float32)     # [1, W2]
    k = _kernel_matrix(tuple(D.resampler_taps().tolist()), L, M)  # [25, 468]
    hist_len = len(D.resampler_taps()) // L - 1                   # 345
    left_pad = HIST_W - hist_len                                  # 167
    # frame A (even global frame, starts at the row's sample 0) and frame B
    # (odd, starts at sample 128): same 468-tap window, shifted by M
    k2a = np.zeros((W_PAD_W, L), dtype=np.float32)
    k2a[left_pad:left_pad + k.shape[1], :] = k.T
    k2b = np.zeros((W_PAD_W, L), dtype=np.float32)
    k2b[left_pad + M:left_pad + M + k.shape[1], :] = k.T
    assert left_pad + M + k.shape[1] <= W_PAD_W
    e_last = np.zeros((W2, 1), dtype=np.float32)
    e_last[W2 - 1, 0] = 1.0
    # byte-plane spreaders: word c's sample pair lands at lanes 2c / 2c+1
    g0 = np.zeros((M, W2), dtype=np.float32)
    g1 = np.zeros((M, W2), dtype=np.float32)
    g0[np.arange(M), 2 * np.arange(M)] = 1.0
    g1[np.arange(M), 2 * np.arange(M) + 1] = 1.0
    return dict(w1=w1, u0=u0, pj=pj, k2a=k2a, k2b=k2b, e_last=e_last,
                g0=g0, g1=g1)


@functools.lru_cache(maxsize=None)
def _tile_consts(tile: int, width: int = M) -> tuple[np.ndarray, np.ndarray]:
    """(Tt [tile,tile], pvec [tile,1]) f32: row-carry propagation for rows
    of ``width`` samples."""
    r = np.arange(tile, dtype=np.float64)
    diff = r[:, None] - 1.0 - r[None, :]     # Tt[r, r'] = p^(width(r-1-r'))
    tt = np.where(diff >= 0, _P ** (width * np.maximum(diff, 0.0)), 0.0)
    pvec = (_P ** (width * r))[:, None]
    return tt.astype(np.float32), pvec.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _interleave_consts(tile: int) -> tuple[np.ndarray, np.ndarray]:
    """(P0, P1) [2*tile, tile] one-hot row interleavers: out row 2r comes
    from frame-A row r, out row 2r+1 from frame-B row r."""
    p0 = np.zeros((2 * tile, tile), dtype=np.float32)
    p1 = np.zeros((2 * tile, tile), dtype=np.float32)
    p0[2 * np.arange(tile), np.arange(tile)] = 1.0
    p1[2 * np.arange(tile) + 1, np.arange(tile)] = 1.0
    return p0, p1


def pick_tile(rows: int, requested: int) -> int:
    """Largest divisor of ``rows`` that is <= requested and a multiple of 8.

    Row counts are K*784 = K*16*49, so a multiple-of-8 divisor always
    exists; uniform tiles keep the carried-state outputs exact (no padded
    rows ever reach the scratch carries).
    """
    best = 0
    for t in range(8, min(requested, rows) + 1, 8):
        if rows % t == 0:
            best = t
    if best == 0:
        raise ValueError(f"no multiple-of-8 tile divides {rows} rows")
    return best


def _dot(a, b):
    # HIGHEST: the backend's default contracts f32 in bf16 (see
    # kernels/precision.py — probed on hardware); every dot here is
    # value-bearing (recurrence carries, selector folds, FIR windows)
    return jnp.dot(a, b, precision=precision.get(),
                   preferred_element_type=jnp.float32)


def _plane_dc(ylocal, yprev_11, tt, pvec, pj_ref, e_last, pj_last):
    """Steps 2-3 (row carries) for one plane.

    Returns (y rows [tile, W], ylast column [tile, 1] = y[:, W-1])."""
    yend = _dot(ylocal, e_last)                           # [tile, 1]
    carry = _dot(tt, yend) + _dot(pvec, yprev_11)         # [tile, 1]
    y = ylocal + _dot(carry, pj_ref[:])
    return y, yend + carry * pj_last


def _plane_rest(ylocal, yprev_11, yh, win, y_out,
                tt, pvec, pj_ref, k2_ref, e_last):
    """Steps 2-3 + resampler matmul for one plane.

    Returns (y rows [tile, M], ylast column [tile, 1] = y[:, M-1])."""
    tile = y_out.shape[0]
    y, ylast = _plane_dc(ylocal, yprev_11, tt, pvec, pj_ref, e_last,
                         _PJ_LAST)
    # resampler windows: 3-row look-behind + this tile's rows (sublane
    # shifts of a row-aligned concat — the proven pfb_demod idiom)
    ycat = jnp.concatenate([yh[:, :], y], axis=0)         # [tile+3, 128]
    for i in range(HIST_ROWS + 1):
        win[:, i * M:(i + 1) * M] = ycat[i:i + tile, :]
    y_out[:, :] = _dot(win[:], k2_ref[:])
    return y, ylast


def _emit_group(y, yh, k2_ref, gw, win, bw_out, width, hist_rows):
    """Band emission in GROUP-major layout: y [tile, width] DC-blocked
    rows -> bw_out [tile*width//2048, 400] where
    bw_out[g, 25*rho + q] = band[2048*g_global + 25*rho + q].

    Identical arithmetic to the row emitter — each output is the same
    512-sample window hit with the same k2 column — but the windows are
    sliced straight out of the group-merged [G, 2048] view (a native
    sublane->lane reshape), so the band leaves the kernel in the layout
    the PFB group kernel consumes, eliminating the ~10 materialized XLA
    buffers of the old [rows,25]->flat->concat->frames relayout chain.
    rho < 3 windows straddle the previous group row; only the carried
    history's lanes of ``gw`` are ever read there, so gw needs no zeroing.
    """
    tile = y.shape[0]
    gl = 16 * M                                       # 2048 per group
    gt = tile * width // gl
    hist = hist_rows * width                          # carried samples
    ywide = y.reshape(gt, gl)
    gw[:, gl - hist:] = yh[:, :].reshape(1, hist)
    ycat = jnp.concatenate([gw[:, :], ywide], axis=0)     # [gt+1, 2048]
    for rho in range(16):
        # frame (g, rho)'s window = y[2048g + 128(rho-3) : 2048g+128(rho+1))
        if rho >= 3:
            w = ycat[1:, M * (rho - 3):M * (rho - 3) + W_PAD]
            v = _dot(w, k2_ref[:])
        else:
            cut = M * (3 - rho)          # lanes from the previous group row
            win[:, 0:cut] = ycat[:-1, gl - cut:]
            win[:, cut:W_PAD] = ycat[1:, 0:W_PAD - cut]
            v = _dot(win[:], k2_ref[:])
        bw_out[:, L * rho:L * (rho + 1)] = v


def _ylocal(x, xprev_rows, w1_ref, u0_ref, e_last):
    """Step 1 for one plane from full rows (no lane-offset slices)."""
    prev_col = _dot(xprev_rows, e_last)                   # x[r-1, M-1]
    return _dot(x, w1_ref[:]) - _dot(prev_col, u0_ref[:])


def _store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc,
                   ohr, ohi, ocy):
    """Final block state -> scratch (next grid step) + whole-block outputs."""
    tile = y_r.shape[0]
    yh_r[:, :] = y_r[tile - HIST_ROWS:, :]
    yh_i[:, :] = y_i[tile - HIST_ROWS:, :]
    ysc[0:1, 0:1] = yl_r[tile - 1:tile, :]
    ysc[1:2, 0:1] = yl_i[tile - 1:tile, :]
    ohr[:, :] = yh_r[:, :]
    ohi[:, :] = yh_i[:, :]
    ocy[:, :] = ysc[:, :]


def _body(xr_ref, xi_ref, hr_ref, hi_ref, cx_ref, cy_ref,
          w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref, el_ref,
          yr_out, yi_out, ohr, ohi, ocy,
          yh_r, yh_i, xrow, ysc, win_r, win_i):
    tile = yr_out.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xr = xr_ref[:]
    xi = xi_ref[:]
    # previous-sample rows: scratch row + sublane shift (per plane the
    # carried row lives in xrow rows 0/1)
    xprev_r = jnp.concatenate([xrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = _ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = _ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)

    y_r, yl_r = _plane_rest(yloc_r, ysc[0:1, 0:1], yh_r, win_r, yr_out,
                            tt, pvec, pj_ref, k2_ref, e_last)
    y_i, yl_i = _plane_rest(yloc_i, ysc[1:2, 0:1], yh_i, win_i, yi_out,
                            tt, pvec, pj_ref, k2_ref, e_last)

    xrow[0:1, :] = xr[tile - 1:tile, :]
    xrow[1:2, :] = xi[tile - 1:tile, :]
    _store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi, ocy)


def _body_g(xr_ref, xi_ref, hr_ref, hi_ref, cx_ref, cy_ref,
            w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref, el_ref,
            bwr_out, bwi_out, ohr, ohi, ocy,
            yh_r, yh_i, xrow, ysc, gw, win_g):
    """Planes body, GROUP-major band output (see _emit_group)."""
    tile = xr_ref.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xr = xr_ref[:]
    xi = xi_ref[:]
    xprev_r = jnp.concatenate([xrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = _ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = _ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)

    y_r, yl_r = _plane_dc(yloc_r, ysc[0:1, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST)
    y_i, yl_i = _plane_dc(yloc_i, ysc[1:2, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST)
    _emit_group(y_r, yh_r, k2_ref, gw, win_g, bwr_out, M, HIST_ROWS)
    _emit_group(y_i, yh_i, k2_ref, gw, win_g, bwi_out, M, HIST_ROWS)

    xrow[0:1, :] = xr[tile - 1:tile, :]
    xrow[1:2, :] = xi[tile - 1:tile, :]
    _store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi, ocy)


def _body_cs16_g(xw_ref, hr_ref, hi_ref, cx_ref, cy_ref,
                 w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref, el_ref,
                 bwr_out, bwi_out, ohr, ohi, ocy,
                 yh_r, yh_i, xrow, ysc, gw, win_g):
    """Packed-cs16 body, GROUP-major band output."""
    tile = xw_ref.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xr, xi = _decode_cs16(xw_ref[:])
    xprev_r = jnp.concatenate([xrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = _ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = _ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)

    y_r, yl_r = _plane_dc(yloc_r, ysc[0:1, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST)
    y_i, yl_i = _plane_dc(yloc_i, ysc[1:2, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST)
    _emit_group(y_r, yh_r, k2_ref, gw, win_g, bwr_out, M, HIST_ROWS)
    _emit_group(y_i, yh_i, k2_ref, gw, win_g, bwi_out, M, HIST_ROWS)

    xrow[0:1, :] = xr[tile - 1:tile, :]
    xrow[1:2, :] = xi[tile - 1:tile, :]
    _store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi, ocy)


def _body_ilv_g(xw_ref, hr_ref, hi_ref, cx_ref, cy_ref,
                wcr_ref, wci_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref,
                el_ref, ewr_ref, ewi_ref,
                bwr_out, bwi_out, ohr, ohi, ocy,
                yh_r, yh_i, xwrow, ysc, gw, win_g):
    """Interleaved-wire body, GROUP-major band output."""
    tile = xw_ref.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xwrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xw = xw_ref[:]
    xwprev = jnp.concatenate([xwrow[0:1, :], xw[:tile - 1, :]], axis=0)
    prev_r = _dot(xwprev, ewr_ref[:])
    prev_i = _dot(xwprev, ewi_ref[:])
    yloc_r = _dot(xw, wcr_ref[:]) - _dot(prev_r, u0_ref[:])
    yloc_i = _dot(xw, wci_ref[:]) - _dot(prev_i, u0_ref[:])

    y_r, yl_r = _plane_dc(yloc_r, ysc[0:1, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST)
    y_i, yl_i = _plane_dc(yloc_i, ysc[1:2, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST)
    _emit_group(y_r, yh_r, k2_ref, gw, win_g, bwr_out, M, HIST_ROWS)
    _emit_group(y_i, yh_i, k2_ref, gw, win_g, bwi_out, M, HIST_ROWS)

    xwrow[0:1, :] = xw[tile - 1:tile, :]
    _store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi, ocy)


def _body_pk2_g(xw_ref, hr_ref, hi_ref, cx_ref, cy_ref,
                w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref,
                k2_ref, el_ref, g0_ref, g1_ref,
                bwr_out, bwi_out, ohr, ohi, ocy,
                yh_r, yh_i, xrow, ysc, gw, win_g, *, signed):
    """Wide-row packed body (cu8/cs8), GROUP-major band output: the wide
    geometry's frame-A/B special-casing disappears — group windows are
    plain 512-sample y-space slices hit with the NARROW k2."""
    tile = xw_ref.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    b0, b1, b2, b3 = _decode_bytes(xw_ref[:], signed)
    g0 = g0_ref[:]
    g1 = g1_ref[:]
    xr = _dot(b0, g0) + _dot(b2, g1)                      # [tile, W2]
    xi = _dot(b1, g0) + _dot(b3, g1)
    xprev_r = jnp.concatenate([xrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = _ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = _ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)

    y_r, yl_r = _plane_dc(yloc_r, ysc[0:1, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST_W)
    y_i, yl_i = _plane_dc(yloc_i, ysc[1:2, 0:1], tt, pvec, pj_ref, e_last,
                          _PJ_LAST_W)
    _emit_group(y_r, yh_r, k2_ref, gw, win_g, bwr_out, W2, HIST_ROWS_W)
    _emit_group(y_i, yh_i, k2_ref, gw, win_g, bwi_out, W2, HIST_ROWS_W)

    xrow[0:1, :] = xr[tile - 1:tile, :]
    xrow[1:2, :] = xi[tile - 1:tile, :]
    yh_r[:, :] = y_r[tile - HIST_ROWS_W:, :]
    yh_i[:, :] = y_i[tile - HIST_ROWS_W:, :]
    ysc[0:1, 0:1] = yl_r[tile - 1:tile, :]
    ysc[1:2, 0:1] = yl_i[tile - 1:tile, :]
    ohr[:, :] = yh_r[:, :]
    ohi[:, :] = yh_i[:, :]
    ocy[:, :] = ysc[:, :]


def _body_pk2_g_cu8(*refs):
    return _body_pk2_g(*refs, signed=False)


def _body_pk2_g_cs8(*refs):
    return _body_pk2_g(*refs, signed=True)


def pick_tile_group(rows: int, requested: int, row_mult: int) -> int:
    """Largest divisor of ``rows`` that is <= requested and a multiple of
    ``row_mult`` (128 narrow / 64 wide: keeps the per-tile GROUP count a
    multiple of 8 so band output blocks [G_t, 400] tile legally).

    Rows are K*784 (narrow) / K*392 (wide), so such a divisor exists iff
    K % 8 == 0 — the chain checks group_geometry_ok() and falls back to
    the row path otherwise.
    """
    best = 0
    for t in range(row_mult, min(requested, rows) + 1, row_mult):
        if rows % t == 0:
            best = t
    if best == 0:
        raise ValueError(
            f"group-band geometry needs a multiple-of-{row_mult} tile "
            f"dividing {rows} rows (subchunks_per_step % 8 == 0)")
    return best


def _decode_cs16(w):
    """f32 transport words [tile, M] -> (xr, xi) planes, bit-exact vs
    ops/decode.py::decode_planes("cs16"): low halfword = I, high = Q,
    sign-extended and scaled by the exact power of two 1/32768."""
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    lo = jnp.bitwise_and(u, jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = jax.lax.shift_right_logical(u, jnp.uint32(16)).astype(jnp.int32)
    lo = jnp.bitwise_xor(lo, 0x8000) - 0x8000
    hi = jnp.bitwise_xor(hi, 0x8000) - 0x8000
    scale = jnp.float32(1.0 / 32768.0)
    return lo.astype(jnp.float32) * scale, hi.astype(jnp.float32) * scale


def _body_cs16(xw_ref, hr_ref, hi_ref, cx_ref, cy_ref,
               w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref, el_ref,
               yr_out, yi_out, ohr, ohi, ocy,
               yh_r, yh_i, xrow, ysc, win_r, win_i):
    """Packed-cs16 variant: xw is the SC16 wire as f32 transport words
    [tile, M] (one complex sample per word); the decode runs in VMEM so
    the front end's only input HBM traffic is the 4 B/sample word read.
    After the decode prologue this is _body verbatim (xrow scratch carries
    the DECODED last row's planes, exactly like apply_planes' cx rows)."""
    tile = yr_out.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xr, xi = _decode_cs16(xw_ref[:])
    xprev_r = jnp.concatenate([xrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = _ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = _ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)

    y_r, yl_r = _plane_rest(yloc_r, ysc[0:1, 0:1], yh_r, win_r, yr_out,
                            tt, pvec, pj_ref, k2_ref, e_last)
    y_i, yl_i = _plane_rest(yloc_i, ysc[1:2, 0:1], yh_i, win_i, yi_out,
                            tt, pvec, pj_ref, k2_ref, e_last)

    xrow[0:1, :] = xr[tile - 1:tile, :]
    xrow[1:2, :] = xi[tile - 1:tile, :]
    _store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi, ocy)


def _plane_rest_wide(ylocal, yprev_11, yh, win, y_out,
                     tt, pvec, pj_ref, k2a_ref, k2b_ref, e_last, p0, p1):
    """Wide-row steps 2-3 + TWO resampler frames per row for one plane.

    Writes [2*tile, L] standard frame-major output via one-hot row
    interleave matmuls; returns (y rows [tile, W2], ylast [tile, 1])."""
    tile = ylocal.shape[0]
    yend = _dot(ylocal, e_last)                           # [tile, 1]
    carry = _dot(tt, yend) + _dot(pvec, yprev_11)         # [tile, 1]
    y = ylocal + _dot(carry, pj_ref[:])
    ycat = jnp.concatenate([yh[:, :], y], axis=0)         # [tile+2, W2]
    for i in range(HIST_ROWS_W + 1):
        win[:, i * W2:(i + 1) * W2] = ycat[i:i + tile, :]
    ya = _dot(win[:], k2a_ref[:])                         # [tile, L]
    yb = _dot(win[:], k2b_ref[:])
    y_out[:, :] = _dot(p0, ya) + _dot(p1, yb)             # [2*tile, L]
    ylast = yend + carry * _PJ_LAST_W
    return y, ylast


def _decode_bytes(w, signed):
    """f32 transport words [tile, M] -> 4 byte planes as f32, matching
    ops/decode.py::decode_planes exactly: b0=i(2k), b1=q(2k), b2=i(2k+1),
    b3=q(2k+1); cs8 sign-extended + /128, cu8 (v-127.5)*(1/127.5)."""
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    b = [jnp.bitwise_and(jax.lax.shift_right_logical(u, jnp.uint32(8 * k)),
                         jnp.uint32(0xFF)).astype(jnp.int32)
         for k in range(4)]
    if signed:
        b = [jnp.bitwise_xor(v, 0x80) - 0x80 for v in b]
        return [v.astype(jnp.float32) * (1.0 / 128.0) for v in b]
    inv = np.float32(1.0 / 127.5)
    return [(v.astype(jnp.float32) - 127.5) * inv for v in b]


def _body_pk2(xw_ref, hr_ref, hi_ref, cx_ref, cy_ref,
              w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref,
              k2a_ref, k2b_ref, el_ref, g0_ref, g1_ref, p0_ref, p1_ref,
              yr_out, yi_out, ohr, ohi, ocy,
              yh_r, yh_i, xrow, ysc, win_r, win_i, *, signed):
    """Wide-row packed variant (cu8/cs8): xw [tile, M] f32 transport words,
    each holding TWO complex samples, decoded in VMEM and spread to
    256-wide plane rows by one-hot matmuls; the whole recurrence +
    resampler runs at width 256 with two output frames per row."""
    tile = xw_ref.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    p0 = p0_ref[:]
    p1 = p1_ref[:]
    b0, b1, b2, b3 = _decode_bytes(xw_ref[:], signed)
    g0 = g0_ref[:]
    g1 = g1_ref[:]
    xr = _dot(b0, g0) + _dot(b2, g1)                      # [tile, W2]
    xi = _dot(b1, g0) + _dot(b3, g1)
    xprev_r = jnp.concatenate([xrow[0:1, :], xr[:tile - 1, :]], axis=0)
    xprev_i = jnp.concatenate([xrow[1:2, :], xi[:tile - 1, :]], axis=0)
    yloc_r = _ylocal(xr, xprev_r, w1_ref, u0_ref, e_last)
    yloc_i = _ylocal(xi, xprev_i, w1_ref, u0_ref, e_last)

    y_r, yl_r = _plane_rest_wide(yloc_r, ysc[0:1, 0:1], yh_r, win_r, yr_out,
                                 tt, pvec, pj_ref, k2a_ref, k2b_ref,
                                 e_last, p0, p1)
    y_i, yl_i = _plane_rest_wide(yloc_i, ysc[1:2, 0:1], yh_i, win_i, yi_out,
                                 tt, pvec, pj_ref, k2a_ref, k2b_ref,
                                 e_last, p0, p1)

    xrow[0:1, :] = xr[tile - 1:tile, :]
    xrow[1:2, :] = xi[tile - 1:tile, :]
    yh_r[:, :] = y_r[tile - HIST_ROWS_W:, :]
    yh_i[:, :] = y_i[tile - HIST_ROWS_W:, :]
    ysc[0:1, 0:1] = yl_r[tile - 1:tile, :]
    ysc[1:2, 0:1] = yl_i[tile - 1:tile, :]
    ohr[:, :] = yh_r[:, :]
    ohi[:, :] = yh_i[:, :]
    ocy[:, :] = ysc[:, :]


def _body_pk2_cu8(*refs):
    return _body_pk2(*refs, signed=False)


def _body_pk2_cs8(*refs):
    return _body_pk2(*refs, signed=True)


def _body_ilv(xw_ref, hr_ref, hi_ref, cx_ref, cy_ref,
              wcr_ref, wci_ref, u0_ref, pj_ref, tt_ref, pvec_ref, k2_ref,
              el_ref, ewr_ref, ewi_ref,
              yr_out, yi_out, ohr, ohi, ocy,
              yh_r, yh_i, xwrow, ysc, win_r, win_i):
    """Interleaved-input variant: xw is the cf32 wire block as f32 rows of
    (re, im) pairs [tile, 2M]; the de-interleave rides the first matmuls
    (wcat_r/wcat_i place W1 on even/odd rows), so no plane split ever
    reaches HBM."""
    tile = yr_out.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        xwrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]

    tt = tt_ref[:]
    pvec = pvec_ref[:]
    e_last = el_ref[:]
    xw = xw_ref[:]
    xwprev = jnp.concatenate([xwrow[0:1, :], xw[:tile - 1, :]], axis=0)
    prev_r = _dot(xwprev, ewr_ref[:])                     # x[r-1,127] re
    prev_i = _dot(xwprev, ewi_ref[:])
    yloc_r = _dot(xw, wcr_ref[:]) - _dot(prev_r, u0_ref[:])
    yloc_i = _dot(xw, wci_ref[:]) - _dot(prev_i, u0_ref[:])

    y_r, yl_r = _plane_rest(yloc_r, ysc[0:1, 0:1], yh_r, win_r, yr_out,
                            tt, pvec, pj_ref, k2_ref, e_last)
    y_i, yl_i = _plane_rest(yloc_i, ysc[1:2, 0:1], yh_i, win_i, yi_out,
                            tt, pvec, pj_ref, k2_ref, e_last)

    xwrow[0:1, :] = xw[tile - 1:tile, :]
    _store_carries(y_r, y_i, yl_r, yl_i, yh_r, yh_i, ysc, ohr, ohi, ocy)


class PallasFrontEnd:
    """Fused replacement for (ops/iir DC blocker -> resampler kernel).

    Carried state: the DC blocker's (x[-1], y[-1]) complex scalars plus 384
    DC-BLOCKED samples of resampler history (y-space, vs the unfused 309) —
    init via ``init_state()``; shapes are compatible with ScannerState's
    (dc_x, dc_y, resamp_hist) slots.

    ``wide=True`` selects the 256-wide-row geometry used by apply_packed2
    (cu8/cs8, two samples per transport word); its carried history is 512
    samples (2 x 256 rows) instead of 384.
    """

    def __init__(self, tile_rows: int = 448, interpret: bool = False,
                 wide: bool = False):
        self.tile_rows = tile_rows
        self.interpret = interpret
        self.wide = wide
        self.hist_len = HIST_W if wide else HIST
        self.consts = _row_consts_wide() if wide else _row_consts()

    def init_state(self):
        # distinct arrays: donated jit args must not alias (f(donate(a),
        # donate(a)) is rejected by the runtime)
        return (jnp.zeros((), jnp.complex64), jnp.zeros((), jnp.complex64),
                jnp.zeros((self.hist_len,), jnp.complex64))

    def apply(self, dc_x: jax.Array, dc_y: jax.Array, hist: jax.Array,
              x: jax.Array):
        """Complex convenience wrapper: x [T] c64 -> band [T*25/128] c64."""
        ndx, ndy, nh, yr, yi = self.apply_iq(dc_x, dc_y, hist, x)
        band = jax.lax.complex(yr, yi).reshape(-1)
        return ndx, ndy, nh, band

    def apply_iq(self, dc_x: jax.Array, dc_y: jax.Array,
                 hist: jax.Array, iq: jax.Array, group_out: bool = False):
        """Complex input via the interleaved kernel: iq [T] c64 is
        interleaved to wire layout in XLA (one fused pass — XLA has no
        complex->f32 bitcast), then consumed by apply_interleaved.  Feed
        the capture's wire bytes directly (input_format "cf32w") to skip
        even that pass."""
        xw = jnp.stack([jnp.real(iq), jnp.imag(iq)], axis=-1).reshape(-1)
        return self.apply_interleaved(dc_x, dc_y, hist,
                                      xw.astype(jnp.float32),
                                      group_out=group_out)

    def _hist_planes(self, hist):
        rows, width = ((HIST_ROWS_W, W2) if self.wide else (HIST_ROWS, M))
        hr = jnp.real(hist).astype(jnp.float32).reshape(rows, width)
        hi = jnp.imag(hist).astype(jnp.float32).reshape(rows, width)
        return hr, hi

    @staticmethod
    def _cy_rows(dc_y):
        """[2, M] whose lane-0 entries are (re, im) of the y[-1] carry."""
        col = jnp.stack([jnp.real(dc_y),
                         jnp.imag(dc_y)]).astype(jnp.float32)[:, None]
        return col * np.eye(1, M, dtype=np.float32)       # zeros past lane 0

    def _call(self, body, x_rows: tuple, x_width: int, rows: int,
              hr, hi, cx_row, cy, wconsts: tuple):
        """Shared pallas_call plumbing for both input layouts."""
        cn = self.consts
        tile = pick_tile(rows, self.tile_rows)
        n_tiles = rows // tile
        tt, pvec = _tile_consts(tile)

        grid_block = lambda shape: pl.BlockSpec(
            shape, lambda s: (s, 0), memory_space=pltpu.VMEM)
        whole = lambda shape: pl.BlockSpec(
            shape, lambda s: (0, 0), memory_space=pltpu.VMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        yr_o, yi_o, ohr, ohi, ocy = pl.pallas_call(
            body,
            grid=(n_tiles,),
            in_specs=[grid_block((tile, x_width))] * len(x_rows) + [
                whole((HIST_ROWS, M)),            # hist re
                whole((HIST_ROWS, M)),            # hist im
                whole((cx_row.shape[0], x_width)),  # x[-1] carry row(s)
                whole((2, M)),                    # y[-1] carry rows
            ] + [vmem() for _ in wconsts] + [
                vmem(),                           # u0
                vmem(),                           # pj
                vmem(),                           # tt
                vmem(),                           # pvec
                vmem(),                           # k2
                vmem(),                           # e_last
            ] + ([vmem(), vmem()] if body is _body_ilv else []),
            out_specs=[
                grid_block((tile, L)),
                grid_block((tile, L)),
                whole((HIST_ROWS, M)),
                whole((HIST_ROWS, M)),
                whole((2, M)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, L), jnp.float32),
                jax.ShapeDtypeStruct((rows, L), jnp.float32),
                jax.ShapeDtypeStruct((HIST_ROWS, M), jnp.float32),
                jax.ShapeDtypeStruct((HIST_ROWS, M), jnp.float32),
                jax.ShapeDtypeStruct((2, M), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((HIST_ROWS, M), jnp.float32),
                pltpu.VMEM((HIST_ROWS, M), jnp.float32),
                pltpu.VMEM((cx_row.shape[0], x_width), jnp.float32),
                pltpu.VMEM((2, M), jnp.float32),
                pltpu.VMEM((tile, W_PAD), jnp.float32),
                pltpu.VMEM((tile, W_PAD), jnp.float32),
            ],
            interpret=self.interpret,
        )(*x_rows, hr, hi, cx_row, cy,
          *(jnp.asarray(w) for w in wconsts),
          jnp.asarray(cn["u0"]), jnp.asarray(cn["pj"]),
          jnp.asarray(tt), jnp.asarray(pvec), jnp.asarray(cn["k2"]),
          jnp.asarray(cn["e_last"]),
          *([jnp.asarray(cn["ew_r"]), jnp.asarray(cn["ew_i"])]
            if body is _body_ilv else []))

        new_dc_y = jax.lax.complex(ocy[0, 0], ocy[1, 0])
        new_hist = jax.lax.complex(ohr.reshape(-1), ohi.reshape(-1))
        return new_dc_y, new_hist, yr_o, yi_o

    def _call_group(self, body, x_rows: tuple, x_width: int, rows: int,
                    hr, hi, cx_row, cy, wconsts: tuple):
        """pallas_call plumbing for the GROUP-major band bodies: outputs
        are bw_r/bw_i [G_total, 400] (bw[g, 25*rho+q] = band[2048g+25rho+q])
        instead of [rows, 25] row-major planes — the exact layout the PFB
        group kernel consumes, so no XLA relayout ever touches the band."""
        cn = self.consts
        row_mult = 64 if self.wide else 128
        width = W2 if self.wide else M
        tile = pick_tile_group(rows, self.tile_rows, row_mult)
        n_tiles = rows // tile
        gt = tile * width // (16 * M)
        g_total = rows * width // (16 * M)
        tt, pvec = _tile_consts(tile, width)
        hist_rows, hist_w = ((HIST_ROWS_W, W2) if self.wide
                             else (HIST_ROWS, M))
        k2 = _row_consts()["k2"]              # narrow k2 works both widths

        grid_block = lambda shape: pl.BlockSpec(
            shape, lambda s: (s, 0), memory_space=pltpu.VMEM)
        whole = lambda shape: pl.BlockSpec(
            shape, lambda s: (0, 0), memory_space=pltpu.VMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        ilv = body is _body_ilv_g
        pk2 = body in (_body_pk2_g_cu8, _body_pk2_g_cs8)
        tail = ([vmem(), vmem()] if ilv else [])          # ew_r, ew_i
        gcons = ([vmem(), vmem()] if pk2 else [])         # g0, g1

        bwr, bwi, ohr, ohi, ocy = pl.pallas_call(
            body,
            grid=(n_tiles,),
            in_specs=[grid_block((tile, x_width))] * len(x_rows) + [
                whole((hist_rows, width)),        # hist re
                whole((hist_rows, width)),        # hist im
                whole(cx_row.shape),              # decoded x[-1] carry rows
                whole((2, M)),
            ] + [vmem() for _ in wconsts] + [
                vmem(),                           # u0
                vmem(),                           # pj
                vmem(),                           # tt
                vmem(),                           # pvec
                vmem(),                           # k2 (narrow)
                vmem(),                           # e_last
            ] + gcons + tail,
            out_specs=[
                grid_block((gt, 16 * L)),
                grid_block((gt, 16 * L)),
                whole((hist_rows, width)),
                whole((hist_rows, width)),
                whole((2, M)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g_total, 16 * L), jnp.float32),
                jax.ShapeDtypeStruct((g_total, 16 * L), jnp.float32),
                jax.ShapeDtypeStruct((hist_rows, width), jnp.float32),
                jax.ShapeDtypeStruct((hist_rows, width), jnp.float32),
                jax.ShapeDtypeStruct((2, M), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((hist_rows, width), jnp.float32),
                pltpu.VMEM((hist_rows, width), jnp.float32),
                pltpu.VMEM(cx_row.shape, jnp.float32),
                pltpu.VMEM((2, M), jnp.float32),
                pltpu.VMEM((1, 16 * M), jnp.float32),     # prev group row
                pltpu.VMEM((gt, W_PAD), jnp.float32),     # rho<3 windows
            ],
            interpret=self.interpret,
        )(*x_rows, hr, hi, cx_row, cy,
          *(jnp.asarray(w) for w in wconsts),
          jnp.asarray(cn["u0"]), jnp.asarray(cn["pj"]),
          jnp.asarray(tt), jnp.asarray(pvec), jnp.asarray(k2),
          jnp.asarray(cn["e_last"]),
          *([jnp.asarray(cn["g0"]), jnp.asarray(cn["g1"])] if pk2 else []),
          *([jnp.asarray(cn["ew_r"]), jnp.asarray(cn["ew_i"])]
            if ilv else []))

        new_dc_y = jax.lax.complex(ocy[0, 0], ocy[1, 0])
        new_hist = jax.lax.complex(ohr.reshape(-1), ohi.reshape(-1))
        return new_dc_y, new_hist, bwr, bwi

    def apply_interleaved(self, dc_x: jax.Array, dc_y: jax.Array,
                          hist: jax.Array, xw: jax.Array,
                          group_out: bool = False):
        """xw [2T] f32 (or pre-shaped [T//128, 256] rows — pass THAT from
        drivers: a 1-D jit argument forces XLA to relayout the whole block
        into the kernel's (8,128)-tiled 2-D form, a full extra HBM pass
        measured at 8 B/sample), the cf32 WIRE layout (re,im interleaved —
        exactly the bytes of a complex64 capture), T % 128 == 0, consumed
        IN PLACE: rows of (re,im) pairs are de-interleaved inside the
        kernel's first matmul, so the front end's only HBM traffic is the
        8 B/sample input read plus the 25/128-rate band write — no plane
        split, no DC-blocked round trip.

        Returns (dc_x', dc_y', hist', yr [T//128, 25], yi [T//128, 25]).
        """
        assert not self.wide, "apply_interleaved uses the narrow geometry"
        if xw.ndim == 2:
            assert xw.shape[-1] == 2 * M, xw.shape
            xw_rows = xw
            rows = xw.shape[0]
        else:
            t2 = xw.shape[-1]
            assert t2 % (2 * M) == 0, t2
            rows = t2 // (2 * M)
            xw_rows = xw.reshape(rows, 2 * M)
        hr, hi = self._hist_planes(hist)
        # x[-1] carry row: (re, im) of dc_x at the last two lanes, where the
        # ew selectors look after the sublane row-shift
        cx = jnp.stack([jnp.real(dc_x), jnp.imag(dc_x)]).astype(jnp.float32)
        sel = np.zeros((2, 2 * M), dtype=np.float32)
        sel[0, 2 * M - 2] = 1.0
        sel[1, 2 * M - 1] = 1.0
        cx_row = (cx[:, None] * sel).sum(axis=0, keepdims=True)   # [1, 2M]
        call = self._call_group if group_out else self._call
        body = _body_ilv_g if group_out else _body_ilv
        ndy, nh, yr, yi = call(
            body, (xw_rows,), 2 * M, rows, hr, hi, cx_row,
            self._cy_rows(dc_y),
            (self.consts["wcat_r"], self.consts["wcat_i"]))
        # the new x[-1] is simply the block's last input sample
        new_dc_x = jax.lax.complex(xw_rows[rows - 1, 2 * M - 2],
                                   xw_rows[rows - 1, 2 * M - 1])
        return new_dc_x, ndy, nh, yr, yi

    def apply_packed(self, dc_x: jax.Array, dc_y: jax.Array,
                     hist: jax.Array, w: jax.Array, fmt: str = "cs16",
                     group_out: bool = False):
        """w [T] f32 transport words of the SC16 wire (ops/decode.py
        packing: one complex sample per word), T % 128 == 0, decoded to
        planes INSIDE the kernel — input HBM traffic is the 4 B/sample
        word read.  Bit-exact vs decode_planes + apply_planes
        (test-enforced).

        Returns (dc_x', dc_y', hist', yr [T//128, 25], yi [T//128, 25]).
        """
        if fmt != "cs16":
            raise ValueError(f"apply_packed supports cs16 only, got "
                             f"{fmt!r} (cu8/cs8 -> apply_packed2)")
        assert not self.wide, "cs16 uses the narrow-row geometry"
        if w.ndim == 2:
            assert w.shape[-1] == M, w.shape
            w_rows = w
            rows = w.shape[0]
        else:
            t = w.shape[-1]
            assert t % M == 0, t
            rows = t // M
            w_rows = w.reshape(rows, M)
        hr, hi = self._hist_planes(hist)
        # x[-1] carry rows: the DECODED planes convention of apply_planes
        cx = jnp.stack([jnp.real(dc_x), jnp.imag(dc_x)]).astype(jnp.float32)
        sel = np.zeros((1, M), dtype=np.float32)
        sel[0, M - 1] = 1.0
        cx_rows = cx[:, None] * sel                               # [2, M]
        call = self._call_group if group_out else self._call
        body = _body_cs16_g if group_out else _body_cs16
        ndy, nh, yr, yi = call(
            body, (w_rows,), M, rows, hr, hi, cx_rows,
            self._cy_rows(dc_y), (self.consts["w1"],))
        # new x[-1]: decode the block's last word (scalar XLA epilogue)
        from sdr_pmr446_tpu.ops.decode import decode_planes
        xr_l, xi_l = decode_planes(w_rows[rows - 1, M - 1:M], "cs16")
        new_dc_x = jax.lax.complex(xr_l[0], xi_l[0])
        return new_dc_x, ndy, nh, yr, yi

    def apply_packed2(self, dc_x: jax.Array, dc_y: jax.Array,
                      hist: jax.Array, w: jax.Array, fmt: str = "cu8",
                      group_out: bool = False):
        """w [T/2] f32 transport words of the rtl_tcp (cu8) / HackRF (cs8)
        wire (ops/decode.py packing: TWO complex samples per word),
        decoded to planes INSIDE the wide-row kernel — input HBM traffic
        is the 2 B/sample word read.  Requires wide=True (512-sample
        carried history).  Bit-exact vs decode_planes (test-enforced).

        Returns (dc_x', dc_y', hist', yr [T//128, 25], yi [T//128, 25]).
        """
        if fmt not in ("cu8", "cs8"):
            raise ValueError(f"apply_packed2 supports cu8/cs8, got {fmt!r}")
        assert self.wide, "cu8/cs8 need the wide-row geometry (wide=True)"
        if w.ndim == 2:
            assert w.shape[-1] == M, w.shape
            w_rows = w
            rows_w = w.shape[0]          # wide rows (256 samples each)
        else:
            nw = w.shape[-1]
            assert nw % M == 0, nw
            rows_w = nw // M
            w_rows = w.reshape(rows_w, M)
        hr, hi = self._hist_planes(hist)
        cx = jnp.stack([jnp.real(dc_x), jnp.imag(dc_x)]).astype(jnp.float32)
        sel = np.zeros((1, W2), dtype=np.float32)
        sel[0, W2 - 1] = 1.0
        cx_rows = cx[:, None] * sel                               # [2, W2]
        if group_out:
            body = _body_pk2_g_cs8 if fmt == "cs8" else _body_pk2_g_cu8
            ndy, nh, yr, yi = self._call_group(
                body, (w_rows,), M, rows_w, hr, hi, cx_rows,
                self._cy_rows(dc_y), (self.consts["w1"],))
        else:
            body = _body_pk2_cs8 if fmt == "cs8" else _body_pk2_cu8
            ndy, nh, yr, yi = self._call_wide(body, w_rows, rows_w, hr, hi,
                                              cx_rows, self._cy_rows(dc_y))
        # new x[-1]: the last word's SECOND sample (scalar XLA epilogue)
        from sdr_pmr446_tpu.ops.decode import decode_planes
        xr_l, xi_l = decode_planes(w_rows[rows_w - 1, M - 1:M], fmt)
        new_dc_x = jax.lax.complex(xr_l[1], xi_l[1])
        return new_dc_x, ndy, nh, yr, yi

    def _call_wide(self, body, w_rows, rows_w: int, hr, hi, cx_row, cy):
        """pallas_call plumbing for the wide-row packed bodies."""
        cn = self.consts
        # same samples per tile as the narrow default (tile_rows is in
        # 128-sample rows)
        tile = pick_tile(rows_w, max(8, self.tile_rows // 2))
        n_tiles = rows_w // tile
        tt, pvec = _tile_consts(tile, W2)
        p0, p1 = _interleave_consts(tile)

        grid_block = lambda shape: pl.BlockSpec(
            shape, lambda s: (s, 0), memory_space=pltpu.VMEM)
        whole = lambda shape: pl.BlockSpec(
            shape, lambda s: (0, 0), memory_space=pltpu.VMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        yr_o, yi_o, ohr, ohi, ocy = pl.pallas_call(
            body,
            grid=(n_tiles,),
            in_specs=[grid_block((tile, M))] + [
                whole((HIST_ROWS_W, W2)),         # hist re
                whole((HIST_ROWS_W, W2)),         # hist im
                whole((2, W2)),                   # x[-1] carry rows
                whole((2, M)),                    # y[-1] carry rows
            ] + [vmem() for _ in range(12)],      # w1..p1 constants
            out_specs=[
                grid_block((2 * tile, L)),
                grid_block((2 * tile, L)),
                whole((HIST_ROWS_W, W2)),
                whole((HIST_ROWS_W, W2)),
                whole((2, M)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2 * rows_w, L), jnp.float32),
                jax.ShapeDtypeStruct((2 * rows_w, L), jnp.float32),
                jax.ShapeDtypeStruct((HIST_ROWS_W, W2), jnp.float32),
                jax.ShapeDtypeStruct((HIST_ROWS_W, W2), jnp.float32),
                jax.ShapeDtypeStruct((2, M), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((HIST_ROWS_W, W2), jnp.float32),
                pltpu.VMEM((HIST_ROWS_W, W2), jnp.float32),
                pltpu.VMEM((2, W2), jnp.float32),
                pltpu.VMEM((2, M), jnp.float32),
                pltpu.VMEM((tile, W_PAD_W), jnp.float32),
                pltpu.VMEM((tile, W_PAD_W), jnp.float32),
            ],
            interpret=self.interpret,
        )(w_rows, hr, hi, cx_row, cy,
          jnp.asarray(cn["w1"]), jnp.asarray(cn["u0"]),
          jnp.asarray(cn["pj"]), jnp.asarray(tt), jnp.asarray(pvec),
          jnp.asarray(cn["k2a"]), jnp.asarray(cn["k2b"]),
          jnp.asarray(cn["e_last"]), jnp.asarray(cn["g0"]),
          jnp.asarray(cn["g1"]), jnp.asarray(p0), jnp.asarray(p1))

        new_dc_y = jax.lax.complex(ocy[0, 0], ocy[1, 0])
        new_hist = jax.lax.complex(ohr.reshape(-1), ohi.reshape(-1))
        return new_dc_y, new_hist, yr_o, yi_o

    def apply_planes(self, dc_x: jax.Array, dc_y: jax.Array,
                     hist: jax.Array, xr: jax.Array, xi: jax.Array,
                     group_out: bool = False):
        """dc_x/dc_y c64 scalars, hist [384] c64 (DC-blocked y-space),
        xr/xi [T] f32 with T % 128 == 0.

        Returns (dc_x', dc_y', hist', yr [T//128, 25], yi [T//128, 25]).
        """
        assert not self.wide, "apply_planes uses the narrow-row geometry"
        if xr.ndim == 2:
            assert xr.shape[-1] == M and xi.shape == xr.shape
            xr_rows, xi_rows = xr, xi
            rows = xr.shape[0]
        else:
            t = xr.shape[-1]
            assert t % M == 0, t
            rows = t // M
            xr_rows = xr.reshape(rows, M)
            xi_rows = xi.reshape(rows, M)
        hr, hi = self._hist_planes(hist)
        # x[-1] carry rows (re, im): value at lane M-1, where e_last looks
        cx = jnp.stack([jnp.real(dc_x), jnp.imag(dc_x)]).astype(jnp.float32)
        sel = np.zeros((1, M), dtype=np.float32)
        sel[0, M - 1] = 1.0
        cx_rows = cx[:, None] * sel                               # [2, M]
        call = self._call_group if group_out else self._call
        body = _body_g if group_out else _body
        ndy, nh, yr, yi = call(
            body, (xr_rows, xi_rows), M, rows, hr, hi, cx_rows,
            self._cy_rows(dc_y), (self.consts["w1"],))
        new_dc_x = jax.lax.complex(xr_rows[rows - 1, M - 1],
                                   xi_rows[rows - 1, M - 1])
        return new_dc_x, ndy, nh, yr, yi


def reference_impl(dc_x, dc_y, hist, x):
    """Pure-JAX semantics: ops/iir DC blocker -> ops/resample PolyResampler.

    hist is the fused y-space history (384 narrow / 512 wide); the unfused
    resampler needs only its last 309 samples.
    """
    from sdr_pmr446_tpu.ops import iir
    from sdr_pmr446_tpu.ops.resample import PolyResampler
    (ndx, ndy), y = iir.dc_blocker_apply((dc_x, dc_y), x, C.DC_BLOCK_ALPHA)
    res = PolyResampler(D.resampler_taps(), L, M)
    hlen = hist.shape[-1]
    _, band = res.apply(hist[hlen - res.hist_len:], y)
    new_hist = jnp.concatenate([hist, y])[-hlen:]
    return ndx, ndy, new_hist, band
