"""Pallas TPU kernel: fused IQ DC blocker + 25/128 polyphase resampler.

NEXT.md round-2 item #0 — the largest remaining HBM saving in the scanner
front end.  Unfused, the chain moves ~24 B per input sample before the band
even exists: the one-pole DC blocker (reference: src/sdr_pmr446.c:422,795)
reads the input planes and writes the blocked planes (16 B), which the
resampler kernel then reads back (8 B).  Here the recurrence runs INSIDE the
resampler kernel, so the front end's HBM traffic is the 8 B/sample input
read plus the 25/128-rate band write — nothing else.

The recurrence y[n] = p*y[n-1] + g*(x[n] - x[n-1]) is TPU-hostile only in
its per-sample form.  On 128-sample rows it is three MXU/VPU steps, all
O(row) work (same two-level decomposition as ops/iir.py, re-expressed as
matmuls so the whole thing lives in one kernel invocation):

  1. row-local zero-state response:  ylocal = x @ W1 - x_last_prev * u0,
     where W1[m, j] = g*(p^(j-m) - p^(j-m-1)) folds the backward difference
     AND the p-power convolution into one [128, 128] constant (the boundary
     term u0 = g*p^(0..127) carries each row's x[-1] from the previous row);
  2. row carries: carry[r] = sum_{r'<r} p^(128(r-1-r')) * yend[r'] + Y0*p^(128r)
     — one [tile, tile] lower-triangular constant matmul against the rows'
     local endpoints (Y0 = the DC carry into the tile, held in VMEM scratch
     across the sequential TPU grid);
  3. y = ylocal + carry * p^(j+1)  (one broadcast multiply-add).

The resampler math is identical to kernels/resample_kernel.py except the
window history convention: carried history is 384 = 3x128 DC-BLOCKED samples
(>= the true filter history of 345), so window rows align with the x-row
grid and the 3-row look-behind comes from VMEM scratch instead of host-side
look-ahead slices.  The polyphase kernel matrix is left-padded by
384 - 345 = 39 zero rows.

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
from sdr_pmr446_tpu.ops.resample import _kernel_matrix

L = C.RESAMP_L            # 25
M = C.RESAMP_M            # 128
HIST_ROWS = 3             # carried DC-blocked history rows (384 >= 345)
HIST = HIST_ROWS * M      # 384
W_PAD = (HIST_ROWS + 1) * M   # 512-wide window; true 468 window at rows 39+

_P = 1.0 - C.DC_BLOCK_ALPHA
_G = (1.0 + _P) / 2.0


@functools.lru_cache(maxsize=None)
def _row_consts() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(W1 [128,128], u0+pj rows [2,128], K2 [512,25]) f32 constants."""
    j = np.arange(M, dtype=np.float64)
    # U[m, j] = p^(j-m) for j >= m (zero-state response of the pole)
    diff = j[None, :] - j[:, None]
    u = np.where(diff >= 0, _P ** np.maximum(diff, 0), 0.0)
    ushift = np.vstack([u[1:], np.zeros((1, M))])
    w1 = _G * (u - ushift)
    u0 = _G * u[0]                        # boundary term row
    pj = _P ** (j + 1.0)                  # carry decay row
    k = _kernel_matrix(tuple(D.resampler_taps().tolist()), L, M)  # [25, 468]
    hist_len = len(D.resampler_taps()) // L - 1                   # 345
    left_pad = HIST - hist_len                                    # 39
    assert 0 <= left_pad and left_pad + k.shape[1] <= W_PAD
    k2 = np.zeros((W_PAD, L), dtype=np.float64)
    k2[left_pad:left_pad + k.shape[1], :] = k.T
    return (w1.astype(np.float32),
            np.stack([u0, pj]).astype(np.float32),
            k2.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _tile_consts(tile: int) -> tuple[np.ndarray, np.ndarray]:
    """(Tt [tile,tile], pvec [tile,1]) f32: row-carry propagation."""
    r = np.arange(tile, dtype=np.float64)
    diff = r[:, None] - 1.0 - r[None, :]       # Tt[r, r'] = p^(128(r-1-r'))
    tt = np.where(diff >= 0, _P ** (M * np.maximum(diff, 0.0)), 0.0)
    pvec = (_P ** (M * r))[:, None]
    return tt.astype(np.float32), pvec.astype(np.float32)


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


def _body(xr_ref, xi_ref, hr_ref, hi_ref, scal_ref,
          w1_ref, rows_ref, tt_ref, pvec_ref, k2_ref,
          yr_out, yi_out, ohr, ohi, oscal,
          yh_r, yh_i, sc, win_r, win_i):
    tile = yr_out.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        yh_r[:, :] = hr_ref[:, :]
        yh_i[:, :] = hi_ref[:, :]
        sc[:, :] = scal_ref[:, :]

    u0 = rows_ref[0:1, :]
    pj = rows_ref[1:2, :]
    w1 = w1_ref[:]
    tt = tt_ref[:]
    pvec = pvec_ref[:]

    def plane(x_ref, xprev_11, yprev_11, yh, win, y_out):
        x = x_ref[:]
        # x[-1] per row: previous row's last sample (cross-tile from scratch)
        prev_last = jnp.concatenate(
            [xprev_11, x[:tile - 1, M - 1:M]], axis=0)       # [tile, 1]
        ylocal = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
                  - prev_last * u0)
        yend = ylocal[:, M - 1:M]                             # [tile, 1]
        carry = (jnp.dot(tt, yend, preferred_element_type=jnp.float32)
                 + yprev_11 * pvec)                           # [tile, 1]
        y = ylocal + carry * pj
        # resampler windows: 3-row look-behind + this tile's rows
        ycat = jnp.concatenate([yh[:, :], y], axis=0)         # [tile+3, 128]
        for i in range(HIST_ROWS + 1):
            win[:, i * M:(i + 1) * M] = ycat[i:i + tile, :]
        y_out[:, :] = jnp.dot(win[:], k2_ref[:],
                              preferred_element_type=jnp.float32)
        return x, y

    xr, y_r = plane(xr_ref, sc[0:1, 0:1], sc[2:3, 0:1], yh_r, win_r, yr_out)
    xi, y_i = plane(xi_ref, sc[1:2, 0:1], sc[3:4, 0:1], yh_i, win_i, yi_out)

    # carries into the next (sequential) grid step = the final block state
    yh_r[:, :] = y_r[tile - HIST_ROWS:, :]
    yh_i[:, :] = y_i[tile - HIST_ROWS:, :]
    sc[0:1, 0:1] = xr[tile - 1:tile, M - 1:M]
    sc[1:2, 0:1] = xi[tile - 1:tile, M - 1:M]
    sc[2:3, 0:1] = y_r[tile - 1:tile, M - 1:M]
    sc[3:4, 0:1] = y_i[tile - 1:tile, M - 1:M]
    ohr[:, :] = yh_r[:, :]
    ohi[:, :] = yh_i[:, :]
    oscal[:, :] = sc[:, :]


class PallasFrontEnd:
    """Fused replacement for (ops/iir DC blocker -> resampler kernel).

    Carried state: the DC blocker's (x[-1], y[-1]) complex scalars plus 384
    DC-BLOCKED samples of resampler history (y-space, vs the unfused 309) —
    init via ``init_state()``; shapes are compatible with ScannerState's
    (dc_x, dc_y, resamp_hist) slots.
    """

    hist_len = HIST

    def __init__(self, tile_rows: int = 448, interpret: bool = False):
        self.tile_rows = tile_rows
        self.interpret = interpret
        self.w1, self.rows2, self.k2 = _row_consts()

    def init_state(self):
        z = jnp.zeros((), jnp.complex64)
        return z, z, jnp.zeros((HIST,), jnp.complex64)

    def apply(self, dc_x: jax.Array, dc_y: jax.Array, hist: jax.Array,
              x: jax.Array):
        """Complex convenience wrapper: x [T] c64 -> band [T*25/128] c64."""
        ndx, ndy, nh, yr, yi = self.apply_planes(
            dc_x, dc_y, hist,
            jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))
        band = jax.lax.complex(yr, yi).reshape(-1)
        return ndx, ndy, nh, band

    def apply_planes(self, dc_x: jax.Array, dc_y: jax.Array,
                     hist: jax.Array, xr: jax.Array, xi: jax.Array):
        """dc_x/dc_y c64 scalars, hist [384] c64 (DC-blocked y-space),
        xr/xi [T] f32 with T % 128 == 0.

        Returns (dc_x', dc_y', hist', yr [T//128, 25], yi [T//128, 25]).
        """
        t = xr.shape[-1]
        assert t % M == 0, t
        rows = t // M
        tile = pick_tile(rows, self.tile_rows)
        n_tiles = rows // tile
        tt, pvec = _tile_consts(tile)

        hr = jnp.real(hist).astype(jnp.float32).reshape(HIST_ROWS, M)
        hi = jnp.imag(hist).astype(jnp.float32).reshape(HIST_ROWS, M)
        scal = jnp.broadcast_to(
            jnp.stack([jnp.real(dc_x), jnp.imag(dc_x),
                       jnp.real(dc_y), jnp.imag(dc_y)]
                      ).astype(jnp.float32)[:, None], (4, M))
        xr_rows = xr.reshape(rows, M)
        xi_rows = xi.reshape(rows, M)

        grid_block = lambda shape: pl.BlockSpec(
            shape, lambda s: (s, 0), memory_space=pltpu.VMEM)
        whole = lambda shape: pl.BlockSpec(
            shape, lambda s: (0, 0), memory_space=pltpu.VMEM)

        yr_o, yi_o, ohr, ohi, oscal = pl.pallas_call(
            _body,
            grid=(n_tiles,),
            in_specs=[
                grid_block((tile, M)),            # xr rows
                grid_block((tile, M)),            # xi rows
                whole((HIST_ROWS, M)),            # hist re
                whole((HIST_ROWS, M)),            # hist im
                whole((4, M)),                    # dc scalars
                pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
                pl.BlockSpec(memory_space=pltpu.VMEM),   # u0/pj rows
                pl.BlockSpec(memory_space=pltpu.VMEM),   # tt
                pl.BlockSpec(memory_space=pltpu.VMEM),   # pvec
                pl.BlockSpec(memory_space=pltpu.VMEM),   # k2
            ],
            out_specs=[
                grid_block((tile, L)),
                grid_block((tile, L)),
                whole((HIST_ROWS, M)),
                whole((HIST_ROWS, M)),
                whole((4, M)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, L), jnp.float32),
                jax.ShapeDtypeStruct((rows, L), jnp.float32),
                jax.ShapeDtypeStruct((HIST_ROWS, M), jnp.float32),
                jax.ShapeDtypeStruct((HIST_ROWS, M), jnp.float32),
                jax.ShapeDtypeStruct((4, M), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((HIST_ROWS, M), jnp.float32),
                pltpu.VMEM((HIST_ROWS, M), jnp.float32),
                pltpu.VMEM((4, M), jnp.float32),
                pltpu.VMEM((tile, W_PAD), jnp.float32),
                pltpu.VMEM((tile, W_PAD), jnp.float32),
            ],
            interpret=self.interpret,
        )(xr_rows, xi_rows, hr, hi, scal,
          jnp.asarray(self.w1), jnp.asarray(self.rows2),
          jnp.asarray(tt), jnp.asarray(pvec), jnp.asarray(self.k2))

        new_dc_x = jax.lax.complex(oscal[0, 0], oscal[1, 0])
        new_dc_y = jax.lax.complex(oscal[2, 0], oscal[3, 0])
        new_hist = jax.lax.complex(ohr.reshape(-1), ohi.reshape(-1))
        return new_dc_x, new_dc_y, new_hist, yr_o, yi_o


def reference_impl(dc_x, dc_y, hist, x):
    """Pure-JAX semantics: ops/iir DC blocker -> ops/resample PolyResampler.

    hist is the fused 384-sample y-space history; the unfused resampler
    needs only its last 309 samples.
    """
    from sdr_pmr446_tpu.ops import iir
    from sdr_pmr446_tpu.ops.resample import PolyResampler
    (ndx, ndy), y = iir.dc_blocker_apply((dc_x, dc_y), x, C.DC_BLOCK_ALPHA)
    res = PolyResampler(D.resampler_taps(), L, M)
    _, band = res.apply(hist[HIST - res.hist_len:], y)
    new_hist = jnp.concatenate([hist, y])[-HIST:]
    return ndx, ndy, new_hist, band
