"""Pallas TPU kernel: fused audio filter bank over all 16 channels.

The reference's audio stack is one tight per-sample loop on the active
channel (src/sdr_pmr446.c:882-902): 377-tap CTCSS-removal highpass, the
complementary lowpass branch delay(188) - HP, de-emphasis, and the optional
4.5 kHz lowpass.  The XLA op-chain runs these as four separate audio-rate
HBM passes over [16, T]; this kernel computes BOTH chain outputs

  audio[c, n] = gain * (deemph (*) lp? (*) hp)(demod)[c, n]
  lp_branch[c, n] = (delta_188 - hp)(demod)[c, n]     (pre-DC-block)

in ONE pass, by composing the cascaded linear FIRs into two columns of a
single [640, 256] MXU kernel (conv composition is exact in exact arithmetic;
coefficients are composed in float64 — agreement with the sequential op
chain is at f32 rounding level, test-gated).  The audio-branch DC blocker
that follows lp_branch is a one-pole IIR and stays in XLA's exact scan
(ops/iir.py).

Layout: time is tiled into 128-lane frame rows per channel.  Output frame
row r of channel c needs input rows r-4..r (window 513 <= 640), carried as
a LOOK-BEHIND: the previous tile's last 4 rows persist in VMEM scratch
across the (sequential) grid, reloading from the carried [16, 512] history
at each channel's first tile.  The demod plane is consumed DIRECTLY in the
shape the PFB kernel emits it ([16, F_pad] with F_pad % 128 == 0 — a free
3-D view), so none of the old XLA glue (history concat, row reshape, main
slice, look-ahead pad — four whole-plane HBM passes, ~10 B/input-sample
measured on the dev chip at K=8) exists anymore.  The window matrix
[TILE_R, 640] is assembled with 5 aligned row-block copies and hit with
one matmul against the [640, 256] kernel whose column p < 128 is the
composed audio FIR ending at phase p and column 128+p the lp-branch FIR;
the runtime (traced) audio gain applies IN-KERNEL
via a k=1 broadcast matmul, keeping the kernel matrix a hoistable
constant (no per-step gain-scale HBM pass).

Callers that keep the plane padded end-to-end (scanner/chain.py routes the
PFB's padded demod straight in and gathers sub-chunk windows out of the
padded outputs) pass ``out_len``/``padded_out=True``; everyone else gets
the old [16, F] sliced contract.

Carried state: the last 512 demod samples per channel ([16, 512] f32) —
the raw-input history replaces the op-chain's four intermediate-signal
histories (hp/delay/deemph/audio-lp).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_pmr446_tpu import config as C
# the proven one-pole-recurrence-as-matmuls constants (width 128 == LANES)
from sdr_pmr446_tpu.kernels.front_end import (_row_consts, _tile_consts,
                                              _PJ_LAST, pick_tile)

NCH = C.NUM_CHANNELS          # 16
LANES = 128                   # frame-row width (one vreg lane dim)
HIST = 4 * LANES              # 512-sample demod history per channel
W_PAD = 5 * LANES             # shared window width per output row


@functools.lru_cache(maxsize=None)
def _kernel_columns(lowpass: bool, fir_deemph: bool):
    """(audio_fir, lp_fir) float64 1-D composed kernels."""
    from sdr_pmr446_tpu.taps import design as D
    hp = D.ctcss_hp_taps()
    de = D.deemph_fir_taps() if fir_deemph else D.deemph_fir_equiv()
    audio = np.convolve(de, hp)
    if lowpass:
        audio = np.convolve(D.audio_lp_taps(), audio)
    lp = -hp.copy()
    lp[C.CTCSS_DELAY] += 1.0            # delta_188 - hp
    return audio, lp


@functools.lru_cache(maxsize=None)
def _kernel_matrix(lowpass: bool, fir_deemph: bool,
                   hist: int) -> np.ndarray:
    """[hist+128, 256] f32: K[p + j, p] = h[hist - j] (audio cols 0-127,
    lp 128+)."""
    audio, lp = _kernel_columns(lowpass, fir_deemph)
    kmat = np.zeros((hist + LANES, 2 * LANES), dtype=np.float64)
    for h, base in ((audio, 0), (lp, LANES)):
        hlen = h.shape[0]
        assert hlen <= hist - 1
        # y[128 r + p] = sum_m h[m] xe[128 r + p + hist - m]
        j = hist - np.arange(hlen)          # j = hist - m, m in [0, hlen)
        for p in range(LANES):
            kmat[p + j, base + p] = h
    return kmat.astype(np.float32)


def _body(main_ref, hist_ref, k_ref, gcol_ref, grow_ref,
          audio_out, lp_out, win, carry):
    """Output row r of the tile needs input rows r-4..r; the 4-row
    look-behind lives in ``carry`` scratch across the sequential grid,
    reloading from the carried per-channel history at each channel's
    first tile (grid iterates channel-major, tiles innermost).  The
    traced audio gain applies IN-KERNEL (a k=1 broadcast matmul) so the
    [640, 256] kernel matrix stays a hoistable constant instead of a
    per-step gain-scaled HBM pass."""
    tile_r = audio_out.shape[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        carry[:, :] = hist_ref[:, :]

    rows = jnp.concatenate([carry[:], main_ref[:]], axis=0)
    for i in range(win.shape[1] // LANES):
        win[:, i * LANES:(i + 1) * LANES] = rows[i:i + tile_r, :]
    out = jnp.dot(win[:], k_ref[:], preferred_element_type=jnp.float32)
    gmat = _dot(gcol_ref[:], grow_ref[:])        # [tile, 128] = gain
    audio_out[:, :] = out[:, :LANES] * gmat
    lp_out[:, :] = out[:, LANES:]
    hist_rows = carry.shape[0]
    carry[:, :] = main_ref[tile_r - hist_rows:tile_r, :]


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _body_dc(main_ref, hist_ref, k_ref, gcol_ref, grow_ref, cx_ref, cy_ref,
             w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, el_ref,
             audio_out, lpdc_out, win, carry, xrow, ysc):
    """Fused variant: the audio-branch one-pole DC blocker runs as an
    epilogue on the lp column, so lp_branch never touches HBM (VERDICT r2
    #1).  Same triangular-carry-matmul recurrence as the front end
    (kernels/front_end.py steps 1-3) at width 128; the per-channel
    (x[-1], y[-1]) carries AND the 4-row demod look-behind live in VMEM
    scratch across the tile grid and reload from the c-indexed carry
    inputs at each channel's first tile (grid iterates channel-major,
    tiles innermost)."""
    tile_r = audio_out.shape[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        carry[:, :] = hist_ref[:, :]
        xrow[:, :] = cx_ref[:, :]        # lp x[-1] at lane LANES-1
        ysc[:, :] = cy_ref[:, :]         # dc y[-1] at lane 0

    rows = jnp.concatenate([carry[:], main_ref[:]], axis=0)
    for i in range(win.shape[1] // LANES):
        win[:, i * LANES:(i + 1) * LANES] = rows[i:i + tile_r, :]
    out = _dot(win[:], k_ref[:])
    gmat = _dot(gcol_ref[:], grow_ref[:])        # [tile, 128] = gain
    audio_out[:, :] = out[:, :LANES] * gmat
    lp = out[:, LANES:]
    hist_rows = carry.shape[0]
    carry[:, :] = main_ref[tile_r - hist_rows:tile_r, :]

    # one-pole DC recurrence on 128-sample rows (front_end.py idiom):
    # full-row sublane shift + one-hot selector for the previous sample,
    # row-local zero-state response, triangular row-carry matmul
    e_last = el_ref[:]
    lp_prev = jnp.concatenate([xrow[0:1, :], lp[:tile_r - 1, :]], axis=0)
    prev_col = _dot(lp_prev, e_last)                      # [tile, 1]
    yloc = _dot(lp, w1_ref[:]) - _dot(prev_col, u0_ref[:])
    yend = _dot(yloc, e_last)                             # [tile, 1]
    rcarry = _dot(tt_ref[:], yend) + _dot(pvec_ref[:], ysc[0:1, 0:1])
    lpdc_out[:, :] = yloc + _dot(rcarry, pj_ref[:])
    xrow[0:1, :] = lp[tile_r - 1:tile_r, :]
    ysc[0:1, 0:1] = (yend[tile_r - 1:tile_r, :]
                     + rcarry[tile_r - 1:tile_r, :] * _PJ_LAST)


class PallasAudioBank:
    """Fused replacement for the hp/delay/deemph/audio-lp FIR stack.

    apply(hist [16, 512] f32, demod [16, F] f32, gain f32 scalar)
      -> (new_hist, audio [16, F], lp_branch [16, F])
    """

    def __init__(self, lowpass: bool = False, fir_deemph: bool = False,
                 tile_r: int = 128, interpret: bool = False):
        # history length adapts to the composed FIR: the default flag combos
        # fit 512, fir_deemph+lowpass composes 377*101*103 -> 579 taps -> 640
        audio, _ = _kernel_columns(lowpass, fir_deemph)
        hist_rows = max(4, -(-(audio.shape[0] + 1) // LANES))
        self.hist = hist_rows * LANES            # per-channel demod history
        self.w_pad = self.hist + LANES           # window width per output row
        assert tile_r % 8 == 0 and tile_r >= self.w_pad // LANES - 1
        self.tile_r = tile_r
        self.interpret = interpret
        self.kmat = _kernel_matrix(lowpass, fir_deemph,
                                   self.hist)    # [w_pad, 256] numpy
        # apply_dc's x[-1] recovery: lp_branch[c, f-1] as a dot against
        # the new [16, hist] raw-demod history (hist >= len(lp) always)
        _, lp = _kernel_columns(lowpass, fir_deemph)
        col = np.zeros((self.hist,), np.float64)
        col[self.hist - 1 - np.arange(lp.shape[0])] = lp
        self._lp_last_col = col.astype(np.float32)

    def init(self) -> jax.Array:
        return jnp.zeros((NCH, self.hist), jnp.float32)

    def _geometry(self, demod, out_len):
        """(demod_padded [16, r_pad, 128], f, tile, n_tiles): pad the plane
        to whole multiple-of-8-row tiles.  Chains that feed the PFB
        kernel's own padded output hit the no-copy path (the reshape is a
        free view)."""
        nch, f_in = demod.shape
        assert nch == NCH
        f = out_len if out_len is not None else f_in
        assert f <= f_in
        r_rows = -(-f_in // LANES)
        r8 = -(-r_rows // 8) * 8
        if r8 * LANES != f_in:
            demod = jnp.pad(demod, ((0, 0), (0, r8 * LANES - f_in)))
        tile = pick_tile(r8, self.tile_r)
        return demod.reshape(NCH, r8, LANES), f, tile, r8 // tile

    def apply(self, hist: jax.Array, demod: jax.Array, gain: jax.Array,
              out_len: int | None = None, padded_out: bool = False):
        """demod [16, F_in] (F_in may include the PFB kernel's tail
        padding; ``out_len`` names the true frame count).  Returns
        (new_hist, audio, lp) — [16, F] sliced, or the full padded plane
        with ``padded_out=True`` (the chain's gather-direct fast path)."""
        assert hist.shape[-1] == self.hist
        hist_rows = self.hist // LANES
        demod3, f, tile, n_tiles = self._geometry(demod, out_len)

        # the gain enters the KERNEL (gcol @ grow broadcast): kmat stays
        # a pure constant, so no per-step [640, 256] gain-scale HBM pass
        grow = jnp.broadcast_to(gain, (1, LANES)).astype(jnp.float32)
        gcol = np.ones((tile, 1), np.float32)

        audio, lp = pl.pallas_call(
            _body,
            grid=(NCH, n_tiles),
            in_specs=[
                pl.BlockSpec((None, tile, LANES), lambda c, s: (c, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, hist_rows, LANES),
                             lambda c, s: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),    # kernel matrix
                pl.BlockSpec(memory_space=pltpu.VMEM),    # gcol
                pl.BlockSpec(memory_space=pltpu.VMEM),    # grow
            ],
            out_specs=[
                pl.BlockSpec((None, tile, LANES), lambda c, s: (c, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, tile, LANES), lambda c, s: (c, s, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NCH, n_tiles * tile, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((NCH, n_tiles * tile, LANES),
                                     jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, self.w_pad), jnp.float32),
                pltpu.VMEM((hist_rows, LANES), jnp.float32),
            ],
            interpret=self.interpret,
        )(demod3, hist.reshape(NCH, hist_rows, LANES),
          jnp.asarray(self.kmat), jnp.asarray(gcol), grow)

        audio = audio.reshape(NCH, n_tiles * tile * LANES)
        lp = lp.reshape(NCH, n_tiles * tile * LANES)
        new_hist = self._new_hist(hist, demod, f)
        if not padded_out:
            audio = audio[:, :f]
            lp = lp[:, :f]
        return new_hist, audio, lp

    def _new_hist(self, hist, demod, f):
        """Last ``self.hist`` TRUE demod frames (a tiny tail slice)."""
        if f >= self.hist:
            return demod[:, f - self.hist:f]
        return jnp.concatenate([hist, demod[:, :f]], axis=-1)[:, -self.hist:]

    def apply_dc(self, hist: jax.Array, dc_x: jax.Array, dc_y: jax.Array,
                 demod: jax.Array, gain: jax.Array,
                 out_len: int | None = None, padded_out: bool = False):
        """Fused-DC variant: the audio-branch DC blocker runs inside the
        kernel, so the pre-DC lp branch never round-trips HBM.

        hist [16, 512] f32; dc_x/dc_y f32 [16] (the ops/iir (x[-1], y[-1])
        per channel); demod [16, F_in] (``out_len`` names the true frame
        count when F_in carries the PFB kernel's tail pad); gain f32.
        Returns (new_hist, dc_x', dc_y', audio, lp_dcb) — [16, F] sliced,
        or the padded planes with ``padded_out=True``.  Same arithmetic
        fixed point as apply + ops/iir.dc_blocker_apply to f32 rounding
        (test-gated SNR)."""
        assert hist.shape[-1] == self.hist
        hist_rows = self.hist // LANES
        demod3, f, tile, n_tiles = self._geometry(demod, out_len)

        grow = jnp.broadcast_to(gain, (1, LANES)).astype(jnp.float32)
        gcol = np.ones((tile, 1), np.float32)

        # per-channel carry rows: lp x[-1] at lane 127 (where e_last looks
        # after the sublane shift), dc y[-1] at lane 0
        sel_x = np.zeros((1, LANES), np.float32)
        sel_x[0, LANES - 1] = 1.0
        sel_y = np.zeros((1, LANES), np.float32)
        sel_y[0, 0] = 1.0
        cx = dc_x.astype(jnp.float32)[:, None, None] * sel_x   # [16, 1, 128]
        cy = dc_y.astype(jnp.float32)[:, None, None] * sel_y
        cn = _row_consts()
        tt, pvec = _tile_consts(tile)

        whole_c = lambda: pl.BlockSpec((None, 1, LANES),
                                       lambda c, s: (c, 0, 0),
                                       memory_space=pltpu.VMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        audio, lpdc = pl.pallas_call(
            _body_dc,
            grid=(NCH, n_tiles),
            in_specs=[
                pl.BlockSpec((None, tile, LANES), lambda c, s: (c, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, hist_rows, LANES),
                             lambda c, s: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                vmem(),                                   # kernel matrix
                vmem(),                                   # gcol
                vmem(),                                   # grow
                whole_c(),                                # cx
                whole_c(),                                # cy
                vmem(), vmem(), vmem(),                   # w1, u0, pj
                vmem(), vmem(), vmem(),                   # tt, pvec, e_last
            ],
            out_specs=[
                pl.BlockSpec((None, tile, LANES), lambda c, s: (c, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, tile, LANES), lambda c, s: (c, s, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NCH, n_tiles * tile, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((NCH, n_tiles * tile, LANES),
                                     jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, self.w_pad), jnp.float32),
                pltpu.VMEM((hist_rows, LANES), jnp.float32),   # look-behind
                pltpu.VMEM((1, LANES), jnp.float32),      # lp x[-1] row
                pltpu.VMEM((1, LANES), jnp.float32),      # dc y[-1] row
            ],
            interpret=self.interpret,
        )(demod3, hist.reshape(NCH, hist_rows, LANES),
          jnp.asarray(self.kmat), jnp.asarray(gcol), grow, cx, cy,
          jnp.asarray(cn["w1"]), jnp.asarray(cn["u0"]),
          jnp.asarray(cn["pj"]), jnp.asarray(tt), jnp.asarray(pvec),
          jnp.asarray(cn["e_last"]))

        audio = audio.reshape(NCH, n_tiles * tile * LANES)
        lpdc = lpdc.reshape(NCH, n_tiles * tile * LANES)
        new_hist = self._new_hist(hist, demod, f)
        # new carries at the TRUE last sample f-1 (the padded tail rows
        # carry garbage): y' from the output column, x' (the pre-DC lp
        # value) recomputed with one 512-tap dot against the new history
        new_dc_y = lpdc[:, f - 1]
        new_dc_x = jnp.matmul(new_hist, jnp.asarray(self._lp_last_col),
                              precision=jax.lax.Precision.HIGHEST)
        if not padded_out:
            audio = audio[:, :f]
            lpdc = lpdc[:, :f]
        return new_hist, new_dc_x, new_dc_y, audio, lpdc


def reference_impl(hist, demod, gain, lowpass=False, fir_deemph=False):
    """Op-chain semantics (scanner/chain.py steps 6) on a raw-demod history.

    hist is the combined [16, 512] raw-demod history; the op-chain's four
    intermediate histories are reconstructed by running the chain over the
    extended signal and slicing the last F samples.
    """
    from sdr_pmr446_tpu.taps import design as D
    from sdr_pmr446_tpu.ops import fir
    f = demod.shape[-1]
    xe = jnp.concatenate([hist, demod], axis=-1)
    hp_taps = jnp.asarray(D.ctcss_hp_taps().astype(np.float32))
    de = D.deemph_fir_taps() if fir_deemph else D.deemph_fir_equiv()
    de_taps = jnp.asarray(de.astype(np.float32))
    _, hp_out = fir.fir_apply(
        jnp.zeros((NCH, hp_taps.shape[0] - 1), jnp.float32), xe, hp_taps)
    _, delayed = fir.delay_apply(
        jnp.zeros((NCH, C.CTCSS_DELAY), jnp.float32), xe)
    lp_branch = delayed - hp_out
    audio = hp_out * gain
    _, audio = fir.fir_apply(
        jnp.zeros((NCH, de_taps.shape[0] - 1), jnp.float32), audio, de_taps)
    if lowpass:
        lp_taps = jnp.asarray(D.audio_lp_taps().astype(np.float32))
        _, audio = fir.fir_apply(
            jnp.zeros((NCH, lp_taps.shape[0] - 1), jnp.float32), audio,
            lp_taps)
    new_hist = xe[:, f:f + hist.shape[-1]]
    return new_hist, audio[:, -f:], lp_branch[:, -f:]
