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
from sdr_pmr446_tpu.kernels import precision
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
    out = _dot(win[:], k_ref[:])
    gmat = _dot(gcol_ref[:], grow_ref[:])        # [tile, 128] = gain
    audio_out[:, :] = out[:, :LANES] * gmat
    lp_out[:, :] = out[:, LANES:]
    hist_rows = carry.shape[0]
    carry[:, :] = main_ref[tile_r - hist_rows:tile_r, :]


def _dot(a, b):
    # HIGHEST: the backend default contracts f32 in bf16 (kernels/precision)
    return jnp.dot(a, b, precision=precision.get(),
                   preferred_element_type=jnp.float32)


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


@functools.lru_cache(maxsize=None)
def _ctcss_dft_consts(tile: int, kpad: int, n_tiles: int, ns: int):
    """Static tables for the in-kernel CTCSS windowed-DFT epilogue.

    The tone phasor over GLOBAL audio position p factorizes exactly:
    E[t, p] = e^{-j w_t p} = lf(p%128) * rfa(row%tile) * rfb(row//tile),
    so the kernel never reads a per-row phasor plane from HBM — lf/rfa are
    hoistable constants and rfb is a [n_tiles, 128] crumb.  All phases are
    computed in float64 on host (w*p reaches ~25k rad) and rounded once.
    """
    w = 2.0 * np.pi * np.asarray(C.CTCSS_FREQS) / C.AUDIO_SAMPLERATE
    nt = w.shape[0]                                        # 38 tones

    def cossin(phase):                                     # [*, 128] pair
        re = np.zeros(phase.shape[:-1] + (LANES,), np.float64)
        im = np.zeros_like(re)
        re[..., :nt] = np.cos(phase)
        im[..., :nt] = -np.sin(phase)
        return re.astype(np.float32), im.astype(np.float32)

    lf_re, lf_im = cossin(np.outer(np.arange(LANES), w))
    rfa_re, rfa_im = cossin(np.outer(np.arange(tile) * float(LANES), w))
    rfb_re, rfb_im = cossin(
        np.outer(np.arange(n_tiles) * float(LANES * tile), w))
    e_b = np.zeros((LANES, 1), np.float32)
    e_b[0, 0] = 1.0
    e_s = np.zeros((LANES, 1), np.float32)
    e_s[1, 0] = 1.0
    ones128 = np.ones((1, LANES), np.float32)
    ones_kpad = np.ones((1, kpad), np.float32)
    ones_tcol = np.ones((tile, 1), np.float32)
    return dict(lf_re=lf_re, lf_im=lf_im, rfa_re=rfa_re, rfa_im=rfa_im,
                rfb_re=rfb_re, rfb_im=rfb_im, e_b=e_b, e_s=e_s,
                ones128=ones128, ones_kpad=ones_kpad, ones_tcol=ones_tcol)


def _body_dc_ctcss(main_ref, hist_ref, k_ref, gcol_ref, grow_ref, cx_ref,
                   cy_ref, w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref, el_ref,
                   bsel_ref, lfre_ref, lfim_ref, rfare_ref, rfaim_ref,
                   rfbre_ref, rfbim_ref, eb_ref, es_ref, o128_ref,
                   okp_ref, otc_ref,
                   audio_out, pre_re_out, pre_im_out, mem_re_out,
                   mem_im_out, dcy_out,
                   win, carry, xrow, ysc, *, ns: int, k8: int, s_f: int,
                   r_f: int):
    """_body_dc plus the CTCSS windowed-DFT epilogue: the DC-blocked lp
    rows are consumed IN KERNEL by masked tone matmuls, so the lp plane
    never exists in HBM at all (the old path wrote it, copied a [16,K,ns]
    gather, and read that back — ~2.3 B/input-sample of audio-rate glue).

    Per row of 128 samples the sub-chunk index k = floor(p/ns) and the
    split lane (where sub-chunk k+1 begins) are recomputed from iotas
    (exact in f32: p < 2^23), the dynamic window-boundary thresholds are
    gathered from the tiny bsel input (lane 0 = b[k], lane 1 = sel[k])
    with one-hot matmuls, and only rows of the FSM-SELECTED channel pass
    the mask (sel comes from fsm_phase_a, which needs no tone data) — so
    the accumulated [K8, 128] outputs are already the active-channel
    pre-boundary / whole-sub-chunk DFT sums; XLA applies the scalar
    window-phase factors (fsm.raw_sums_to_ctcss).  The last true lp row
    is emitted per channel (dcy_out) to carry the DC-blocker y[-1]."""
    tile_r = audio_out.shape[0]
    c = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        carry[:, :] = hist_ref[:, :]
        xrow[:, :] = cx_ref[:, :]        # lp x[-1] at lane LANES-1
        ysc[:, :] = cy_ref[:, :]         # dc y[-1] at lane 0

    @pl.when((c == 0) & (s == 0))
    def _():
        pre_re_out[:, :] = jnp.zeros_like(pre_re_out)
        pre_im_out[:, :] = jnp.zeros_like(pre_im_out)
        mem_re_out[:, :] = jnp.zeros_like(mem_re_out)
        mem_im_out[:, :] = jnp.zeros_like(mem_im_out)

    rows = jnp.concatenate([carry[:], main_ref[:]], axis=0)
    for i in range(win.shape[1] // LANES):
        win[:, i * LANES:(i + 1) * LANES] = rows[i:i + tile_r, :]
    out = _dot(win[:], k_ref[:])
    gmat = _dot(gcol_ref[:], grow_ref[:])        # [tile, 128] = gain
    audio_out[:, :] = out[:, :LANES] * gmat
    lp = out[:, LANES:]
    hist_rows = carry.shape[0]
    carry[:, :] = main_ref[tile_r - hist_rows:tile_r, :]

    # one-pole DC recurrence on 128-sample rows (front_end.py idiom)
    e_last = el_ref[:]
    lp_prev = jnp.concatenate([xrow[0:1, :], lp[:tile_r - 1, :]], axis=0)
    prev_col = _dot(lp_prev, e_last)                      # [tile, 1]
    yloc = _dot(lp, w1_ref[:]) - _dot(prev_col, u0_ref[:])
    yend = _dot(yloc, e_last)                             # [tile, 1]
    rcarry = _dot(tt_ref[:], yend) + _dot(pvec_ref[:], ysc[0:1, 0:1])
    lpdc = yloc + _dot(rcarry, pj_ref[:])
    xrow[0:1, :] = lp[tile_r - 1:tile_r, :]
    ysc[0:1, 0:1] = (yend[tile_r - 1:tile_r, :]
                     + rcarry[tile_r - 1:tile_r, :] * _PJ_LAST)

    # the DC-blocker carry: the last TRUE lp row, emitted once per channel
    @pl.when(s == s_f)
    def _():
        dcy_out[0:1, :] = lpdc[r_f:r_f + 1, :]

    # ---- CTCSS DFT epilogue ----
    kpad = okp_ref.shape[1]
    nsf = float(ns)
    base = (s * tile_r * LANES).astype(jnp.float32)
    i_col = jax.lax.broadcasted_iota(jnp.int32, (tile_r, 1),
                                 0).astype(jnp.float32)
    p_col = i_col * float(LANES) + base                   # global sample
    kr_col = jnp.floor((p_col + 0.5) * (1.0 / nsf))       # sub-chunk idx
    l0_col = (kr_col + 1.0) * nsf - p_col                 # split lane
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_r, LANES),
                                1).astype(jnp.float32)

    # gather b[k], (sel[k] == c) for k = kr and kr+1 (one-hot matmuls)
    k_lane = jax.lax.broadcasted_iota(jnp.int32, (tile_r, kpad),
                                  1).astype(jnp.float32)
    kr_mat = _dot(kr_col, okp_ref[:])                     # [tile, kpad]
    oh0 = jnp.where(kr_mat == k_lane, 1.0, 0.0)
    oh1 = jnp.where(kr_mat + 1.0 == k_lane, 1.0, 0.0)
    bc = _dot(bsel_ref[:], eb_ref[:])                     # [kpad, 1]
    sc = _dot(bsel_ref[:], es_ref[:])                     # [kpad, 1]
    selc = jnp.where(sc == c.astype(jnp.float32), 1.0, 0.0)
    t0 = _dot(kr_col * nsf + _dot(oh0, bc) - p_col, o128_ref[:])
    t1 = _dot((kr_col + 1.0) * nsf + _dot(oh1, bc) - p_col, o128_ref[:])
    m0 = jnp.where(lane < _dot(l0_col, o128_ref[:]), 1.0, 0.0)
    w0 = m0 * _dot(_dot(oh0, selc), o128_ref[:])
    w1 = (1.0 - m0) * _dot(_dot(oh1, selc), o128_ref[:])
    w0p = w0 * jnp.where(lane <= t0, 1.0, 0.0)
    w1p = w1 * jnp.where(lane <= t1, 1.0, 0.0)

    # per-row tone phasor: E[t, p] = lf * rfa * rfb (factored, constants)
    rfb_re = _dot(otc_ref[:], rfbre_ref[:])               # [tile, 128]
    rfb_im = _dot(otc_ref[:], rfbim_ref[:])
    rf_re = rfare_ref[:] * rfb_re - rfaim_ref[:] * rfb_im
    rf_im = rfare_ref[:] * rfb_im + rfaim_ref[:] * rfb_re

    # segment reduction: rows -> sub-chunks (static per-column k index)
    i_lane8 = jax.lax.broadcasted_iota(jnp.int32, (k8, tile_r),
                                   1).astype(jnp.float32)
    k_row8 = jax.lax.broadcasted_iota(jnp.int32, (k8, tile_r),
                                  0).astype(jnp.float32)
    p_lane8 = i_lane8 * float(LANES) + base
    kr_lane8 = jnp.floor((p_lane8 + 0.5) * (1.0 / nsf))
    ohT0 = jnp.where(kr_lane8 == k_row8, 1.0, 0.0)        # [k8, tile]
    ohT1 = jnp.where(kr_lane8 + 1.0 == k_row8, 1.0, 0.0)

    def tone_sums(z0, z1):
        a0 = _dot(z0, lfre_ref[:])
        b0 = _dot(z0, lfim_ref[:])
        a1 = _dot(z1, lfre_ref[:])
        b1 = _dot(z1, lfim_ref[:])
        s_re = (_dot(ohT0, a0 * rf_re - b0 * rf_im)
                + _dot(ohT1, a1 * rf_re - b1 * rf_im))
        s_im = (_dot(ohT0, a0 * rf_im + b0 * rf_re)
                + _dot(ohT1, a1 * rf_im + b1 * rf_re))
        return s_re, s_im

    pr, pi = tone_sums(lpdc * w0p, lpdc * w1p)
    pre_re_out[:, :] = pre_re_out[:, :] + pr
    pre_im_out[:, :] = pre_im_out[:, :] + pi
    mr, mi = tone_sums(lpdc * w0, lpdc * w1)
    mem_re_out[:, :] = mem_re_out[:, :] + mr
    mem_im_out[:, :] = mem_im_out[:, :] + mi


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



    def apply_dc_ctcss(self, hist: jax.Array, dc_x: jax.Array,
                       dc_y: jax.Array, demod: jax.Array, gain: jax.Array,
                       b_arr: jax.Array, sel: jax.Array,
                       out_len: int, ns: int = C.SUBCHUNK_AUDIO):
        """Fused DC + CTCSS-DFT variant: the lp branch is DC-blocked AND
        consumed by the CTCSS windowed-DFT inside the kernel, so no lp
        plane ever reaches HBM (VERDICT r2 'remaining glue' #2).

        b_arr i32 [K] window-boundary indices and sel i32 [K] selected
        channels come from fsm_phase_a (RSSI-only — no tone data).
        out_len must be K*ns.  Returns (new_hist, dc_x', dc_y',
        audio_padded [16, r128*128], raw_pre [K, 38] c64, raw_mem
        [K, 38] c64) where raw_* are global-phase DFT sums; apply
        fsm.raw_sums_to_ctcss to get (s_pre, s_suf).
        """
        (new_hist, new_dc_x, new_dc_y, audio, pre_re, pre_im, mem_re,
         mem_im) = self.apply_dc_ctcss_f32(hist, dc_x, dc_y, demod, gain,
                                           b_arr, sel, out_len, ns)
        raw_pre = jax.lax.complex(pre_re, pre_im)
        raw_mem = jax.lax.complex(mem_re, mem_im)
        return new_hist, new_dc_x, new_dc_y, audio, raw_pre, raw_mem

    def apply_dc_ctcss_f32(self, hist: jax.Array, dc_x: jax.Array,
                           dc_y: jax.Array, demod: jax.Array,
                           gain: jax.Array, b_arr: jax.Array,
                           sel: jax.Array, out_len: int,
                           ns: int = C.SUBCHUNK_AUDIO):
        """apply_dc_ctcss with the DFT sums left as f32 plane pairs
        (pre_re, pre_im, mem_re, mem_im — each [K, 38]) instead of the
        complex combine.  An ALL-f32 traced program: the value-verify
        tool needs this (complex ops in an executed program poison the
        tunnel's later device→host fetches — CLAUDE.md), and callers that
        immediately split the complex sums back apart can skip the
        round trip."""
        assert hist.shape[-1] == self.hist
        assert out_len % ns == 0
        k_sub = out_len // ns
        hist_rows = self.hist // LANES
        demod3, f, tile, n_tiles = self._geometry(demod, out_len)
        k8 = max(8, -(-k_sub // 8) * 8)
        kpad = max(128, -(-k_sub // 128) * 128)

        grow = jnp.broadcast_to(gain, (1, LANES)).astype(jnp.float32)
        gcol = np.ones((tile, 1), np.float32)
        sel_x = np.zeros((1, LANES), np.float32)
        sel_x[0, LANES - 1] = 1.0
        sel_y = np.zeros((1, LANES), np.float32)
        sel_y[0, 0] = 1.0
        cx = dc_x.astype(jnp.float32)[:, None, None] * sel_x   # [16, 1, 128]
        cy = dc_y.astype(jnp.float32)[:, None, None] * sel_y
        cn = _row_consts()
        tt, pvec = _tile_consts(tile)
        dc = _ctcss_dft_consts(tile, kpad, n_tiles, ns)

        # bsel rows: lane 0 = b[k], lane 1 = sel[k] (-1 past the true K so
        # padded rows never match any channel)
        bs = jnp.zeros((kpad, LANES), jnp.float32)
        bs = bs.at[:, 1].set(-1.0)
        bs = bs.at[:k_sub, 0].set(b_arr.astype(jnp.float32))
        bs = bs.at[:k_sub, 1].set(sel.astype(jnp.float32))

        # the row/tile containing the last TRUE frame (dc y[-1] carry)
        r_last = (f - 1) // LANES
        s_f = r_last // tile
        r_f = r_last - s_f * tile

        whole_c = lambda: pl.BlockSpec((None, 1, LANES),
                                       lambda c, s: (c, 0, 0),
                                       memory_space=pltpu.VMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        body = functools.partial(_body_dc_ctcss, ns=ns, k8=k8, s_f=s_f,
                                 r_f=r_f)
        audio, pre_re, pre_im, mem_re, mem_im, dcy = pl.pallas_call(
            body,
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
                vmem(),                                   # bsel
                vmem(), vmem(),                           # lf re/im
                vmem(), vmem(),                           # rfa re/im
                pl.BlockSpec((None, 1, LANES), lambda c, s: (s, 0, 0),
                             memory_space=pltpu.VMEM),    # rfb re
                pl.BlockSpec((None, 1, LANES), lambda c, s: (s, 0, 0),
                             memory_space=pltpu.VMEM),    # rfb im
                vmem(), vmem(),                           # e_b, e_s
                vmem(), vmem(), vmem(),                   # ones 128/kpad/tcol
            ],
            out_specs=[
                pl.BlockSpec((None, tile, LANES), lambda c, s: (c, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k8, LANES), lambda c, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k8, LANES), lambda c, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k8, LANES), lambda c, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k8, LANES), lambda c, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LANES), lambda c, s: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NCH, n_tiles * tile, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((k8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((k8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((k8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((k8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((NCH, 1, LANES), jnp.float32),
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
          jnp.asarray(cn["e_last"]), bs,
          jnp.asarray(dc["lf_re"]), jnp.asarray(dc["lf_im"]),
          jnp.asarray(dc["rfa_re"]), jnp.asarray(dc["rfa_im"]),
          jnp.asarray(dc["rfb_re"])[:, None], jnp.asarray(dc["rfb_im"])[:, None],
          jnp.asarray(dc["e_b"]), jnp.asarray(dc["e_s"]),
          jnp.asarray(dc["ones128"]), jnp.asarray(dc["ones_kpad"]),
          jnp.asarray(dc["ones_tcol"]))

        audio = audio.reshape(NCH, n_tiles * tile * LANES)
        new_hist = self._new_hist(hist, demod, f)
        new_dc_y = dcy[:, 0, (f - 1) % LANES]
        new_dc_x = jnp.matmul(new_hist, jnp.asarray(self._lp_last_col),
                              precision=jax.lax.Precision.HIGHEST)
        return (new_hist, new_dc_x, new_dc_y, audio,
                pre_re[:k_sub, :38], pre_im[:k_sub, :38],
                mem_re[:k_sub, :38], mem_im[:k_sub, :38])


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
