"""Pallas TPU kernel: fused decimator + NBFM discriminator + post-FIR.

The tail shared by the two single-channel chains (VERDICT r3 #3):

  dsd_in (src/dsd_in.c:95-124): band @200 kHz -> 16x decimating lowpass
      -> freqdem(0.5) -> 96/25 polyphase upsample -> s16 scale/clip;
  single (scanner/single.py): band -> mixer + 16x channel-select lowpass
      -> freqdem -> composed (CTCSS-HP * gain * de-emphasis) audio FIR.

Both consume the band exactly as the fused front end emits it — GROUP
rows [G, 400] (kernels/front_end.py group_out) — so the whole tail after
the band is ONE kernel pass: per group row of 400 band samples there are
exactly 25 decimated outputs, 25 demod samples, and (dsd) 96 PCM or
(single) 25 audio outputs.  Everything is row-aligned:

  - decimation: one [gt, (hb+1)*400] window (hb carried history rows,
    assembled from sublane slices like the PFB group body) hit with a
    [(hb+1)*400, 25] matrix built FROM ops/resample._kernel_matrix, so
    the math is the op chain's to summation order;
  - the single chain's NCO mixer FOLDS INTO the decimator taps:
    sig[n] = e^{-jw b0} * (-1)^(m n) * sum_k (h[k] e^{jwk}) band[16n-k]
    with w = 2 pi m/32 (channel offsets are multiples of fs/32, m odd) —
    complex static taps + a (-1)^(g+u) alternation constant; the global
    phase e^{-jw b0} cancels in the discriminator and only rotates the
    carried prev sample (caller-side, like the PFB parity fold);
  - discriminator: prev sample via a one-hot lane-shift matmul + the
    carried last row (sublane shift), atan2 from kernels/kmath.py;
  - post-FIR: [gt, (dh+1)*25] demod windows x a static matrix — the
    96/25 polyphase upsampler (x32767, int16 clip in-kernel) for dsd,
    the composed audio FIR (gain folded in) for single.

Mosaic idioms as proven elsewhere in kernels/: scratch stores at any
static lane offset, full-row sublane shifts + one-hot selector matmuls
for single-sample access, value dims need not be 128 multiples (only
BLOCK last dims: out blocks use the full array minor dim).  All dots pin
HIGHEST (kernels/precision.py).
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
from sdr_pmr446_tpu.kernels import kmath, precision
from sdr_pmr446_tpu.kernels.front_end import pick_tile
from sdr_pmr446_tpu.ops.resample import _kernel_matrix

GL = 400                     # band samples per group row
DPS = 25                     # decimated samples per group row
_SCALE = 1.0 / (2.0 * math.pi * C.FM_KF)


def _dot(a, b):
    return jnp.dot(a, b, precision=precision.get(),
                   preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _dec_matrix(taps_key, hb: int) -> np.ndarray:
    """[(hb+1)*400, 25] f64: decimated output (g, u) = win(g) @ col(u),
    win(g)[j] = band[400(g-hb) + j].

    Exactly ops/resample semantics for an (L=1, M=16) PolyResampler:
    y[f] = sum_w K[0, w] xe[16 f + w], xe = [hist(P-1), band] — band
    index 16(25g+u) + w - (P-1), so j = 400 hb + 16 u - (P-1) + w."""
    k = _kernel_matrix(taps_key, 1, 16)                  # [1, P]
    p_len = k.shape[1]
    wb = (hb + 1) * GL
    assert hb * GL >= p_len - 1, (hb, p_len)
    kd = np.zeros((wb, DPS), dtype=np.float64)
    for u in range(DPS):
        j0 = hb * GL + 16 * u - (p_len - 1)
        kd[j0:j0 + p_len, u] = k[0]
    return kd


@functools.lru_cache(maxsize=None)
def _post_matrix(taps_key, L: int, M: int, dh: int, gain: float,
                 out_w: int) -> np.ndarray:
    """[(dh+1)*25, out_w] f64 post-FIR operating on demod rows.

    L/M polyphase (ops/resample layout): out (g, p) = sum_w Ku[p, w] *
    de[M g + w], de = [hist(P-1), demod] -> demod index M g + w - (P-1),
    window win(g)[j] = demod[25(g-dh) + j] => j = 25 dh + w - (P-1)."""
    k = _kernel_matrix(taps_key, L, M) * gain            # [L, W]
    l_, w_ = k.shape
    assert l_ == out_w and M == DPS
    p1 = (len(taps_key) // L) - 1                        # P-1
    wp = (dh + 1) * DPS
    assert dh * DPS >= p1 and p1 + w_ - 1 - p1 <= wp
    kp = np.zeros((wp, out_w), dtype=np.float64)
    for p in range(l_):
        for w in range(w_):
            j = dh * DPS + w - p1
            if 0 <= j < wp and k[p, w] != 0.0:
                kp[j, p] = k[p, w]
    return kp


@functools.lru_cache(maxsize=None)
def _fir_matrix(taps_key, dh: int, gain: float) -> np.ndarray:
    """[(dh+1)*25, 25] f64 plain-FIR post matrix: audio (g, u) =
    sum_k h[k] demod[25 g + u - k] => j = 25 dh + u - k."""
    h = np.asarray(taps_key, dtype=np.float64) * gain
    assert dh * DPS >= h.shape[0] - 1
    wp = (dh + 1) * DPS
    ka = np.zeros((wp, DPS), dtype=np.float64)
    for u in range(DPS):
        j = dh * DPS + u - np.arange(h.shape[0])
        ka[j, u] = h
    return ka


@functools.lru_cache(maxsize=None)
def _shift_consts() -> dict:
    s25 = np.zeros((DPS, DPS), np.float32)               # prev within row
    s25[np.arange(DPS - 1), np.arange(1, DPS)] = 1.0
    e24 = np.zeros((DPS, 1), np.float32)                 # select lane 24
    e24[DPS - 1, 0] = 1.0
    oh0 = np.zeros((1, DPS), np.float32)                 # scatter to lane 0
    oh0[0, 0] = 1.0
    return dict(s25=s25, e24=e24, oh0=oh0)


def _body(br_ref, bi_ref, hbr_ref, hbi_ref, prev_ref, hd_ref,
          kdr_ref, kdi_ref, alt_ref, kp_ref, s25_ref, e24_ref, oh0_ref,
          out_ref, obh_r, obh_i, oprev, ohd,
          bext_r, bext_i, win_r, win_i, wind, psc, dsc,
          *, hb: int, dh: int, cplx: bool, clip: bool):
    """One tile: gt group rows -> [gt, out_w]."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        bext_r[0:hb, :] = hbr_ref[:, :]
        bext_i[0:hb, :] = hbi_ref[:, :]
        psc[:, :] = prev_ref[:, :]
        dsc[:, :] = hd_ref[:, :]

    _tail_core(br_ref[:], bi_ref[:], kdr_ref, kdi_ref, alt_ref, kp_ref,
               s25_ref, e24_ref, oh0_ref, out_ref, obh_r, obh_i, oprev,
               ohd, bext_r, bext_i, win_r, win_i, wind, psc, dsc,
               hb=hb, dh=dh, cplx=cplx, clip=clip)


def _tail_core(bw_r, bw_i, kdr_ref, kdi_ref, alt_ref, kp_ref,
               s25_ref, e24_ref, oh0_ref,
               out_ref, obh_r, obh_i, oprev, ohd,
               bext_r, bext_i, win_r, win_i, wind, psc, dsc,
               *, hb: int, dh: int, cplx: bool, clip: bool):
    """Decimator + discriminator + post-FIR over band group-row VALUES
    (bw_r/bw_i [gt, 400]) — shared by the two-kernel tail (_body) and
    the MONO single-kernel chains, whose front end leaves the band in
    VMEM scratch.  Scratch init (s == 0) is the CALLER's job."""
    gt = bw_r.shape[0]
    bext_r[hb:, :] = bw_r
    bext_i[hb:, :] = bw_i
    bvr = bext_r[:, :]
    bvi = bext_i[:, :]
    for i in range(hb + 1):
        win_r[:, i * GL:(i + 1) * GL] = bvr[i:i + gt, :]
        win_i[:, i * GL:(i + 1) * GL] = bvi[i:i + gt, :]
    wr = win_r[:]
    wi = win_i[:]
    kdr = kdr_ref[:]
    if cplx:
        kdi = kdi_ref[:]
        sig_r = _dot(wr, kdr) - _dot(wi, kdi)
        sig_i = _dot(wr, kdi) + _dot(wi, kdr)
        alt = alt_ref[:]                                  # (-1)^(g+u)
        sig_r = sig_r * alt
        sig_i = sig_i * alt
    else:
        sig_r = _dot(wr, kdr)
        sig_i = _dot(wi, kdr)

    # discriminator: prev = lane-shift within the row + carried last row
    s25 = s25_ref[:]
    e24 = e24_ref[:]
    oh0 = oh0_ref[:]
    rs_r = jnp.concatenate([psc[0:1, :], sig_r[:gt - 1, :]], axis=0)
    rs_i = jnp.concatenate([psc[1:2, :], sig_i[:gt - 1, :]], axis=0)
    prev_r = _dot(sig_r, s25) + _dot(_dot(rs_r, e24), oh0)
    prev_i = _dot(sig_i, s25) + _dot(_dot(rs_i, e24), oh0)
    dr = sig_r * prev_r + sig_i * prev_i
    di = sig_i * prev_r - sig_r * prev_i
    dem = kmath.atan2(di, dr) * _SCALE                    # [gt, 25]

    # post-FIR on demod windows
    dcat = jnp.concatenate([dsc[:, :], dem], axis=0)      # [dh+gt, 25]
    for i in range(dh + 1):
        wind[:, i * DPS:(i + 1) * DPS] = dcat[i:i + gt, :]
    out = _dot(wind[:], kp_ref[:])
    if clip:
        out = jnp.clip(out, -32768.0, 32767.0)
    out_ref[:, :] = out

    # carries: band tail rows, last sig row, demod tail rows
    bext_r[0:hb, :] = bvr[gt:gt + hb, :]
    bext_i[0:hb, :] = bvi[gt:gt + hb, :]
    psc[0:1, :] = sig_r[gt - 1:gt, :]
    psc[1:2, :] = sig_i[gt - 1:gt, :]
    dsc[:, :] = dcat[gt:gt + dh, :]
    obh_r[:, :] = bext_r[0:hb, :]
    obh_i[:, :] = bext_i[0:hb, :]
    oprev[:, :] = psc[:, :]
    ohd[:, :] = dsc[:, :]


def front_dispatch(front, fmt: str, dc_x, dc_y, hist, iq):
    """Route an input format to its fused-front-end entry point
    (group-major band output) — shared by the dsd_in/single chains."""
    if fmt == "cf32":
        return front.apply_iq(dc_x, dc_y, hist, iq, group_out=True)
    if fmt == "cf32w":
        return front.apply_interleaved(dc_x, dc_y, hist, iq,
                                       group_out=True)
    if fmt == "cs16":
        return front.apply_packed(dc_x, dc_y, hist, iq, group_out=True)
    return front.apply_packed2(dc_x, dc_y, hist, iq, fmt, group_out=True)


class PallasChanTail:
    """Fused band->output tail for the dsd_in / single chains.

    mode="dsd": real 477-tap 16x decimator (scanner/dsd_in.stage2_taps)
      -> freqdem -> 96/25 upsampler x 32767, int16-clipped; out_w=96.
    mode="single": channel mixer folded into the complex 838-tap
      decimator (scanner/single.channel_filter_taps) -> freqdem ->
      composed (hp * gain * deemph) 408-tap FIR; out_w=25.

    apply(band_hist, sig_prev, demod_hist, bw_r, bw_i [, rot]) ->
      (band_hist', sig_prev', demod_hist', out [G * out_w]) with
    band_hist [hb*400] c64, sig_prev c64 scalar (TRUE space; mode
    "single" passes rot = e^{-j w b0} so the kernel-space fold/unfold is
    exact), demod_hist [dh*25] f32.
    """

    def __init__(self, mode: str, channel: int | None = None,
                 audio_gain: float = 1.0, tile_g: int = 56,
                 interpret: bool = False):
        assert mode in ("dsd", "single")
        self.mode = mode
        self.tile_g = tile_g
        self.interpret = interpret
        sc = _shift_consts()
        self._s25, self._e24, self._oh0 = sc["s25"], sc["e24"], sc["oh0"]
        if mode == "dsd":
            from sdr_pmr446_tpu.scanner.dsd_in import stage2_taps, up_taps
            self.hb, self.dh, self.out_w = 2, 2, 96
            self.kd_r = _dec_matrix(stage2_taps(), self.hb).astype(
                np.float32)
            self.kd_i = None
            self.alt = None
            self.kp = _post_matrix(up_taps(), 96, 25, self.dh,
                                   32767.0, 96).astype(np.float32)
            self.omega = None
        else:
            from sdr_pmr446_tpu.scanner.single import channel_filter_taps
            from sdr_pmr446_tpu.taps import design as D
            assert channel is not None
            self.hb, self.dh, self.out_w = 3, 17, 25
            h = np.asarray(channel_filter_taps(), np.float64)
            f_off = (channel - 1) * C.CHANNEL_WIDTH_HZ - 93_750.0
            self.omega = 2.0 * np.pi * f_off / C.SDR_RESAMPLERATE
            # mixer fold: sig[f] = sum_w K16[0,w] band_ext[16f+w-(P-1)]
            #   * e^{-j w_mix (b0 + 16f + w - (P-1))}
            # = rot * (-1)^f * sum_w (K16[0,w] e^{-j w_mix (w-(P-1))})
            #   * band_ext[...]
            # (m = 2*channel - 17 is always odd, so e^{-j w_mix 16 f} =
            # (-1)^f — the alt constant; rot = e^{-j w_mix b0} is the
            # caller-side carried-prev rotation)
            km = _kernel_matrix(tuple(h.tolist()), 1, 16)[0]  # [P]
            p_len = km.shape[0]
            ph = np.exp(-1j * self.omega
                        * (np.arange(p_len) - (p_len - 1.0)))
            hm_k = km * ph
            wb = (self.hb + 1) * GL
            kd_c = np.zeros((wb, DPS), np.complex128)
            for u in range(DPS):
                j0 = self.hb * GL + 16 * u - (p_len - 1)
                kd_c[j0:j0 + p_len, u] = hm_k
            self.kd_r = kd_c.real.astype(np.float32)
            self.kd_i = kd_c.imag.astype(np.float32)
            hp = D.ctcss_hp_taps()
            de = D.deemph_fir_equiv()
            comp = np.convolve(hp, de)
            self.kp = _fir_matrix(tuple(comp.tolist()), self.dh,
                                  float(audio_gain)).astype(np.float32)

    def init_state(self):
        return (jnp.zeros((self.hb * GL,), jnp.complex64),
                jnp.zeros((), jnp.complex64),
                jnp.zeros((self.dh * DPS,), jnp.float32))

    def _alt(self, gt: int) -> np.ndarray:
        a = np.fromfunction(lambda g, u: 1.0 - 2.0 * ((g + u) % 2),
                            (gt, DPS))
        return a.astype(np.float32)

    def apply(self, band_hist: jax.Array, sig_prev: jax.Array,
              demod_hist: jax.Array, bw_r: jax.Array, bw_i: jax.Array,
              rot: jax.Array | None = None):
        g_total = bw_r.shape[0]
        gt = pick_tile(g_total, self.tile_g)
        n_tiles = g_total // gt
        cplx = self.mode == "single"
        if cplx:
            assert rot is not None
            prev_k = sig_prev * jnp.conj(rot)
        else:
            prev_k = sig_prev
        hb, dh = self.hb, self.dh
        hbr = jnp.real(band_hist).astype(jnp.float32).reshape(hb, GL)
        hbi = jnp.imag(band_hist).astype(jnp.float32).reshape(hb, GL)
        # prev rows: the carried sample sits at lane 24 (where e24 looks
        # after the sublane shift)
        lane = np.zeros((1, DPS), np.float32)
        lane[0, DPS - 1] = 1.0
        prev_ri = jnp.stack([jnp.real(prev_k),
                             jnp.imag(prev_k)]).astype(jnp.float32)
        prev_rows = prev_ri[:, None] * lane                # [2, 25]
        hd = demod_hist.reshape(dh, DPS)

        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        grid_block = lambda w: pl.BlockSpec((gt, w), lambda s: (s, 0),
                                            memory_space=pltpu.VMEM)
        whole = lambda shape: pl.BlockSpec(
            shape, lambda s: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        wb = (hb + 1) * GL
        wp = (dh + 1) * DPS
        body = functools.partial(_body, hb=hb, dh=dh, cplx=cplx,
                                 clip=self.mode == "dsd")
        kdi = (jnp.asarray(self.kd_i) if cplx
               else jnp.zeros((1, 1), jnp.float32))
        alt = (jnp.asarray(self._alt(gt)) if cplx
               else jnp.zeros((1, 1), jnp.float32))
        out, obh_r, obh_i, oprev, ohd = pl.pallas_call(
            body,
            grid=(n_tiles,),
            in_specs=[
                grid_block(GL), grid_block(GL),      # bw re/im
                whole((hb, GL)), whole((hb, GL)),    # band hist
                whole((2, DPS)),                     # prev rows
                whole((dh, DPS)),                    # demod hist
                vmem(), vmem(), vmem(), vmem(),      # kd_r, kd_i, alt, kp
                vmem(), vmem(), vmem(),              # s25, e24, oh0
            ],
            out_specs=[
                grid_block(self.out_w),
                whole((hb, GL)), whole((hb, GL)),
                whole((2, DPS)), whole((dh, DPS)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g_total, self.out_w), jnp.float32),
                jax.ShapeDtypeStruct((hb, GL), jnp.float32),
                jax.ShapeDtypeStruct((hb, GL), jnp.float32),
                jax.ShapeDtypeStruct((2, DPS), jnp.float32),
                jax.ShapeDtypeStruct((dh, DPS), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((gt + hb, GL), jnp.float32),
                pltpu.VMEM((gt + hb, GL), jnp.float32),
                pltpu.VMEM((gt, wb), jnp.float32),
                pltpu.VMEM((gt, wb), jnp.float32),
                pltpu.VMEM((gt, wp), jnp.float32),
                pltpu.VMEM((2, DPS), jnp.float32),
                pltpu.VMEM((dh, DPS), jnp.float32),
            ],
            interpret=self.interpret,
        )(bw_r, bw_i, hbr, hbi, prev_rows, hd,
          jnp.asarray(self.kd_r), kdi, alt, jnp.asarray(self.kp),
          jnp.asarray(self._s25), jnp.asarray(self._e24),
          jnp.asarray(self._oh0))

        new_bh = jax.lax.complex(obh_r.reshape(-1), obh_i.reshape(-1))
        prev_k_new = jax.lax.complex(oprev[0, DPS - 1], oprev[1, DPS - 1])
        if cplx:
            # unfold: the kernel's last sig row is in kernel space (no
            # global phase, (-1)^(g+u) applied) — true = rot * kernel;
            # the alternation is self-consistent because G per step is
            # even (K % 8 == 0) and the global phase advances with b0
            new_prev = prev_k_new * rot
        else:
            new_prev = prev_k_new
        return (new_bh, new_prev, ohd.reshape(-1),
                out.reshape(g_total * self.out_w))


# ---------------------------------------------------------------------------
# MONO chains: front end + tail in ONE kernel — the band never leaves VMEM
# ---------------------------------------------------------------------------

from sdr_pmr446_tpu.kernels import front_end as FE


def _mono_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, hbr_ref,
                     hbi_ref, prev_ref, hd_ref, yh_r, yh_i, xwrow, ysc,
                     bext_r, bext_i, psc, dsc, hb):
    @pl.when(s == 0)
    def _():
        yh_r[:, :] = fhr_ref[:, :]
        yh_i[:, :] = fhi_ref[:, :]
        xwrow[:, :] = cx_ref[:, :]
        ysc[:, :] = cy_ref[:, :]
        bext_r[0:hb, :] = hbr_ref[:, :]
        bext_i[0:hb, :] = hbi_ref[:, :]
        psc[:, :] = prev_ref[:, :]
        dsc[:, :] = hd_ref[:, :]


def _mono_body_ilv(xw_ref, fhr_ref, fhi_ref, cx_ref, cy_ref,
                   hbr_ref, hbi_ref, prev_ref, hd_ref,
                   wcr_ref, wci_ref, u0_ref, pj_ref, tt_ref, pvec_ref,
                   k2_ref, el_ref, ewr_ref, ewi_ref,
                   kdr_ref, kdi_ref, alt_ref, kp_ref, s25_ref, e24_ref,
                   oh0_ref,
                   out_ref, ohr, ohi, ocy, obh_r, obh_i, oprev, ohd,
                   yh_r, yh_i, xwrow, ysc, gw, win_g, bwr_sc, bwi_sc,
                   bext_r, bext_i, win_r, win_i, wind, psc, dsc,
                   *, hb: int, dh: int, cplx: bool, clip: bool):
    """cf32w wire -> DC + resampler (front_end group math, band into VMEM
    scratch) -> decimator + discriminator + post-FIR (_tail_core): the
    WHOLE dsd/single chain in one kernel launch; only the wire read and
    the tiny output leave HBM."""
    tile = xw_ref.shape[0]
    s = pl.program_id(0)
    _mono_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, hbr_ref,
                     hbi_ref, prev_ref, hd_ref, yh_r, yh_i, xwrow, ysc,
                     bext_r, bext_i, psc, dsc, hb)

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
    _tail_core(bwr_sc[:, :], bwi_sc[:, :], kdr_ref, kdi_ref, alt_ref,
               kp_ref, s25_ref, e24_ref, oh0_ref, out_ref, obh_r, obh_i,
               oprev, ohd, bext_r, bext_i, win_r, win_i, wind, psc, dsc,
               hb=hb, dh=dh, cplx=cplx, clip=clip)


def _mono_body_cs16(xw_ref, fhr_ref, fhi_ref, cx_ref, cy_ref,
                    hbr_ref, hbi_ref, prev_ref, hd_ref,
                    w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref,
                    k2_ref, el_ref,
                    kdr_ref, kdi_ref, alt_ref, kp_ref, s25_ref, e24_ref,
                    oh0_ref,
                    out_ref, ohr, ohi, ocy, obh_r, obh_i, oprev, ohd,
                    yh_r, yh_i, xwrow, ysc, gw, win_g, bwr_sc, bwi_sc,
                    bext_r, bext_i, win_r, win_i, wind, psc, dsc,
                    *, hb: int, dh: int, cplx: bool, clip: bool):
    """cs16 wire variant (in-kernel decode, front_end._decode_cs16)."""
    tile = xw_ref.shape[0]
    s = pl.program_id(0)
    _mono_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, hbr_ref,
                     hbi_ref, prev_ref, hd_ref, yh_r, yh_i, xwrow, ysc,
                     bext_r, bext_i, psc, dsc, hb)

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
    _tail_core(bwr_sc[:, :], bwi_sc[:, :], kdr_ref, kdi_ref, alt_ref,
               kp_ref, s25_ref, e24_ref, oh0_ref, out_ref, obh_r, obh_i,
               oprev, ohd, bext_r, bext_i, win_r, win_i, wind, psc, dsc,
               hb=hb, dh=dh, cplx=cplx, clip=clip)


def _mono_body_pk2(xw_ref, fhr_ref, fhi_ref, cx_ref, cy_ref,
                   hbr_ref, hbi_ref, prev_ref, hd_ref,
                   w1_ref, u0_ref, pj_ref, tt_ref, pvec_ref,
                   k2_ref, el_ref, g0_ref, g1_ref,
                   kdr_ref, kdi_ref, alt_ref, kp_ref, s25_ref, e24_ref,
                   oh0_ref,
                   out_ref, ohr, ohi, ocy, obh_r, obh_i, oprev, ohd,
                   yh_r, yh_i, xwrow, ysc, gw, win_g, bwr_sc, bwi_sc,
                   bext_r, bext_i, win_r, win_i, wind, psc, dsc,
                   *, hb: int, dh: int, cplx: bool, clip: bool,
                   signed: bool):
    """cu8/cs8 wide-row variant (two samples per transport word)."""
    tile = xw_ref.shape[0]
    s = pl.program_id(0)
    _mono_front_init(s, fhr_ref, fhi_ref, cx_ref, cy_ref, hbr_ref,
                     hbi_ref, prev_ref, hd_ref, yh_r, yh_i, xwrow, ysc,
                     bext_r, bext_i, psc, dsc, hb)

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
    _tail_core(bwr_sc[:, :], bwi_sc[:, :], kdr_ref, kdi_ref, alt_ref,
               kp_ref, s25_ref, e24_ref, oh0_ref, out_ref, obh_r, obh_i,
               oprev, ohd, bext_r, bext_i, win_r, win_i, wind, psc, dsc,
               hb=hb, dh=dh, cplx=cplx, clip=clip)


class PallasMonoChain:
    """The WHOLE dsd_in / single chain as ONE kernel launch.

    Composes the fused front end (in-kernel DC blocker + wire decode +
    25/128 resampler, kernels/front_end.py group math) with _tail_core in
    a single pallas_call: the band group rows live only in VMEM scratch,
    so the chain's HBM traffic is the wire read plus the (tiny) 48 kHz
    PCM / 12.5 kHz audio write — the input-read speed of light
    (8/4/2 B per input sample for cf32w/cs16/cu8).

    Same carried state as (PallasFrontEnd, PallasChanTail) concatenated;
    bit-identical math to the two-kernel engine (the band merely skips
    its HBM round trip) — test-gated exact.
    """

    def __init__(self, mode: str, fmt: str, channel: int | None = None,
                 audio_gain: float = 1.0, tile_rows: int = 448,
                 interpret: bool = False):
        assert fmt in ("cf32", "cf32w", "cs16", "cu8", "cs8")
        self.mode = mode
        self.fmt = fmt
        self.wide = fmt in ("cu8", "cs8")
        self.tile_rows = tile_rows
        self.interpret = interpret
        self.tail = PallasChanTail(mode, channel=channel,
                                   audio_gain=audio_gain,
                                   interpret=interpret)
        self.fcn = (FE._row_consts_wide() if self.wide
                    else FE._row_consts())
        self.front_hist_len = FE.HIST_W if self.wide else FE.HIST
        self.omega = self.tail.omega

    # state: (dc_x, dc_y, front_hist) + (band_hist, sig_prev, demod_hist)
    def init_state(self):
        front = (jnp.zeros((), jnp.complex64), jnp.zeros((), jnp.complex64),
                 jnp.zeros((self.front_hist_len,), jnp.complex64))
        return front + self.tail.init_state()

    def apply(self, dc_x, dc_y, front_hist, band_hist, sig_prev,
              demod_hist, wire, rot=None):
        """wire: the 2-D row layout ([rows, 256] cf32w / [rows, 128]
        cs16/cu8) or [T] complex64 (cf32 — interleaved in one XLA pass).
        Returns (dc_x', dc_y', front_hist', band_hist', sig_prev',
        demod_hist', out [G*out_w] f32)."""
        from sdr_pmr446_tpu.ops.decode import decode_planes
        fmt = self.fmt
        tl = self.tail
        cn = self.fcn
        m = FE.M
        cplx = self.mode == "single"
        if cplx:
            assert rot is not None
            prev_k = sig_prev * jnp.conj(rot)
        else:
            prev_k = sig_prev

        # stage wire rows + the decoded-x[-1] carry row per format
        if fmt == "cf32":
            xw = jnp.stack([jnp.real(wire), jnp.imag(wire)],
                           axis=-1).reshape(-1).astype(jnp.float32)
            wire = xw.reshape(wire.shape[-1] // m, 2 * m)
            fmt = "cf32w"
        if fmt == "cf32w":
            rows, width, x_width = wire.shape[0], m, 2 * m
            body = _mono_body_ilv
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
            body = _mono_body_cs16
            cxv = jnp.stack([jnp.real(dc_x),
                             jnp.imag(dc_x)]).astype(jnp.float32)
            sel = np.zeros((1, m), np.float32)
            sel[0, m - 1] = 1.0
            cx_row = cxv[:, None] * sel
            fcon = (cn["w1"],)
            fcon_tail = ()
        else:
            rows, width, x_width = wire.shape[0], FE.W2, m
            body = functools.partial(_mono_body_pk2, signed=fmt == "cs8")
            cxv = jnp.stack([jnp.real(dc_x),
                             jnp.imag(dc_x)]).astype(jnp.float32)
            sel = np.zeros((1, FE.W2), np.float32)
            sel[0, FE.W2 - 1] = 1.0
            cx_row = cxv[:, None] * sel
            fcon = (cn["w1"],)
            fcon_tail = (cn["g0"], cn["g1"])

        row_mult = 64 if self.wide else 128
        tile = FE.pick_tile_group(rows, self.tile_rows, row_mult)
        n_tiles = rows // tile
        gt = tile * width // (16 * m)
        g_total = rows * width // (16 * m)
        hist_rows = FE.HIST_ROWS_W if self.wide else FE.HIST_ROWS
        tt, pvec = FE._tile_consts(tile, width)
        k2 = FE._row_consts()["k2"]           # narrow k2, both widths
        hb, dh, out_w = tl.hb, tl.dh, tl.out_w
        wb = (hb + 1) * GL
        wp = (dh + 1) * DPS

        fhr = jnp.real(front_hist).astype(jnp.float32).reshape(hist_rows,
                                                               width)
        fhi = jnp.imag(front_hist).astype(jnp.float32).reshape(hist_rows,
                                                               width)
        cy = FE.PallasFrontEnd._cy_rows(dc_y)
        hbr = jnp.real(band_hist).astype(jnp.float32).reshape(hb, GL)
        hbi = jnp.imag(band_hist).astype(jnp.float32).reshape(hb, GL)
        lane = np.zeros((1, DPS), np.float32)
        lane[0, DPS - 1] = 1.0
        prev_ri = jnp.stack([jnp.real(prev_k),
                             jnp.imag(prev_k)]).astype(jnp.float32)
        prev_rows = prev_ri[:, None] * lane
        hd = demod_hist.reshape(dh, DPS)
        kdi = (jnp.asarray(tl.kd_i) if cplx
               else jnp.zeros((1, 1), jnp.float32))
        alt = (jnp.asarray(tl._alt(gt)) if cplx
               else jnp.zeros((1, 1), jnp.float32))

        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        grid_block = lambda w: pl.BlockSpec((tile, w), lambda s: (s, 0),
                                            memory_space=pltpu.VMEM)
        gout_block = pl.BlockSpec((gt, out_w), lambda s: (s, 0),
                                  memory_space=pltpu.VMEM)
        whole = lambda shape: pl.BlockSpec(
            shape, lambda s: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        bodyp = functools.partial(body, hb=hb, dh=dh, cplx=cplx,
                                  clip=self.mode == "dsd")
        (out, ohr, ohi, ocy, obh_r, obh_i, oprev, ohd) = pl.pallas_call(
            bodyp,
            grid=(n_tiles,),
            in_specs=[
                grid_block(x_width),               # wire rows
                whole((hist_rows, width)), whole((hist_rows, width)),
                whole(cx_row.shape), whole((2, m)),
                whole((hb, GL)), whole((hb, GL)),
                whole((2, DPS)), whole((dh, DPS)),
            ] + [vmem()] * (len(fcon) + 6 + len(fcon_tail) + 7),
            out_specs=[
                gout_block,
                whole((hist_rows, width)), whole((hist_rows, width)),
                whole((2, m)),
                whole((hb, GL)), whole((hb, GL)),
                whole((2, DPS)), whole((dh, DPS)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g_total, out_w), jnp.float32),
                jax.ShapeDtypeStruct((hist_rows, width), jnp.float32),
                jax.ShapeDtypeStruct((hist_rows, width), jnp.float32),
                jax.ShapeDtypeStruct((2, m), jnp.float32),
                jax.ShapeDtypeStruct((hb, GL), jnp.float32),
                jax.ShapeDtypeStruct((hb, GL), jnp.float32),
                jax.ShapeDtypeStruct((2, DPS), jnp.float32),
                jax.ShapeDtypeStruct((dh, DPS), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((hist_rows, width), jnp.float32),   # yh_r
                pltpu.VMEM((hist_rows, width), jnp.float32),   # yh_i
                pltpu.VMEM(cx_row.shape, jnp.float32),         # xwrow
                pltpu.VMEM((2, m), jnp.float32),               # ysc
                pltpu.VMEM((1, 16 * m), jnp.float32),          # gw
                pltpu.VMEM((gt, FE.W_PAD), jnp.float32),       # win_g
                pltpu.VMEM((gt, GL), jnp.float32),             # bwr_sc
                pltpu.VMEM((gt, GL), jnp.float32),             # bwi_sc
                pltpu.VMEM((gt + hb, GL), jnp.float32),        # bext_r
                pltpu.VMEM((gt + hb, GL), jnp.float32),        # bext_i
                pltpu.VMEM((gt, wb), jnp.float32),             # win_r
                pltpu.VMEM((gt, wb), jnp.float32),             # win_i
                pltpu.VMEM((gt, wp), jnp.float32),             # wind
                pltpu.VMEM((2, DPS), jnp.float32),             # psc
                pltpu.VMEM((dh, DPS), jnp.float32),            # dsc
            ],
            interpret=self.interpret,
        )(wire, fhr, fhi, cx_row, cy,
          hbr, hbi, prev_rows, hd,
          *(jnp.asarray(c) for c in fcon),
          jnp.asarray(cn["u0"]), jnp.asarray(cn["pj"]),
          jnp.asarray(tt), jnp.asarray(pvec), jnp.asarray(k2),
          jnp.asarray(cn["e_last"]),
          *(jnp.asarray(c) for c in fcon_tail),
          jnp.asarray(tl.kd_r), kdi, alt, jnp.asarray(tl.kp),
          jnp.asarray(tl._s25), jnp.asarray(tl._e24),
          jnp.asarray(tl._oh0))

        new_dc_y = jax.lax.complex(ocy[0, 0], ocy[1, 0])
        new_fh = jax.lax.complex(ohr.reshape(-1), ohi.reshape(-1))
        new_bh = jax.lax.complex(obh_r.reshape(-1), obh_i.reshape(-1))
        prev_k_new = jax.lax.complex(oprev[0, DPS - 1], oprev[1, DPS - 1])
        new_prev = prev_k_new * rot if cplx else prev_k_new
        # new x[-1]: the block's last raw sample (format-specific scalars)
        if fmt == "cf32w":
            new_dc_x = jax.lax.complex(wire[rows - 1, 2 * m - 2],
                                       wire[rows - 1, 2 * m - 1])
        elif fmt == "cs16":
            xr_l, xi_l = decode_planes(wire[rows - 1, m - 1:m], "cs16")
            new_dc_x = jax.lax.complex(xr_l[0], xi_l[0])
        else:
            xr_l, xi_l = decode_planes(wire[rows - 1, m - 1:m], self.fmt)
            new_dc_x = jax.lax.complex(xr_l[1], xi_l[1])
        return (new_dc_x, new_dc_y, new_fh, new_bh, new_prev,
                ohd.reshape(-1), out.reshape(g_total * out_w))
