"""Faithful-mode scanner: exact reference audio-path semantics.

The fast chain (scanner/chain.py) runs demod + audio filters continuously on
all 16 channels and selects afterwards — equivalent except during tune/
detune/change transients (documented deviation).  This module provides the
*exact* semantics as a validation mode: one lax.scan over sub-chunks that
mirrors the C main loop structure (src/sdr_pmr446.c:827-908) literally:

  - the squelch FSM decides first;
  - freqdem state is a single carried sample, reset on detune (:866) and
    carried across lock_mode_max channel switches (reference behavior);
  - ONE set of audio filters (HP/delay/DC/de-emphasis/LP) processes only the
    active channel's sub-chunk, state frozen while scanning — including the
    stale-history transients the reference exhibits after switches;
  - the CTCSS detector consumes the gated, shared-DC-blocked LP branch.

Input is the channelized matrix from the shared front-end (DC block +
resampler + PFB are continuous in the reference too).  Differentially tested
against the per-sample oracle to f32 tolerance INCLUDING transitions
(tests/test_faithful.py).  ~K small convolutions per step — a validation
tool, not the throughput path.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.taps import design as D
from sdr_pmr446_tpu.ops import fir, iir
from sdr_pmr446_tpu.ops.resample import PolyResampler
from sdr_pmr446_tpu.ops.pfb import PFBChannelizer
from sdr_pmr446_tpu.scanner.chain import RuntimeParams
from sdr_pmr446_tpu.scanner.fsm import (ctcss_tables, ctcss_subchunk_sums,
                                        ctcss_detect)


class FaithfulState(NamedTuple):
    # front-end (shared with the fast chain)
    dc_x: jax.Array
    dc_y: jax.Array
    resamp_hist: jax.Array
    pfb_hist: jax.Array
    frame_parity: jax.Array
    # gated single-stream audio path (the reference's shared filter objects)
    fm_prev: jax.Array         # c64 []  freqdem state (reset on detune)
    hp_hist: jax.Array         # f32 [376]
    delay_hist: jax.Array      # f32 [188]
    dc2_x: jax.Array           # f32 []  ctcss_dcblock state
    dc2_y: jax.Array
    deemph_x: jax.Array        # f32 []  de-emphasis IIR x[-1], y[-1]
    deemph_y: jax.Array
    lp_hist: jax.Array         # f32 [102]
    # control + detector
    fsm_state: jax.Array
    active_chan: jax.Array
    rssi: jax.Array
    ct_count: jax.Array
    ct_carry: jax.Array
    ct_detected: jax.Array
    ct_max_idx: jax.Array
    ct_freq: jax.Array


class FaithfulOutputs(NamedTuple):
    audio: jax.Array          # f32 [K, ns]
    audio_valid: jax.Array    # bool [K]
    active_chan: jax.Array    # i32 [K]
    rel_rssi: jax.Array       # f32 [K]
    ct_detected: jax.Array    # bool [K]
    ct_max_idx: jax.Array     # i32 [K]


class FaithfulScannerChain:
    """(state, iq[T], params) -> (state, FaithfulOutputs); exact semantics."""

    def __init__(self, subchunks_per_step: int = 5,
                 lowpass: bool = False):
        self.K = subchunks_per_step
        self.lowpass = lowpass
        self.resampler = PolyResampler(D.resampler_taps(), C.RESAMP_L,
                                       C.RESAMP_M)
        self.pfb = PFBChannelizer(D.pfb_prototype())
        self.hp_taps = D.ctcss_hp_taps().astype(np.float32)
        self.lp_taps = D.audio_lp_taps().astype(np.float32)
        b, a = D.deemph_iir_coeffs()
        self.de_b0, self.de_b1, self.de_a1 = float(b[0]), float(b[1]), float(a[1])
        from sdr_pmr446_tpu.runtime.fuse import fused_steps
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._multi_step = fused_steps(self._step_impl)

    @property
    def input_len(self) -> int:
        return self.K * C.SUBCHUNK_IN

    def init_state(self) -> FaithfulState:
        return FaithfulState(
            dc_x=jnp.zeros((), jnp.complex64),
            dc_y=jnp.zeros((), jnp.complex64),
            resamp_hist=self.resampler.init(),
            pfb_hist=jnp.zeros((self.pfb.hist_len,), jnp.complex64),
            frame_parity=jnp.zeros((), jnp.int32),
            fm_prev=jnp.zeros((), jnp.complex64),
            hp_hist=fir.fir_init(C.HP_AUDIO_FILT_TAPS),
            delay_hist=fir.delay_init(C.CTCSS_DELAY),
            dc2_x=jnp.zeros(()), dc2_y=jnp.zeros(()),
            deemph_x=jnp.zeros(()), deemph_y=jnp.zeros(()),
            lp_hist=fir.fir_init(C.LP_AUDIO_FILT_TAPS),
            fsm_state=jnp.zeros((), jnp.int32),
            active_chan=jnp.full((), -1, jnp.int32),
            rssi=jnp.zeros(()),
            ct_count=jnp.zeros((), jnp.int32),
            ct_carry=jnp.zeros((C.CTCSS_NUM_FREQS,), jnp.complex64),
            ct_detected=jnp.zeros((), jnp.bool_),
            ct_max_idx=jnp.zeros((), jnp.int32),
            ct_freq=jnp.full((), -1.0, jnp.float32),
        )

    def step(self, state: FaithfulState, iq: jax.Array,
             params: RuntimeParams):
        return self._step(state, iq, params)

    def multi_step(self, state: FaithfulState, iqs: jax.Array,
                   params: RuntimeParams):
        """S stacked blocks in one dispatch, outputs flattened to
        [S*K, ...] — decisions equal to S step() calls exactly, floats to
        f32 rounding (runtime/fuse.py)."""
        return self._multi_step(state, iqs, params)

    # ------------------------------------------------------------------
    def _step_impl(self, state: FaithfulState, iq: jax.Array,
                   params: RuntimeParams):
        K, ns = self.K, C.SUBCHUNK_AUDIO

        # shared front-end (continuous in the reference too)
        (dc_x, dc_y), x = iir.dc_blocker_apply(
            (state.dc_x, state.dc_y), iq, C.DC_BLOCK_ALPHA)
        rhist, band = self.resampler.apply(state.resamp_hist, x)
        (phist, parity), chan = self.pfb.apply(
            (state.pfb_hist, state.frame_parity), band)
        chan_blocks = jnp.moveaxis(
            chan.reshape(C.NUM_CHANNELS, K, ns), 0, 1)       # [K, 16, ns]
        # reference RSSI = 20log10(mean|x|) per channel per sub-chunk
        rssi_k = jnp.moveaxis(20.0 * jnp.log10(jnp.maximum(jnp.mean(
            jnp.abs(chan.reshape(C.NUM_CHANNELS, K, ns)), axis=-1),
            1e-30)), 0, 1)                                   # [K, 16]

        carry_f, (audio, valid, act, rel, det, tidx) = faithful_scan(
            state, rssi_k, chan_blocks, params,
            self.hp_taps, self.lp_taps,
            (self.de_b0, self.de_b1, self.de_a1), self.lowpass)

        new_state = FaithfulState(
            dc_x=dc_x, dc_y=dc_y, resamp_hist=rhist, pfb_hist=phist,
            frame_parity=parity,
            fm_prev=carry_f[0], hp_hist=carry_f[1], delay_hist=carry_f[2],
            dc2_x=carry_f[3], dc2_y=carry_f[4], deemph_x=carry_f[5],
            deemph_y=carry_f[6], lp_hist=carry_f[7], fsm_state=carry_f[8],
            active_chan=carry_f[9], rssi=rel[-1], ct_count=carry_f[10],
            ct_carry=carry_f[11], ct_detected=carry_f[12],
            ct_max_idx=carry_f[13], ct_freq=carry_f[14],
        )
        return new_state, FaithfulOutputs(audio, valid, act, rel, det, tidx)


def faithful_scan(state: FaithfulState, rssi_k: jax.Array,
                  chan_blocks: jax.Array, params: RuntimeParams,
                  hp_taps: np.ndarray, lp_taps: np.ndarray,
                  de_coeffs, lowpass: bool):
    """The gated audio-path + FSM + CTCSS scan over [K, 16, ns] sub-chunk
    matrices — the exact reference main-loop semantics, shared between the
    single-chip chain and the sharded variant (the sharded chain gathers
    chan_blocks/rssi_k from the time shards and runs this replicated)."""
    K, nch, ns = chan_blocks.shape
    n_win = C.CTCSS_BLOCK_SIZE
    de_b0, de_b1, de_a1 = de_coeffs

    mask = params.channel_mask
    nch_en = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    tables = ctcss_tables(ns)
    freqs = tables[3]
    hp_flip = jnp.asarray(np.asarray(hp_taps)[::-1].copy())
    lp_flip = jnp.asarray(np.asarray(lp_taps)[::-1].copy())

    def scan_step(carry, inp):
        (fm_prev, hp_h, dl_h, d2x, d2y, dex, dey, lp_h,
         st, act, cnt, cc, det, tidx, tfreq) = carry
        rssi_c, chan_c = inp                             # [16], [16, ns]

        # --- FSM (src/sdr_pmr446.c:827-874) ---
        rm = jnp.where(mask, rssi_c, -jnp.inf)
        max_ch = jnp.argmax(rm).astype(jnp.int32)
        avg = (jnp.sum(jnp.where(mask, rssi_c, 0.0))
               / nch_en.astype(jnp.float32))
        rel = rm[max_ch] - avg
        scanning = st == 0
        tune = scanning & (rel > params.squelch_level)
        in_tuned = jnp.logical_not(scanning)
        do_change = in_tuned & params.lock_max & (act != max_ch)
        act1 = jnp.where(tune | do_change, max_ch, act)
        detune = in_tuned & (rel < params.squelch_level
                             - C.SQUELCH_HYSTERESIS_DB)
        act2 = jnp.where(detune, -1, act1)
        st2 = jnp.where(tune, 1,
                        jnp.where(detune, 0, st)).astype(jnp.int32)
        # detune resets freqdem + detector (:866-867)
        fm_prev = jnp.where(detune, 0.0 + 0.0j, fm_prev)
        cnt = jnp.where(detune, 0, cnt)
        cc = jnp.where(detune, 0.0 + 0.0j, cc)
        det_r = jnp.where(detune, False, det)
        tidx_r = jnp.where(detune, 0, tidx)
        tfreq = jnp.where(detune, 0.0, tfreq)
        is_active = act2 >= 0

        # --- gated audio path (:876-908) ---
        xc = chan_c[jnp.clip(act2, 0, C.NUM_CHANNELS - 1)]   # [ns] c64
        xp = jnp.concatenate([fm_prev[None], xc[:-1]])
        dmd = xc * jnp.conj(xp)
        tmp1 = (jnp.arctan2(dmd.imag, dmd.real)
                * (1.0 / (2.0 * math.pi * C.FM_KF))).astype(jnp.float32)

        hp_in = jnp.concatenate([hp_h, tmp1])
        tmp2 = fir._correlate_valid(hp_in, hp_flip)
        dl_in = jnp.concatenate([dl_h, tmp1])
        delayed = dl_in[:ns]
        lp_branch = delayed - tmp2
        # ctcss_dcblock (gated, shared — :606)
        (n_d2x, n_d2y), lp_dcb = iir.dc_blocker_apply(
            (d2x, d2y), lp_branch, C.DC_BLOCK_ALPHA, chunk=256)
        audio = tmp2 * params.audio_gain
        # de-emphasis one-pole (gated, shared — :898)
        x1 = jnp.concatenate([dex[None], audio[:-1]])
        z = de_b0 * audio + de_b1 * x1
        audio_de = iir.first_order_scan(z, -de_a1, dey, chunk=256)
        if lowpass:
            lp_in = jnp.concatenate([lp_h, audio_de])
            audio_out = fir._correlate_valid(lp_in, lp_flip)
            n_lp_h = jnp.where(is_active, lp_in[ns:], lp_h)
        else:
            audio_out = audio_de
            n_lp_h = lp_h

        # --- CTCSS detector on the gated stream (:610) ---
        # (shared window math: scanner/fsm.py is the single source)
        s_pre, s_suf, has_b = ctcss_subchunk_sums(lp_dcb, cnt, tables)
        y = cc + s_pre
        power = y.real ** 2 + y.imag ** 2
        newdet, pidx = ctcss_detect(power)
        upd = is_active & has_b
        det2 = jnp.where(upd, newdet, det_r)
        tidx2 = jnp.where(upd, pidx, tidx_r)
        cc2 = jnp.where(is_active,
                        jnp.where(has_b, s_suf, cc + s_pre), cc)
        cnt2 = jnp.where(is_active, (cnt + ns) % n_win, cnt)
        tfreq2 = jnp.where(is_active, freqs[tidx2], tfreq)

        # freeze all audio state unless active (the filters never ran)
        n_fm = jnp.where(is_active, xc[-1], fm_prev)
        n_hp = jnp.where(is_active, hp_in[ns:], hp_h)
        n_dl = jnp.where(is_active, dl_in[ns:], dl_h)
        n_d2x = jnp.where(is_active, n_d2x, d2x)
        n_d2y = jnp.where(is_active, n_d2y, d2y)
        n_dex = jnp.where(is_active, audio[-1], dex)
        n_dey = jnp.where(is_active, audio_de[-1], dey)

        carry_out = (n_fm, n_hp, n_dl, n_d2x, n_d2y, n_dex, n_dey,
                     n_lp_h, st2, act2, cnt2, cc2, det2, tidx2, tfreq2)
        outs = (jnp.where(is_active, audio_out,
                          jnp.zeros_like(audio_out)),
                is_active, act2, rel, det2, tidx2)
        return carry_out, outs

    carry0 = (state.fm_prev, state.hp_hist, state.delay_hist,
              state.dc2_x, state.dc2_y, state.deemph_x, state.deemph_y,
              state.lp_hist, state.fsm_state, state.active_chan,
              state.ct_count, state.ct_carry, state.ct_detected,
              state.ct_max_idx, state.ct_freq)
    return jax.lax.scan(scan_step, carry0, (rssi_k, chan_blocks))
