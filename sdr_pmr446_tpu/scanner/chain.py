"""The full 16-channel PMR446 scanner as one jittable block step.

TPU-first inversion of the reference's pull-based main loop
(src/sdr_pmr446.c:788-931): a pure function

    (state, iq_block[T_in], runtime_params) -> (state', StepOutputs)

where every per-sample stage runs densely over the whole block (and over ALL
16 channels — selecting the active channel afterwards is cheaper on TPU than
branching, SURVEY.md §7 "hard parts"), and only the per-sub-chunk squelch/
CTCSS decisions run as a lax.scan.

Documented deviations from the reference (all transition transients, bounded
by one filter length per tune/detune/channel-change event; steady-state
output is equivalent):
  - freqdem, HP/LP/de-emphasis filters and the CTCSS-branch DC blocker run
    continuously per channel instead of being fed only the active channel's
    gated stream, so after a transition their histories hold the same
    channel's recent samples rather than the previous channel's stale ones.
  - de-emphasis runs as its exact-to-f32 FIR expansion (the reference itself
    ships a FIR de-emphasis variant, src/sdr_pmr446.c:42-44,457-465).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.taps import design as D
from sdr_pmr446_tpu.ops import fir, iir, fm, rssi as rssi_op, spectrogram
from sdr_pmr446_tpu.ops import decode as decode_op
from sdr_pmr446_tpu.ops.resample import PolyResampler
from sdr_pmr446_tpu.ops.pfb import PFBChannelizer
from sdr_pmr446_tpu.runtime.state import ScannerState, init_scanner_state
from sdr_pmr446_tpu.scanner.fsm import FsmCarry, fsm_ctcss_scan_v3


class RuntimeParams(NamedTuple):
    """Traced runtime knobs (no recompile when they change)."""
    squelch_level: jax.Array   # f32 []
    audio_gain: jax.Array      # f32 []
    channel_mask: jax.Array    # bool [16]
    lock_max: jax.Array        # bool []


def make_runtime_params(args: C.ScannerArgs) -> RuntimeParams:
    mask = np.array([(args.channel_mask >> i) & 1 for i in
                     range(C.NUM_CHANNELS)], dtype=bool)
    return RuntimeParams(
        squelch_level=jnp.float32(args.squelch_level),
        audio_gain=jnp.float32(args.audio_gain),
        channel_mask=jnp.asarray(mask),
        lock_max=jnp.asarray(args.lock_mode == "max"),
    )


class StepOutputs(NamedTuple):
    audio: jax.Array          # f32 [K, ns]  active channel audio per sub-chunk
    audio_valid: jax.Array    # bool [K]     sub-chunk produced audio
    active_chan: jax.Array    # i32 [K]
    rel_rssi: jax.Array       # f32 [K]
    rssi_db: jax.Array        # f32 [K, 16]  absolute per-channel RSSI
    ev_tuned: jax.Array       # bool [K]
    ev_detuned: jax.Array     # bool [K]
    ev_changed: jax.Array     # bool [K]
    ev_prev_chan: jax.Array   # i32 [K]
    ev_new_chan: jax.Array    # i32 [K]
    ct_detected: jax.Array    # bool [K]
    ct_max_idx: jax.Array     # i32 [K]
    ct_freq: jax.Array        # f32 [K]
    ev_ct_acquired: jax.Array  # bool [K]
    ev_ct_changed: jax.Array   # bool [K]
    ev_ct_lost: jax.Array      # bool [K]
    waterfall: jax.Array      # f32 [K, W] spectrum rows (dB), W=0 if off


class ScannerChain:
    """Builds and jits the scanner block step for a given geometry."""

    def __init__(self, block: C.BlockConfig | None = None,
                 lowpass: bool = False, fir_deemph: bool = False,
                 waterfall: int = 0, use_pallas: bool = False,
                 pallas_interpret: bool = False,
                 pallas_tiles: tuple = (1024, 512, 256),
                 input_format: str = "cf32", fuse_dc: bool = True,
                 fuse_lp_dc: bool = True, fuse_rssi: bool = True,
                 fuse_group: bool = True, fuse_ctcss: bool = True,
                 pfb_packed: bool = True, fuse_band: bool = True):
        # tile defaults tuned in-process at K=480 on the dev chip
        # (resampler frames, PFB frames, audio rows); larger tiles OOM the
        # remote compiler, smaller ones add grid-step overhead.  pfb_tile
        # dropped 1024 -> 512 in round 4: HIGHEST-precision dots (true-f32
        # multi-pass, kernels/precision.py) raise the row-path PFB body's
        # VMEM stack footprint past the budget at 1024 (compile-probed:
        # 512 PASS, 768 FAIL); the group path tiles by gt and is unaffected
        self.block = block or C.BlockConfig()
        # "cf32": step takes complex64 [input_len].  "cs16"/"cu8": step
        # takes the capture's RAW wire bytes packed as f32 transport words
        # ([input_len] / [input_len/2], ops/decode.py) and decodes on
        # device — 2-4x less host->device + input-read traffic than
        # converting on the host like the reference's CF32 stream setup
        # (src/shared.c:54) forces.
        self.input_format = input_format
        if input_format != "cf32" and \
                input_format not in decode_op.PACKED_FORMATS:
            raise ValueError(f"unsupported input_format: {input_format!r}")
        self.lowpass = lowpass
        self.fir_deemph = fir_deemph
        self.waterfall = waterfall
        spectrogram.validate_width(waterfall)
        self.use_pallas = use_pallas
        # fuse the IQ DC blocker INTO the resampler kernel (front-end HBM
        # traffic 24 -> 8 B/sample, NEXT.md #0); same math to f32 rounding
        self.fuse_dc = fuse_dc and use_pallas
        # fuse the audio-branch DC blocker into the audio-bank kernel and
        # the per-sub-chunk |y| sums into the PFB kernel (the last two
        # audio-rate HBM round-trips between kernels, VERDICT r2 #1);
        # same math to f32 rounding, test-gated
        self.fuse_lp_dc = fuse_lp_dc and use_pallas
        self.fuse_rssi = fuse_rssi and use_pallas
        # fuse the CTCSS windowed DFT into the audio kernel: the FSM
        # schedule (fsm_phase_a) depends only on RSSI, so the kernel can
        # mask/sum the selected channel's tone phasors itself and the lp
        # plane never reaches HBM at all (NEXT.md round-3 glue target #2)
        self.fuse_ctcss = fuse_ctcss and self.fuse_lp_dc and self.fuse_rssi
        # GROUP-major band handoff: the front end emits band group rows
        # [G, 400] that the PFB kernel consumes directly, eliminating the
        # ~10 materialized XLA buffers of the band->frames relayout chain
        # (measured ~8 B/input-sample).  Needs K % 8 == 0 (the band
        # output blocks need a multiple-of-8 group count per tile) and
        # the all-fused path; falls back to the row path otherwise.
        self.fuse_group = (fuse_group and self.fuse_dc and self.fuse_lp_dc
                           and self.fuse_rssi
                           and self.block.subchunks_per_step % 8 == 0)
        # phase-PACKED PFB group body: 25 phases in 7 full-lane MXU dots
        # instead of 100 sixteen-lane ones (kernels/pfb_demod.py
        # _packed_consts); same math to f32 summation rounding
        self.pfb_packed = pfb_packed
        # DUO: front end + PFB in ONE kernel (kernels/duo.py) — the band
        # group rows never leave VMEM (saves their 3.1 B/sample HBM round
        # trip); with the waterfall on, the kernel emits the band once as
        # an OUTPUT for the spgram tap (band_out — still one launch, and
        # the trio's band read-back is gone).  Needs the all-fused group
        # path.  Default ON: the sharded chain runs it too (exact-state
        # pre-pass, parallel/fused_halo.py), so the recorded engine stays
        # shardable.
        self.fuse_band = bool(fuse_band and self.fuse_group
                              and self.fuse_ctcss)
        if use_pallas:
            from sdr_pmr446_tpu.kernels.pfb_demod import PallasPfbDemod
            from sdr_pmr446_tpu.kernels.resample_kernel import PallasResampler
            from sdr_pmr446_tpu.kernels.audio_bank import PallasAudioBank
            res_tile, pfb_tile, audio_tile = pallas_tiles
            self.pallas_pfb = PallasPfbDemod(tile_f=pfb_tile,
                                             interpret=pallas_interpret)
            if self.fuse_band:
                from sdr_pmr446_tpu.kernels.duo import PallasScannerDuo
                self.pallas_duo = PallasScannerDuo(
                    input_format, interpret=pallas_interpret)
            if self.fuse_dc:
                from sdr_pmr446_tpu.kernels.front_end import PallasFrontEnd
                # cu8/cs8 pack TWO samples per transport word -> the
                # wide-row (256-sample) kernel geometry
                self.pallas_front = PallasFrontEnd(
                    interpret=pallas_interpret,
                    wide=input_format in ("cu8", "cs8"))
            else:
                self.pallas_resampler = PallasResampler(
                    tile_f=res_tile, interpret=pallas_interpret)
            self.pallas_audio = PallasAudioBank(
                lowpass=lowpass, fir_deemph=fir_deemph, tile_r=audio_tile,
                interpret=pallas_interpret)

        self.resampler = PolyResampler(D.resampler_taps(), C.RESAMP_L,
                                       C.RESAMP_M)
        self.pfb = PFBChannelizer(D.pfb_prototype())
        self.hp_taps = D.ctcss_hp_taps().astype(np.float32)
        self.lp_taps = D.audio_lp_taps().astype(np.float32)
        if fir_deemph:
            self.deemph_taps = D.deemph_fir_taps().astype(np.float32)
        else:
            self.deemph_taps = D.deemph_fir_equiv().astype(np.float32)
        self.deemph_hist_len = self.deemph_taps.shape[0] - 1

        from sdr_pmr446_tpu.runtime.fuse import fused_steps
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._multi_step = fused_steps(self._step_impl)

    def init_state(self) -> ScannerState:
        # the fused front end carries 384 DC-blocked samples (3 x 128 rows)
        # instead of the unfused 345 raw-input tail
        resamp_hist_len = (self.pallas_front.hist_len if self.fuse_dc
                           else self.resampler.hist_len)
        return init_scanner_state(resamp_hist_len,
                                  self.pfb.hist_len,
                                  self.deemph_hist_len,
                                  waterfall=self.waterfall,
                                  audio_hist_len=(self.pallas_audio.hist
                                                  if self.use_pallas
                                                  else 4 * 128))

    @property
    def input_len(self) -> int:
        """Complex samples consumed per step."""
        return self.block.input_len

    @property
    def step_arg_len(self) -> int:
        """Length of the array actually passed to step(): complex64
        samples for cf32, packed f32 transport words otherwise."""
        if self.input_format == "cf32":
            return self.block.input_len
        return decode_op.packed_len(self.block.input_len, self.input_format)

    @property
    def step_arg_shape(self) -> tuple:
        """PREFERRED step() input shape.  For the fused wire formats this
        is the kernel's native 2-D row layout [rows, width]: feeding it
        (a free host-side reshape of the same bytes) instead of the flat
        1-D vector removes XLA's 1-D -> (8,128)-tiled relayout of the
        whole block — a full extra HBM pass each way, measured at
        +16 B/sample for cf32w on the dev chip.  cf32 (complex input)
        stays 1-D.  step() accepts either shape."""
        if self.use_pallas and self.fuse_dc and self.input_format != "cf32":
            if self.input_format == "cf32w":
                return (self.block.input_len // 128, 256)
            return (self.step_arg_len // 128, 128)
        return (self.step_arg_len,)

    def step(self, state: ScannerState, iq: jax.Array,
             params: RuntimeParams):
        """One jitted block step; iq is [input_len] complex64 (cf32) or
        [step_arg_len] packed f32 wire words (cs16/cu8)."""
        return self._step(state, iq, params)

    def multi_step(self, state: ScannerState, iqs: jax.Array,
                   params: RuntimeParams):
        """S stacked blocks in ONE dispatch: lax.scan over the block step.

        ``iqs`` is [S, step_arg_len].  Returns (state', outputs) with every
        output leaf flattened to [S*K, ...] — in order, equal to S
        successive step() calls (decisions exactly, floats to f32 rounding;
        test-enforced).  Streaming deployments use
        this to amortize the per-dispatch host/runtime floor over S blocks
        (the per-step fixed cost is the TPU analog of the reference's
        per-chunk loop overhead, src/sdr_pmr446.c:788-790); the FSM stays
        sequential ACROSS blocks because the scan carries the state pytree.
        """
        return self._multi_step(state, iqs, params)

    # ------------------------------------------------------------------
    def _step_impl(self, state: ScannerState, iq: jax.Array,
                   params: RuntimeParams):
        K = self.block.subchunks_per_step
        ns = C.SUBCHUNK_AUDIO
        # all-fused default: the demod/audio/lp planes stay in the PFB
        # kernel's padded layout end-to-end and the sub-chunk windows are
        # gathered out — zero slice/reshape XLA passes between kernels
        fast_pad = self.fuse_rssi and self.fuse_lp_dc

        # 2-D row-layout input (step_arg_shape) goes straight into the
        # fused kernels; every other path consumes the flat vector
        if iq.ndim == 2 and len(self.step_arg_shape) != 2:
            iq = iq.reshape(-1)

        if self.use_pallas:
            # Plane-resident fast path: every block-sized array between the
            # front end and the audio bank stays in plane/real form — zero
            # complex materialization, zero XLA glue between kernels
            # (VERDICT r1 #1).
            if self.fuse_band:
                # 1-5 in ONE kernel: DC + wire decode + resampler + PFB +
                # discriminator (kernels/duo.py) — the band never reaches
                # HBM (waterfall off) or is emitted once as the spgram
                # tap's input (band_out; the trio's read-back is gone)
                wf_in_kernel = (self.waterfall > 0 and
                                spectrogram.kernel_wf_supported(
                                    self.waterfall, k=K))
                duo_out = self.pallas_duo.apply(
                    state.dc_x, state.dc_y, state.resamp_hist,
                    state.pfb_hist, state.frame_parity,
                    state.demod_prev, iq, ns,
                    band_out=self.waterfall > 0 and not wf_in_kernel,
                    waterfall_w=self.waterfall if wf_in_kernel else 0)
                (dc_x, dc_y, resamp_hist, demod3, mag_sums, pfb_hist,
                 parity, demod_prev) = duo_out[:8]
                wf_psd_sums = None
                if wf_in_kernel:
                    wf_psd_sums = duo_out[8]          # [K, w] |S|^2 sums
                elif self.waterfall > 0:
                    wf_br = duo_out[8][0].reshape(-1)
                    wf_bi = duo_out[8][1].reshape(-1)
            elif self.fuse_dc and self.input_format == "cf32w":
                # 1+2. fused IQ DC blocker + 25/128 polyphase resampler,
                # consuming the cf32 WIRE bytes in place: the (re,im)
                # interleave is undone inside the kernel's first matmul and
                # the one-pole recurrence runs as row-local + triangular
                # carry matmuls, so the front end's only HBM traffic is the
                # 8 B/sample input read (kernels/front_end.py)
                dc_x, dc_y, resamp_hist, br, bi = \
                    self.pallas_front.apply_interleaved(
                        state.dc_x, state.dc_y, state.resamp_hist, iq,
                        group_out=self.fuse_group)
            elif self.fuse_dc and self.input_format == "cs16":
                # 1+2. SC16 wire words decoded INSIDE the fused kernel
                # (bitcast + shift/mask in VMEM, bit-exact vs
                # ops/decode.py): input HBM traffic drops to the 4 B/sample
                # word read — half of cf32w's
                dc_x, dc_y, resamp_hist, br, bi = \
                    self.pallas_front.apply_packed(
                        state.dc_x, state.dc_y, state.resamp_hist, iq,
                        group_out=self.fuse_group)
            elif self.fuse_dc and self.input_format in ("cu8", "cs8"):
                # 1+2. rtl_tcp/HackRF wire (TWO samples per word) decoded
                # inside the wide-row kernel: 2 B/sample input read — the
                # live-source format at its speed of light
                dc_x, dc_y, resamp_hist, br, bi = \
                    self.pallas_front.apply_packed2(
                        state.dc_x, state.dc_y, state.resamp_hist, iq,
                        self.input_format, group_out=self.fuse_group)
            elif self.fuse_dc:
                # cf32: interleave to wire layout in one XLA pass
                dc_x, dc_y, resamp_hist, br, bi = \
                    self.pallas_front.apply_iq(
                        state.dc_x, state.dc_y, state.resamp_hist, iq,
                        group_out=self.fuse_group)
            else:
                if self.input_format == "cf32":
                    xr = jnp.real(iq)
                    xi = jnp.imag(iq)
                else:
                    xr, xi = decode_op.decode_planes(iq, self.input_format)
                # 1. IQ DC blocker: identical one-pole arithmetic on stacked
                # planes (complex z with real pole == two independent scans)
                st = (jnp.stack([jnp.real(state.dc_x),
                                 jnp.imag(state.dc_x)]),
                      jnp.stack([jnp.real(state.dc_y),
                                 jnp.imag(state.dc_y)]))
                (ndx, ndy), xp = iir.dc_blocker_apply(
                    st, jnp.stack([xr, xi]), C.DC_BLOCK_ALPHA)
                dc_x = jax.lax.complex(ndx[0], ndx[1])
                dc_y = jax.lax.complex(ndy[0], ndy[1])

                # 2. 25/128 polyphase resampler (plane in, plane out)
                resamp_hist, br, bi = self.pallas_resampler.apply_planes(
                    state.resamp_hist, xp[0], xp[1])

            # 3-5. fused NCO + PFB + |y| + NBFM discriminator kernel; with
            # fuse_rssi the per-sub-chunk magnitude sums come out as tiny
            # per-tile segments instead of a [16, F] plane (VERDICT r2 #1).
            # On the all-fused default path the demod plane flows into the
            # audio bank PADDED exactly as the kernel emits it, and the
            # audio/lp planes come back padded — the sub-chunk windows are
            # gathered out directly, so NONE of the slice/reshape XLA glue
            # passes (measured ~10 B/input-sample at K=8) run at all.
            if self.fuse_band:
                # demod/mag came out of the duo kernel above
                rssi_db = 20.0 * jnp.log10(
                    jnp.maximum(mag_sums * (1.0 / ns), 1e-30))
                demod = demod3.reshape(C.NUM_CHANNELS, K * ns)
            elif self.fuse_group:
                # GROUP-major: the PFB kernel eats br/bi [G, 400] exactly
                # as emitted; demod3.reshape is a free [16, F] view with
                # zero tail padding (F = 25*G exactly)
                demod3, mag_sums, pfb_hist, parity, demod_prev = \
                    self.pallas_pfb.call_group(
                        br, bi, state.pfb_hist, state.frame_parity,
                        state.demod_prev, ns, packed=self.pfb_packed)
                rssi_db = 20.0 * jnp.log10(
                    jnp.maximum(mag_sums * (1.0 / ns), 1e-30))
                demod = demod3.reshape(C.NUM_CHANNELS, K * ns)
            elif self.fuse_rssi:
                demod, mag_sums, pfb_hist, parity, demod_prev = \
                    self.pallas_pfb.call_planes_rssi(
                        br, bi, state.pfb_hist, state.frame_parity,
                        state.demod_prev, ns, padded_demod=fast_pad)
                rssi_db = 20.0 * jnp.log10(
                    jnp.maximum(mag_sums * (1.0 / ns), 1e-30))
            else:
                demod, mag, pfb_hist, parity, demod_prev = \
                    self.pallas_pfb.call_planes(
                        br, bi, state.pfb_hist, state.frame_parity,
                        state.demod_prev)
                blocks = mag.reshape(C.NUM_CHANNELS, K, C.SUBCHUNK_AUDIO)
                rssi_db = jnp.moveaxis(
                    20.0 * jnp.log10(jnp.maximum(jnp.mean(blocks, axis=-1),
                                                 1e-30)), 0, 1)

            # 6. fused audio bank: HP + (delay-HP) + de-emphasis (+ LP) in
            # one kernel pass; with fuse_lp_dc the CTCSS-branch DC blocker
            # runs as the kernel's epilogue, else in the exact XLA scan.
            # With fuse_ctcss the FSM schedule (a pure function of RSSI,
            # fsm_phase_a) is resolved FIRST and fed to the kernel, whose
            # DFT epilogue consumes the DC-blocked lp rows in VMEM — the
            # lp plane never exists in HBM (only [K, 38] tone sums leave).
            if self.fuse_ctcss:
                from sdr_pmr446_tpu.scanner.fsm import (fsm_phase_a,
                                                        raw_sums_to_ctcss)
                carry_in = FsmCarry(
                    state.fsm_state, state.active_chan, state.rssi,
                    state.ct_count, state.ct_carry, state.ct_detected,
                    state.ct_max_idx, state.ct_freq)
                sched = fsm_phase_a(carry_in, rssi_db, params.channel_mask,
                                    params.squelch_level, params.lock_max,
                                    ns)
                sel_k = jnp.clip(sched.act2, 0, C.NUM_CHANNELS - 1)
                (audio_hist, lp_dc_x, lp_dc_y, audio_all, raw_pre,
                 raw_mem) = self.pallas_audio.apply_dc_ctcss(
                    state.audio_hist, state.lp_dc_x, state.lp_dc_y,
                    demod, params.audio_gain, sched.b_arr, sel_k,
                    out_len=K * ns, ns=ns)
                ct_sums = raw_sums_to_ctcss(sched, raw_pre, raw_mem, ns)
            elif self.fuse_lp_dc:
                audio_hist, lp_dc_x, lp_dc_y, audio_all, lp_dcb = \
                    self.pallas_audio.apply_dc(
                        state.audio_hist, state.lp_dc_x, state.lp_dc_y,
                        demod, params.audio_gain,
                        out_len=(K * ns if fast_pad else None),
                        padded_out=fast_pad)
            else:
                audio_hist, audio_all, lp_branch = self.pallas_audio.apply(
                    state.audio_hist, demod, params.audio_gain)
                (lp_dc_x, lp_dc_y), lp_dcb = iir.dc_blocker_apply(
                    (state.lp_dc_x, state.lp_dc_y), lp_branch,
                    C.DC_BLOCK_ALPHA)
            hp_hist = state.hp_hist
            delay_hist = state.delay_hist
            deemph_hist = state.deemph_hist
            audio_lp_hist = state.audio_lp_hist
            band = None
            if self.waterfall > 0 and not self.fuse_band:
                # the asgram consumes the kernel's band PLANES in place
                # (ops/spectrogram _p variants): no complex band is ever
                # materialized for the waterfall tap (the duo path set
                # wf_br/wf_bi from its own band_out emission above)
                wf_br = br.reshape(-1)
                wf_bi = bi.reshape(-1)
        else:
            if self.input_format != "cf32":
                iq = decode_op.decode_complex(iq, self.input_format)
            # 1. IQ DC blocker (exact one-pole, src/sdr_pmr446.c:422,795)
            (dc_x, dc_y), x = iir.dc_blocker_apply(
                (state.dc_x, state.dc_y), iq, C.DC_BLOCK_ALPHA)

            # 2. 25/128 polyphase resampler to 200 kHz (:425-428,796)
            resamp_hist, band = self.resampler.apply(state.resamp_hist, x)

            # 3-5. NCO + PFB channelizer + RSSI + NBFM discriminator
            (pfb_hist, parity), chan = self.pfb.apply(
                (state.pfb_hist, state.frame_parity), band)
            rssi_db = rssi_op.subchunk_rssi(chan, K)      # [K, 16]
            demod_prev, demod = fm.fm_demod(state.demod_prev, chan)

            # 6. audio path, all channels: HP (CTCSS removal), complementary
            # LP branch = delay - HP (:882-891)
            hp_hist, hp_out = fir.fir_apply(state.hp_hist, demod,
                                            self.hp_taps)
            delay_hist, delayed = fir.delay_apply(state.delay_hist, demod)
            lp_branch = delayed - hp_out
            (lp_dc_x, lp_dc_y), lp_dcb = iir.dc_blocker_apply(
                (state.lp_dc_x, state.lp_dc_y), lp_branch, C.DC_BLOCK_ALPHA)

            audio_all = hp_out * params.audio_gain
            deemph_hist, audio_all = fir.fir_apply(
                state.deemph_hist, audio_all, self.deemph_taps)
            if self.lowpass:
                audio_lp_hist, audio_all = fir.fir_apply(
                    state.audio_lp_hist, audio_all, self.lp_taps)
            else:
                audio_lp_hist = state.audio_lp_hist
            audio_hist = state.audio_hist

        # 7. squelch FSM + CTCSS detection scan over K sub-chunks; lp goes
        # in channel-major (the layout the kernels emit) so the CTCSS
        # selection is a row gather, not a channel-minor copy.  On the
        # padded fast path the sub-chunk windows are gathered straight out
        # of the kernel-padded plane (cols indexes the true frames).  With
        # fuse_ctcss phases A (schedule) and B (tone sums) already ran —
        # only the detection chains (phase C) remain.
        if fast_pad:
            cols = (jnp.arange(K, dtype=jnp.int32)[:, None] * ns
                    + jnp.arange(ns, dtype=jnp.int32)[None, :])   # [K, ns]
        if self.use_pallas and self.fuse_ctcss:
            from sdr_pmr446_tpu.scanner.fsm import fsm_phase_c
            carry_out, fo = fsm_phase_c(carry_in, sched, *ct_sums)
        else:
            carry_in = FsmCarry(
                state.fsm_state, state.active_chan, state.rssi,
                state.ct_count, state.ct_carry, state.ct_detected,
                state.ct_max_idx, state.ct_freq)
            if fast_pad:
                lp_cm = lp_dcb[:, cols]
            else:
                lp_cm = lp_dcb.reshape(C.NUM_CHANNELS, K, ns)
            carry_out, fo = fsm_ctcss_scan_v3(
                carry_in, rssi_db, None, params.channel_mask,
                params.squelch_level, params.lock_max, lp_cm=lp_cm)

        # 8. select the active channel's audio per sub-chunk — a direct
        # channel-major row gather (reads the selected 1/16th only)
        sel = jnp.clip(fo.active_chan, 0, C.NUM_CHANNELS - 1)
        if fast_pad:
            audio_sel = audio_all[sel[:, None], cols]
        else:
            audio_sel = audio_all.reshape(C.NUM_CHANNELS, K, ns)[
                sel, jnp.arange(K, dtype=jnp.int32)]
        valid = fo.active_chan >= 0

        # 9. waterfall rows: sliding windowed periodogram over ALL band
        # samples (asgramcf semantics, src/sdr_pmr446.c:473-477,910-919);
        # widths whose hop divides the sub-chunk take the static path,
        # any other multiple of 4 carries the hop counter (wf_cnt)
        wf_cnt = state.wf_cnt
        if self.waterfall > 0:
            if self.fuse_band and wf_psd_sums is not None:
                # the duo's in-kernel hop-PSD: only [K, w] sums left HBM;
                # the sliding-window history is the PFB's own band-row
                # carry, so wf_hist stays untouched (empty state).
                # General widths carry static per-row hop counts (the
                # in-kernel path only engages at phase-reset geometries)
                counts = (None
                          if spectrogram.uses_fast_path(self.waterfall)
                          else spectrogram.wf_row_counts(self.waterfall,
                                                         K))
                wf = spectrogram.rows_from_psd_sums(wf_psd_sums,
                                                    self.waterfall,
                                                    counts=counts)
                wf_hist = state.wf_hist
            elif band is None:                # pallas: planes in place
                wf_args = (state.wf_hist, wf_br, wf_bi, K, self.waterfall)
                if spectrogram.uses_fast_path(self.waterfall):
                    wf_hist, wf = spectrogram.asgram_rows_p(*wf_args)
                else:
                    wf_hist, wf_cnt, wf = spectrogram.asgram_rows_any_p(
                        state.wf_hist, state.wf_cnt, wf_br, wf_bi, K,
                        self.waterfall)
            elif spectrogram.uses_fast_path(self.waterfall):
                wf_hist, wf = spectrogram.asgram_rows(
                    state.wf_hist, band, K, self.waterfall)
            else:
                wf_hist, wf_cnt, wf = spectrogram.asgram_rows_any(
                    state.wf_hist, state.wf_cnt, band, K, self.waterfall)
        else:
            wf_hist = state.wf_hist
            wf = jnp.zeros((K, 0), jnp.float32)

        new_state = ScannerState(
            dc_x=dc_x, dc_y=dc_y, resamp_hist=resamp_hist,
            pfb_hist=pfb_hist, frame_parity=parity,
            demod_prev=demod_prev, hp_hist=hp_hist, delay_hist=delay_hist,
            lp_dc_x=lp_dc_x, lp_dc_y=lp_dc_y, deemph_hist=deemph_hist,
            audio_lp_hist=audio_lp_hist, audio_hist=audio_hist,
            fsm_state=carry_out.fsm_state, active_chan=carry_out.active_chan,
            rssi=carry_out.rssi, ct_count=carry_out.ct_count,
            ct_carry=carry_out.ct_carry, ct_detected=carry_out.ct_detected,
            ct_max_idx=carry_out.ct_max_idx, ct_freq=carry_out.ct_freq,
            wf_hist=wf_hist, wf_cnt=wf_cnt,
        )
        outputs = StepOutputs(
            audio=audio_sel, audio_valid=valid,
            active_chan=fo.active_chan, rel_rssi=fo.rel_rssi,
            rssi_db=rssi_db,
            ev_tuned=fo.ev_tuned, ev_detuned=fo.ev_detuned,
            ev_changed=fo.ev_changed, ev_prev_chan=fo.ev_prev_chan,
            ev_new_chan=fo.ev_new_chan,
            ct_detected=fo.ct_detected, ct_max_idx=fo.ct_max_idx,
            ct_freq=fo.ct_freq, ev_ct_acquired=fo.ev_ct_acquired,
            ev_ct_changed=fo.ev_ct_changed, ev_ct_lost=fo.ev_ct_lost,
            waterfall=wf,
        )
        return new_state, outputs
