"""Time-sharded faithful-mode scanner.

Faithful mode's audio path is gated and strictly sequential per sub-chunk
(scanner/faithful.py mirrors the reference main loop literally), so the
sharding strategy splits at the rate boundary: the heavy front-end (IQ DC
block + 25/128 resampler + PFB) runs time-sharded with halo exchange like
the fast chain, then the channelized sub-chunk matrices — 82x smaller than
the input — are all-gathered and the exact gated scan (faithful_scan, the
SAME function as single-chip) runs replicated on every device.

Sharded == unsharded is test-enforced (tests/test_sharding.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.taps import design as D
from sdr_pmr446_tpu.ops.resample import PolyResampler
from sdr_pmr446_tpu.ops.pfb import PFBChannelizer
from sdr_pmr446_tpu.scanner.chain import RuntimeParams
from sdr_pmr446_tpu.scanner.faithful import (FaithfulState, FaithfulOutputs,
                                             faithful_scan,
                                             FaithfulScannerChain)
from sdr_pmr446_tpu.parallel import halo
from sdr_pmr446_tpu.parallel.scanner_sharded import TIME_AXIS, STREAM_AXIS


class ShardedFaithfulChain:
    """Faithful scanner over [n_streams, input_len] on a (stream, time) mesh."""

    def __init__(self, mesh: Mesh, subchunks_per_step: int = 8,
                 lowpass: bool = False):
        self.mesh = mesh
        self.K = subchunks_per_step
        self.lowpass = lowpass
        self.n_time = mesh.shape[TIME_AXIS]
        self.n_stream = mesh.shape[STREAM_AXIS]
        assert self.K % self.n_time == 0
        self.resampler = PolyResampler(D.resampler_taps(), C.RESAMP_L,
                                       C.RESAMP_M)
        self.pfb = PFBChannelizer(D.pfb_prototype())
        self.hp_taps = D.ctcss_hp_taps().astype(np.float32)
        self.lp_taps = D.audio_lp_taps().astype(np.float32)
        b, a = D.deemph_iir_coeffs()
        self.de_coeffs = (float(b[0]), float(b[1]), float(a[1]))

        self._template = FaithfulScannerChain(subchunks_per_step, lowpass)
        in_specs = (
            jax.tree.map(lambda _: P(STREAM_AXIS), self._state_struct()),
            P(STREAM_AXIS, TIME_AXIS),
            jax.tree.map(lambda _: P(), RuntimeParams(0, 0, 0, 0)),
        )
        out_specs = (
            jax.tree.map(lambda _: P(STREAM_AXIS), self._state_struct()),
            jax.tree.map(lambda _: P(STREAM_AXIS, TIME_AXIS),
                         self._out_struct()),
        )
        fn = jax.shard_map(self._step_shard, mesh=mesh,
                           in_specs=in_specs, out_specs=out_specs,
                           check_vma=False)
        self._step = jax.jit(fn, donate_argnums=(0,))

    @property
    def input_len(self) -> int:
        return self.K * C.SUBCHUNK_IN

    def _state_struct(self) -> FaithfulState:
        return self._template.init_state()

    def _out_struct(self):
        return FaithfulOutputs(*([0] * len(FaithfulOutputs._fields)))

    def init_state(self, n_streams: int) -> FaithfulState:
        base = self._state_struct()
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_streams,) + a.shape), base)

    def step(self, state: FaithfulState, iq: jax.Array,
             params: RuntimeParams):
        return self._step(state, iq, params)

    # ------------------------------------------------------------------
    def _step_shard(self, state, iq, params):
        single = functools.partial(self._step_one_stream, params=params)
        return jax.vmap(single)(state, iq)

    def _step_one_stream(self, state: FaithfulState, iq: jax.Array,
                         params: RuntimeParams):
        ax = TIME_AXIS
        d = jax.lax.axis_index(ax)
        K = self.K
        K_local = K // self.n_time
        ns = C.SUBCHUNK_AUDIO

        # sharded front-end with halos (same as the fast sharded chain)
        (dc_x, dc_y), x = halo.shard_dc_blocker(
            (state.dc_x, state.dc_y), iq, C.DC_BLOCK_ALPHA, ax)
        rhist, r_carry = halo.shard_hist(state.resamp_hist, x,
                                         self.resampler.hist_len, ax)
        _, band = self.resampler.apply(rhist, x)
        phist, p_carry = halo.shard_hist(state.pfb_hist, band,
                                         self.pfb.hist_len, ax)
        f_local = band.shape[-1] // C.NUM_CHANNELS
        parity = (state.frame_parity + d * f_local) % 2
        (_, _), chan = self.pfb.apply((phist, parity), band)
        new_parity = (state.frame_parity + self.n_time * f_local) % 2

        chan_local = jnp.moveaxis(
            chan.reshape(C.NUM_CHANNELS, K_local, ns), 0, 1)
        rssi_local = jnp.moveaxis(20.0 * jnp.log10(jnp.maximum(jnp.mean(
            jnp.abs(chan.reshape(C.NUM_CHANNELS, K_local, ns)), axis=-1),
            1e-30)), 0, 1)

        # gather the audio-rate sub-chunk matrices; replicated gated scan
        chan_all = jax.lax.all_gather(chan_local, ax, tiled=True)
        rssi_all = jax.lax.all_gather(rssi_local, ax, tiled=True)
        carry_f, (audio, valid, act, rel, det, tidx) = faithful_scan(
            state, rssi_all, chan_all, params,
            self.hp_taps, self.lp_taps, self.de_coeffs, self.lowpass)

        new_state = FaithfulState(
            dc_x=dc_x, dc_y=dc_y, resamp_hist=r_carry, pfb_hist=p_carry,
            frame_parity=new_parity,
            fm_prev=carry_f[0], hp_hist=carry_f[1], delay_hist=carry_f[2],
            dc2_x=carry_f[3], dc2_y=carry_f[4], deemph_x=carry_f[5],
            deemph_y=carry_f[6], lp_hist=carry_f[7], fsm_state=carry_f[8],
            active_chan=carry_f[9], rssi=rel[-1], ct_count=carry_f[10],
            ct_carry=carry_f[11], ct_detected=carry_f[12],
            ct_max_idx=carry_f[13], ct_freq=carry_f[14],
        )
        loc = lambda a: jax.lax.dynamic_slice_in_dim(a, d * K_local, K_local)
        outs = FaithfulOutputs(loc(audio), loc(valid), loc(act), loc(rel),
                               loc(det), loc(tidx))
        return new_state, outs
