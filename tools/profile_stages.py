"""Per-stage timing of the scanner chain on the attached device.

Times each pipeline stage as its own jitted function (inputs resident,
repeat-measured in one process) to locate the bottleneck.  Stage timings
include dispatch overhead, so they over-count vs the fused chain — use for
RELATIVE comparison only.
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.ops import iir
from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--subchunks-per-step", type=int, default=40)
    args = p.parse_args()
    k = args.subchunks_per_step
    chain = ScannerChain(C.BlockConfig(k), use_pallas=True)
    n = chain.block.input_len
    iq = jnp.asarray(synth.make_scanner_iq(n, channel=5, ctcss_code=12),
                     jnp.complex64)
    st = chain.init_state()
    params = make_runtime_params(C.ScannerArgs())

    def chain_step(iq, params):       # fresh state per call: step donates it
        return chain.step(chain.init_state(), iq, params)

    ms, _ = timeit(chain_step, iq, params)
    print(f"full pallas chain        : {ms:7.3f} ms   "
          f"({n / ms / 1e3:.0f} Ms/s)", flush=True)

    # stage 1: split + DC blocker
    @jax.jit
    def stage_dc(iq):
        xr = jnp.real(iq)
        xi = jnp.imag(iq)
        st0 = (jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.float32))
        (ndx, ndy), xp = iir.dc_blocker_apply(
            st0, jnp.stack([xr, xi]), C.DC_BLOCK_ALPHA)
        return xp

    ms, xp = timeit(stage_dc, iq)
    print(f"split + dc blocker       : {ms:7.3f} ms", flush=True)

    @jax.jit
    def stage_split(iq):
        return jnp.stack([jnp.real(iq), jnp.imag(iq)])

    ms, _ = timeit(stage_split, iq)
    print(f"  split only             : {ms:7.3f} ms", flush=True)

    # stage 2: resampler kernel
    rs = chain.pallas_resampler

    @jax.jit
    def stage_res(hist, xr, xi):
        return rs.apply_planes(hist, xr, xi)

    ms, (rh, br, bi) = timeit(stage_res, st.resamp_hist, xp[0], xp[1])
    print(f"resampler kernel         : {ms:7.3f} ms", flush=True)

    # stage 3: pfb+demod kernel
    pf = chain.pallas_pfb

    @jax.jit
    def stage_pfb(br, bi, h, par, prev):
        return pf.call_planes(br, bi, h, par, prev)

    ms, (demod, mag, _, _, _) = timeit(
        stage_pfb, br, bi, st.pfb_hist, st.frame_parity, st.demod_prev)
    print(f"pfb+demod kernel         : {ms:7.3f} ms", flush=True)

    # stage 4: audio bank kernel
    ab = chain.pallas_audio

    @jax.jit
    def stage_audio(h, demod, g):
        return ab.apply(h, demod, g)

    ms, (ah, audio, lp) = timeit(stage_audio, st.audio_hist, demod,
                                 params.audio_gain)
    print(f"audio bank kernel        : {ms:7.3f} ms", flush=True)

    # stage 5: lp dc blocker
    @jax.jit
    def stage_lpdc(lp):
        st0 = (jnp.zeros((16,), jnp.float32), jnp.zeros((16,), jnp.float32))
        return iir.dc_blocker_apply(st0, lp, C.DC_BLOCK_ALPHA)

    ms, _ = timeit(stage_lpdc, lp)
    print(f"audio-branch dc blocker  : {ms:7.3f} ms", flush=True)

    # stage 6: rssi + fsm + select (everything after the kernels)
    from sdr_pmr446_tpu.scanner.fsm import FsmCarry, fsm_ctcss_scan_v3

    @jax.jit
    def stage_fsm(mag, lp_dcb, params):
        ns = C.SUBCHUNK_AUDIO
        blocks = mag.reshape(C.NUM_CHANNELS, k, ns)
        rssi_db = jnp.moveaxis(
            20.0 * jnp.log10(jnp.maximum(jnp.mean(blocks, axis=-1),
                                         1e-30)), 0, 1)
        # fresh zeros INSIDE jit: closing over device arrays embeds them as
        # constants, which triggers a broken device->host read at trace on
        # this backend (CLAUDE.md)
        carry = FsmCarry(jnp.zeros((), jnp.int32),
                         jnp.full((), -1, jnp.int32),
                         jnp.zeros((), jnp.float32),
                         jnp.zeros((), jnp.int32),
                         jnp.zeros((C.CTCSS_NUM_FREQS,), jnp.complex64),
                         jnp.zeros((), jnp.bool_),
                         jnp.zeros((), jnp.int32),
                         jnp.full((), -1.0, jnp.float32))
        lp_blocks = jnp.moveaxis(
            lp_dcb.reshape(C.NUM_CHANNELS, k, ns), 0, 1)
        return fsm_ctcss_scan_v3(carry, rssi_db, lp_blocks,
                                 params.channel_mask, params.squelch_level,
                                 params.lock_max)

    _, lp_dcb = stage_lpdc(lp)
    ms, _ = timeit(stage_fsm, mag, lp_dcb, params)
    print(f"rssi + fsm scan          : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
