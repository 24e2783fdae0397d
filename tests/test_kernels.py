"""Pallas kernel correctness: interpret mode vs pure-JAX reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.kernels.pfb_demod import PallasPfbDemod, reference_impl




def _assert_demod_close(d1, d2, atol):
    """Compare discriminator outputs modulo the +-pi branch cut (demod units
    are phase/pi, so wrap at +-1): random-noise fixtures legitimately produce
    phase steps at exactly +-pi where both signs are the same angle."""
    e = (np.asarray(d1) - np.asarray(d2) + 1.0) % 2.0 - 1.0
    assert np.max(np.abs(e)) < atol, np.max(np.abs(e))


@pytest.mark.parametrize("parity", [0, 1])
def test_pfb_demod_kernel_matches_reference(parity):
    rng = np.random.default_rng(0)
    t = 4 * 128 * C.NUM_CHANNELS            # F = 512 frames, one tile
    band = (rng.standard_normal(t) + 1j * rng.standard_normal(t)
            ).astype(np.complex64)
    hist = (rng.standard_normal(400) + 1j * rng.standard_normal(400)
            ).astype(np.complex64)
    prev = (rng.standard_normal(16) + 1j * rng.standard_normal(16)
            ).astype(np.complex64)

    k = PallasPfbDemod(tile_f=128, interpret=True)
    d1, m1, h1, p1, pr1 = k(jnp.asarray(band), jnp.asarray(hist),
                            jnp.asarray(parity, jnp.int32),
                            jnp.asarray(prev))
    d2, m2, h2, p2, pr2 = reference_impl(jnp.asarray(band),
                                         jnp.asarray(hist),
                                         jnp.asarray(parity, jnp.int32),
                                         jnp.asarray(prev))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=0, atol=2e-4)
    _assert_demod_close(d1, d2, 2e-3)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=0)
    assert int(p1) == int(p2)
    np.testing.assert_allclose(np.asarray(pr1), np.asarray(pr2),
                               rtol=0, atol=2e-4)


def test_pfb_demod_kernel_multi_tile_streaming():
    # multiple grid steps + cross-call state carry must equal the reference
    rng = np.random.default_rng(3)
    tile = 64
    # frame count NOT a multiple of the tile: exercises end padding
    t_blk = (3 * tile + 40) * C.NUM_CHANNELS
    k = PallasPfbDemod(tile_f=tile, interpret=True)

    hist = jnp.zeros(400, jnp.complex64)
    parity = jnp.asarray(0, jnp.int32)
    # nonzero prev: with prev exactly 0 the first discriminator output is
    # atan2(+-0, +-0), where signed-zero conventions differ between numpy and
    # the in-kernel polynomial (both give a startup don't-care sample)
    prev = jnp.full(16, 0.1 + 0.0j, jnp.complex64)
    rhist, rparity, rprev = hist, parity, prev
    for _ in range(3):
        band = jnp.asarray((rng.standard_normal(t_blk)
                            + 1j * rng.standard_normal(t_blk)
                            ).astype(np.complex64))
        d1, m1, hist, parity, prev = k(band, hist, parity, prev)
        d2, m2, rhist, rparity, rprev = reference_impl(band, rhist, rparity,
                                                       rprev)
        _assert_demod_close(d1, d2, 2e-3)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=0, atol=2e-4)


def test_scanner_chain_with_pallas_kernel_matches():
    """Full scanner with the fused kernel == standard chain (interpret)."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params
    from sdr_pmr446_tpu.io import synth

    iq = synth.make_scanner_iq(2 * 3 * C.SUBCHUNK_IN, channel=5,
                               ctcss_code=12)
    params = make_runtime_params(C.ScannerArgs())
    outs = {}
    for mode in ["std", "pallas"]:
        chain = ScannerChain(C.BlockConfig(3), use_pallas=(mode == "pallas"),
                             pallas_interpret=True)
        st = chain.init_state()
        step = chain.block.input_len
        res = []
        for i in range(2):
            st, o = chain.step(st, jnp.asarray(
                iq[i * step:(i + 1) * step], jnp.complex64), params)
            res.append(o)
        outs[mode] = res
    for o1, o2 in zip(outs["std"], outs["pallas"]):
        np.testing.assert_array_equal(np.asarray(o1.active_chan),
                                      np.asarray(o2.active_chan))
        # 0.01 dB: the plane-stacked DC blocker differs from the complex
        # scan at f32 rounding level (real vs complex pow in the chunk-carry
        # schedule), visible only at the -75 dB noise floor
        np.testing.assert_allclose(np.asarray(o1.rssi_db),
                                   np.asarray(o2.rssi_db), rtol=0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(o1.audio),
                                   np.asarray(o2.audio), rtol=0, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(o1.ct_detected),
                                      np.asarray(o2.ct_detected))


def test_kmath_atan2_accuracy():
    from sdr_pmr446_tpu.kernels import kmath
    rng = np.random.default_rng(0)
    y = rng.standard_normal(20000).astype(np.float32)
    x = rng.standard_normal(20000).astype(np.float32)
    got = np.asarray(kmath.atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    assert np.max(np.abs(got - ref)) < 3e-5


def test_resampler_kernel_matches_op():
    from sdr_pmr446_tpu.kernels.resample_kernel import PallasResampler
    from sdr_pmr446_tpu.ops.resample import PolyResampler
    from sdr_pmr446_tpu.taps import design as D
    rng = np.random.default_rng(5)
    ref_op = PolyResampler(D.resampler_taps(), C.RESAMP_L, C.RESAMP_M)
    k = PallasResampler(tile_f=64, interpret=True)
    hist_ref = ref_op.init()
    hist_k = jnp.zeros(k.hist_len, jnp.complex64)
    for blk in range(3):
        # frame counts not multiples of the tile: exercise padding
        t = (3 * 64 + 17) * C.RESAMP_M
        x = jnp.asarray((rng.standard_normal(t) + 1j * rng.standard_normal(t)
                         ).astype(np.complex64))
        hist_ref, y_ref = ref_op.apply(hist_ref, x)
        hist_k, y_k = k.apply(hist_k, x)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                                   rtol=0, atol=2e-4, err_msg=f"block {blk}")
        np.testing.assert_allclose(np.asarray(hist_k), np.asarray(hist_ref),
                                   atol=0)

@pytest.mark.parametrize("lowpass,fir_deemph", [
    (False, False), (True, False),
    # fir_deemph+lowpass composes 579 taps: exercises the adaptive 640-deep
    # history (the other combos use the default 512)
    (True, True),
])
def test_audio_bank_kernel_matches_opchain(lowpass, fir_deemph):
    """Fused audio bank == sequential op chain (f32 rounding level),
    including streaming across calls and tail padding."""
    from sdr_pmr446_tpu.kernels.audio_bank import (PallasAudioBank,
                                                   reference_impl)
    rng = np.random.default_rng(7)
    bank = PallasAudioBank(lowpass=lowpass, fir_deemph=fir_deemph,
                           tile_r=8, interpret=True)
    assert bank.hist == (640 if (lowpass and fir_deemph) else 512)
    hist = bank.init()
    rhist = hist
    gain = jnp.float32(4.0)
    for i, f in enumerate([1225, 1225 * 2]):   # non-multiple of 128 lanes
        demod = jnp.asarray(rng.standard_normal((16, f)), jnp.float32)
        hist, audio, lp = bank.apply(hist, demod, gain)
        rhist, audio2, lp2 = reference_impl(rhist, demod, gain,
                                            lowpass=lowpass,
                                            fir_deemph=fir_deemph)
        np.testing.assert_array_equal(np.asarray(hist), np.asarray(rhist))
        np.testing.assert_allclose(np.asarray(audio), np.asarray(audio2),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2),
                                   rtol=0, atol=1e-5)


def test_audio_bank_matches_chain_streaming_state():
    """The fused bank streaming from zero state == the chain.py op sequence
    streaming its four separate histories (fresh-state warmup included)."""
    from sdr_pmr446_tpu.kernels.audio_bank import PallasAudioBank
    from sdr_pmr446_tpu.taps import design as D
    from sdr_pmr446_tpu.ops import fir

    rng = np.random.default_rng(11)
    hp_taps = jnp.asarray(D.ctcss_hp_taps().astype(np.float32))
    de_taps = jnp.asarray(D.deemph_fir_equiv().astype(np.float32))
    gain = jnp.float32(4.0)

    bank = PallasAudioBank(tile_r=8, interpret=True)
    hist = bank.init()
    hp_h = jnp.zeros((16, hp_taps.shape[0] - 1), jnp.float32)
    dl_h = jnp.zeros((16, C.CTCSS_DELAY), jnp.float32)
    de_h = jnp.zeros((16, de_taps.shape[0] - 1), jnp.float32)
    for _ in range(3):
        demod = jnp.asarray(rng.standard_normal((16, 1225)), jnp.float32)
        hist, audio, lp = bank.apply(hist, demod, gain)
        hp_h, hp_out = fir.fir_apply(hp_h, demod, hp_taps)
        dl_h, delayed = fir.delay_apply(dl_h, demod)
        de_h, audio2 = fir.fir_apply(de_h, hp_out * gain, de_taps)
        np.testing.assert_allclose(np.asarray(audio), np.asarray(audio2),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lp),
                                   np.asarray(delayed - hp_out),
                                   rtol=0, atol=1e-5)


def test_audio_bank_fused_dc_matches_scan():
    """apply_dc (in-kernel one-pole epilogue) == apply + the exact XLA
    scan (ops/iir), including the carried (x[-1], y[-1]) per channel."""
    from sdr_pmr446_tpu.kernels.audio_bank import PallasAudioBank
    from sdr_pmr446_tpu.ops import iir

    rng = np.random.default_rng(3)
    bank = PallasAudioBank(interpret=True, tile_r=128)
    f = 2 * C.SUBCHUNK_AUDIO
    hist = jnp.asarray(rng.standard_normal((16, bank.hist)), jnp.float32)
    dcx = jnp.asarray(rng.standard_normal(16), jnp.float32)
    dcy = jnp.asarray(0.01 * rng.standard_normal(16), jnp.float32)
    gain = jnp.float32(4.0)
    for step in range(2):
        demod = jnp.asarray(rng.standard_normal((16, f)), jnp.float32)
        h1, audio1, lp1 = bank.apply(hist, demod, gain)
        (rx, ry), lpdc_ref = iir.dc_blocker_apply((dcx, dcy), lp1,
                                                  C.DC_BLOCK_ALPHA)
        hist, dcx, dcy, audio2, lpdc2 = bank.apply_dc(hist, dcx, dcy,
                                                      demod, gain)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(hist))
        np.testing.assert_array_equal(np.asarray(audio1),
                                      np.asarray(audio2))
        np.testing.assert_allclose(np.asarray(lpdc_ref), np.asarray(lpdc2),
                                   rtol=0, atol=2e-4)
        np.testing.assert_allclose(np.asarray(rx), np.asarray(dcx),
                                   rtol=0, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ry), np.asarray(dcy),
                                   rtol=0, atol=2e-4)


def test_pfb_demod_fused_rssi_matches_mag_sums():
    """call_planes_rssi segment sums == per-sub-chunk sums of the |y|
    plane, with identical demod/carries (the mag plane never hits HBM)."""
    from sdr_pmr446_tpu.kernels.pfb_demod import PallasPfbDemod

    rng = np.random.default_rng(4)
    K, ns = 2, C.SUBCHUNK_AUDIO
    t = K * ns * 16
    br = jnp.asarray(rng.standard_normal(t), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(t), jnp.float32)
    hist = jnp.asarray(rng.standard_normal(400)
                       + 1j * rng.standard_normal(400), jnp.complex64)
    prev = jnp.asarray(rng.standard_normal(16)
                       + 1j * rng.standard_normal(16), jnp.complex64)
    par = jnp.int32(1)
    pfb = PallasPfbDemod(tile_f=512, interpret=True)
    d1, mag, h1, p1, pr1 = pfb.call_planes(br, bi, hist, par, prev)
    d2, sums, h2, p2, pr2 = pfb.call_planes_rssi(br, bi, hist, par, prev)
    ref = np.asarray(mag).reshape(16, K, ns).sum(-1).T
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(ref, np.asarray(sums), rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    assert int(p1) == int(p2)
    np.testing.assert_array_equal(np.asarray(pr1), np.asarray(pr2))


def test_audio_bank_fused_ctcss_dft_matches_xla_sums():
    """apply_dc_ctcss == apply_dc + fsm_tone_sums on the lp plane: audio
    and carried state bit-exact, tone sums to f32 rounding — across two
    streamed steps and a schedule that exercises boundary positions
    (b = ns-1 edge, b >= ns no-boundary, b = 0, mid-window splits)."""
    from sdr_pmr446_tpu.kernels.audio_bank import PallasAudioBank
    from sdr_pmr446_tpu.scanner import fsm

    rng = np.random.default_rng(7)
    K, ns = 8, C.SUBCHUNK_AUDIO
    f = K * ns
    bank = PallasAudioBank(interpret=True)
    hist = jnp.asarray(0.1 * rng.standard_normal((16, bank.hist)),
                       jnp.float32)
    dcx = jnp.asarray(0.01 * rng.standard_normal(16), jnp.float32)
    dcy = jnp.asarray(0.01 * rng.standard_normal(16), jnp.float32)
    gain = jnp.float32(4.0)
    n_win = C.CTCSS_BLOCK_SIZE
    b_np = np.array([n_win - 1, ns - 1, n_win - 1 - ns, 500, 2440, 0,
                     ns, 900], np.int32)
    sel_np = np.array([3, 3, 7, 0, 15, 2, 2, 9], np.int32)
    for step in range(2):
        demod = jnp.asarray(0.3 * rng.standard_normal((16, f)), jnp.float32)
        b_arr = jnp.asarray(np.roll(b_np, step))
        sel = jnp.asarray(np.roll(sel_np, step))
        cnt_r = (n_win - 1) - b_arr
        z = jnp.zeros((K,), jnp.int32)
        zb = jnp.zeros((K,), bool)
        sched = fsm.FsmSchedule(sel, jnp.zeros((K,), jnp.float32), zb, zb,
                                zb, z, z, jnp.ones((K,), bool), cnt_r,
                                b_arr, zb, zb, z, z)
        h1, dx1, dy1, audio1, lpdc1 = bank.apply_dc(hist, dcx, dcy, demod,
                                                    gain, out_len=f)
        sp_ref, ss_ref = fsm.fsm_tone_sums(
            sched, None, lpdc1.reshape(16, K, ns), ns)
        hist, dcx, dcy, audio2, raw_pre, raw_mem = bank.apply_dc_ctcss(
            hist, dcx, dcy, demod, gain, b_arr, sel, out_len=f, ns=ns)
        sp, ss = fsm.raw_sums_to_ctcss(sched, raw_pre, raw_mem, ns)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(hist))
        np.testing.assert_array_equal(np.asarray(dx1), np.asarray(dcx))
        np.testing.assert_array_equal(np.asarray(dy1), np.asarray(dcy))
        np.testing.assert_array_equal(np.asarray(audio1),
                                      np.asarray(audio2[:, :f]))
        scale = float(np.max(np.abs(np.asarray(sp_ref)))) + 1e-6
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sp_ref),
                                   rtol=0, atol=3e-5 * scale)
        np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref),
                                   rtol=0, atol=3e-5 * scale)
