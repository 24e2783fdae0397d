"""End-to-end scanner tests vs the reference-semantics oracle.

Synthetic golden-IQ fixtures (SURVEY.md §4): NBFM voice + CTCSS on known
channels, AWGN floor.  The JAX chain must reproduce the oracle's control
behavior (tune/detune/channel/CTCSS decisions, per sub-chunk) exactly, and
its audio within an SNR bound away from transition transients.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.oracle.chain import ScannerOracle, GoertzelDetector
from sdr_pmr446_tpu.scanner.chain import (ScannerChain, make_runtime_params)


def run_chain(iq, args=None, subchunks_per_step=5, **chain_kw):
    args = args or C.ScannerArgs()
    chain = ScannerChain(C.BlockConfig(subchunks_per_step),
                         lowpass=args.lowpass, fir_deemph=args.fir_deemph,
                         **chain_kw)
    params = make_runtime_params(args)
    state = chain.init_state()
    outs = []
    step_len = chain.block.input_len
    assert len(iq) % step_len == 0
    for i in range(len(iq) // step_len):
        state, out = chain.step(
            state, jnp.asarray(iq[i * step_len:(i + 1) * step_len],
                               jnp.complex64), params)
        outs.append(out)
    cat = lambda f: np.concatenate([np.asarray(getattr(o, f)) for o in outs])
    return state, {f: cat(f) for f in outs[0]._fields}, chain


class TestGoertzelReformulation:
    """The windowed-DFT |sum x e^{-jwk}|^2 identity vs the per-sample bank."""

    def test_power_identity(self):
        rng = np.random.default_rng(1)
        n = C.CTCSS_BLOCK_SIZE
        x = (0.2 * np.sin(2 * np.pi * 110.9 * np.arange(n) / 12500)
             + 0.05 * rng.standard_normal(n))
        g = GoertzelDetector()
        g.analyze(x)
        w = 2 * np.pi * np.asarray(C.CTCSS_FREQS) / 12500
        dft = np.abs(np.exp(-1j * np.outer(w, np.arange(n))) @ x) ** 2
        np.testing.assert_allclose(dft, g.power, rtol=1e-6, atol=1e-6)


class TestScannerE2E:
    def _mk_iq(self, seconds=3.0, channel=5, ctcss_code=12, **kw):
        n_sub = int(round(seconds * C.SDR_SAMPLERATE / C.SUBCHUNK_IN))
        n_sub -= n_sub % 5          # multiple of subchunks_per_step
        n = n_sub * C.SUBCHUNK_IN
        return synth.make_scanner_iq(n, channel=channel,
                                     ctcss_code=ctcss_code, **kw)

    def test_tunes_detects_and_matches_oracle(self):
        iq = self._mk_iq(seconds=3.0, channel=5, ctcss_code=12)
        ora = ScannerOracle()
        ora.process(iq)
        state, outs, _ = run_chain(iq)

        # control behavior matches the oracle sub-chunk by sub-chunk
        np.testing.assert_array_equal(outs["active_chan"],
                                      np.asarray(ora.active_trace))
        assert outs["active_chan"][-1] == 4            # tuned to channel 5
        assert outs["ev_tuned"].sum() == 1
        kinds = [e.kind for e in ora.events]
        assert "tuned" in kinds and "ctcss_acquired" in kinds

        # CTCSS: correct code detected, stays detected
        det = outs["ct_detected"]
        idx = outs["ct_max_idx"]
        assert det[-1] and idx[-1] == 11               # code 12 (0-based 11)
        assert outs["ev_ct_acquired"].sum() == 1
        # detection trajectory matches oracle exactly
        # (oracle records per-subchunk state via events only; compare final)
        assert bool(ora.goertzel.tone_detected) == bool(det[-1])
        assert ora.goertzel.max_power_index == idx[-1]

        # absolute per-channel RSSI matches find_max inputs
        np.testing.assert_allclose(
            outs["rssi_db"], np.stack(ora.rssi_trace), rtol=0, atol=0.05)
        np.testing.assert_allclose(
            outs["rel_rssi"][-1], ora.rssi, rtol=0, atol=0.05)

    def test_audio_matches_oracle_snr(self):
        iq = self._mk_iq(seconds=3.0, channel=5, ctcss_code=12)
        ora = ScannerOracle()
        ora.process(iq)
        _, outs, _ = run_chain(iq)

        # assemble both audio streams over tuned sub-chunks
        valid = outs["audio_valid"]
        jax_audio = outs["audio"][valid]
        ora_audio = np.stack(ora.audio)
        assert jax_audio.shape == ora_audio.shape
        # skip the tune transient (filters settle within ~2 sub-chunks)
        j = jax_audio[2:].ravel()
        o = ora_audio[2:].ravel()
        err = j - o
        snr = 10 * np.log10(np.mean(o ** 2) / max(np.mean(err ** 2), 1e-30))
        assert snr > 40.0, f"audio SNR vs oracle too low: {snr:.1f} dB"

        # and the audio is the expected demodulated tone
        tone_snr = synth.tone_snr_db(j, 1000.0)
        assert tone_snr > 30.0, f"tone SNR {tone_snr:.1f} dB"

    def test_squelch_stays_scanning_on_noise(self):
        n = 15 * C.SUBCHUNK_IN
        rng = np.random.default_rng(3)
        iq = (1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
              ).astype(np.complex128)
        _, outs, _ = run_chain(iq)
        assert np.all(outs["active_chan"] == -1)
        assert not outs["audio_valid"].any()
        ora = ScannerOracle()
        ora.process(iq)
        np.testing.assert_array_equal(outs["active_chan"],
                                      np.asarray(ora.active_trace))

    def test_detune_on_signal_drop(self):
        # signal present for first half, then noise -> tune then detune
        iq1 = self._mk_iq(seconds=1.5, channel=3, ctcss_code=None)
        n2 = len(iq1)
        rng = np.random.default_rng(4)
        iq2 = 1e-3 * (rng.standard_normal(n2) + 1j * rng.standard_normal(n2))
        iq = np.concatenate([iq1, iq2])
        ora = ScannerOracle()
        ora.process(iq)
        _, outs, _ = run_chain(iq)
        np.testing.assert_array_equal(outs["active_chan"],
                                      np.asarray(ora.active_trace))
        assert outs["ev_tuned"].sum() == 1
        assert outs["ev_detuned"].sum() == 1
        assert outs["active_chan"][-1] == -1

    def test_channel_mask_excludes(self):
        # mask out channel 5 (reference -m semantics: listed channels cleared)
        args = C.ScannerArgs(channel_mask=C.parse_channel_mask("5"))
        iq = self._mk_iq(seconds=1.5, channel=5, ctcss_code=None)
        _, outs, _ = run_chain(iq, args=args)
        assert np.all(outs["active_chan"] != 4)
        ora = ScannerOracle(args)
        ora.process(iq)
        np.testing.assert_array_equal(outs["active_chan"],
                                      np.asarray(ora.active_trace))

    def test_lock_mode_max_switches(self):
        # ch 2 strong first, then ch 7 stronger: lock_mode=max must switch
        half = self._mk_iq(seconds=1.5, channel=2, amplitude=0.5,
                           ctcss_code=None)
        n = len(half)
        strong = synth.make_scanner_iq(n, channel=7, amplitude=1.0,
                                       tone_hz=700.0, seed=9,
                                       start_sample=n)
        weak2 = synth.make_scanner_iq(n, channel=2, amplitude=0.5,
                                      tone_hz=1000.0, seed=10,
                                      start_sample=n)
        iq = np.concatenate([half, weak2 + strong])
        args = C.ScannerArgs(lock_mode="max")
        ora = ScannerOracle(args)
        ora.process(iq)
        _, outs, _ = run_chain(iq, args=args)
        np.testing.assert_array_equal(outs["active_chan"],
                                      np.asarray(ora.active_trace))
        assert outs["ev_changed"].sum() >= 1
        assert outs["active_chan"][-1] == 6

    def test_checkpoint_resume(self):
        from sdr_pmr446_tpu.runtime import state as S
        iq = self._mk_iq(seconds=2.0, channel=5, ctcss_code=12)
        # run full
        _, outs_full, chain = run_chain(iq)
        # run half, checkpoint, restore, run rest
        step_len = chain.block.input_len
        params = make_runtime_params(C.ScannerArgs())
        st = chain.init_state()
        half_steps = len(iq) // step_len // 2
        outs1 = []
        for i in range(half_steps):
            st, o = chain.step(st, jnp.asarray(
                iq[i * step_len:(i + 1) * step_len], jnp.complex64), params)
            outs1.append(o)
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "ckpt.npz")
            S.save_state(p, half_steps, st)
            idx, st2 = S.load_state(p)
        assert idx == half_steps
        outs2 = []
        for i in range(half_steps, len(iq) // step_len):
            st2, o = chain.step(st2, jnp.asarray(
                iq[i * step_len:(i + 1) * step_len], jnp.complex64), params)
            outs2.append(o)
        audio_resumed = np.concatenate(
            [np.asarray(o.audio) for o in outs1 + outs2])
        np.testing.assert_allclose(audio_resumed, outs_full["audio"],
                                   rtol=0, atol=1e-6)


class TestVariants:
    def _iq(self, seconds=2.0):
        n = int(seconds * C.SDR_SAMPLERATE)
        n -= n % (5 * C.SUBCHUNK_IN)
        return synth.make_scanner_iq(n, channel=5, ctcss_code=12)

    def _compare(self, args):
        iq = self._iq()
        ora = ScannerOracle(args)
        ora.process(iq)
        _, outs, _ = run_chain(iq, args=args)
        np.testing.assert_array_equal(outs["active_chan"],
                                      np.asarray(ora.active_trace))
        j = outs["audio"][outs["audio_valid"]][2:].ravel()
        o = np.stack(ora.audio)[2:].ravel()
        snr = 10 * np.log10(np.mean(o ** 2)
                            / max(np.mean((j - o) ** 2), 1e-30))
        return snr

    def test_lowpass_variant(self):
        snr = self._compare(C.ScannerArgs(lowpass=True))
        assert snr > 40.0, f"lowpass variant SNR {snr:.1f}"

    def test_fir_deemph_variant(self):
        snr = self._compare(C.ScannerArgs(fir_deemph=True))
        assert snr > 40.0, f"fir-deemph variant SNR {snr:.1f}"

    def test_audio_gain_and_squelch(self):
        snr = self._compare(C.ScannerArgs(audio_gain=2.5, squelch_level=12.0))
        assert snr > 40.0


def test_step_size_invariance():
    """Outputs must not depend on how many sub-chunks one jitted step packs
    (the state carry is exact): K=5 vs K=10 give identical streams."""
    iq = synth.make_scanner_iq(20 * C.SUBCHUNK_IN, channel=5, ctcss_code=12)
    _, o5, _ = run_chain(iq, subchunks_per_step=5)
    _, o10, _ = run_chain(iq, subchunks_per_step=10)
    np.testing.assert_array_equal(o5["active_chan"], o10["active_chan"])
    np.testing.assert_array_equal(o5["ct_detected"], o10["ct_detected"])
    # fp reassociation across different conv batch extents gives ~1e-4 dB
    np.testing.assert_allclose(o5["rssi_db"], o10["rssi_db"],
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(o5["audio"], o10["audio"], rtol=0, atol=1e-4)


@pytest.mark.parametrize("fmt", ["cs16", "cu8", "cf32w"])
@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_packed_input_chain_equals_cf32(fmt, engine):
    """Chain fed RAW wire bytes (decoded on device, ops/decode.py) is
    bit-identical to the cf32 chain fed the host-converted samples.

    cf32w is the lossless case: the f32 wire bytes ARE the complex64
    capture, consumed in place by the fused front end (pallas engine).
    Exception: cu8 under pallas runs the WIDE-row fused kernel
    (kernels/front_end.py::apply_packed2) whose width-256 constants
    reorder f32 summations — decisions stay bit-exact but float outputs
    match to fp tolerance rather than bit-for-bit."""
    from sdr_pmr446_tpu.ops import decode
    k = 3
    n = 2 * C.BlockConfig(k).input_len
    iq = synth.make_scanner_iq(n, channel=5, ctcss_code=12)
    packed = decode.pack_iq(iq, fmt)                 # quantized wire bytes
    xr, xi = decode.decode_planes(jnp.asarray(packed), fmt)
    host_iq = (np.asarray(xr) + 1j * np.asarray(xi)).astype(np.complex64)

    kw = dict(use_pallas=(engine == "pallas"), pallas_interpret=True)
    params = make_runtime_params(C.ScannerArgs())

    ref_chain = ScannerChain(C.BlockConfig(k), **kw)
    pkd_chain = ScannerChain(C.BlockConfig(k), input_format=fmt, **kw)
    assert pkd_chain.step_arg_len == n // 2 // decode.PACKED_FORMATS[fmt]
    st_r, st_p = ref_chain.init_state(), pkd_chain.init_state()
    wlen = pkd_chain.step_arg_len
    for i in range(2):
        st_r, o_r = ref_chain.step(
            st_r, jnp.asarray(host_iq[i * ref_chain.input_len:
                                      (i + 1) * ref_chain.input_len]),
            params)
        st_p, o_p = pkd_chain.step(
            st_p, jnp.asarray(packed[i * wlen:(i + 1) * wlen]), params)
        wide_kernel = engine == "pallas" and fmt in ("cu8", "cs8")
        for f in o_r._fields:
            a = np.asarray(getattr(o_r, f))
            b = np.asarray(getattr(o_p, f))
            if wide_kernel and a.dtype.kind == "f":
                np.testing.assert_allclose(
                    a, b, rtol=0,
                    atol=(1e-2 if f == "rssi_db" else 1e-4),
                    err_msg=f"{fmt}/{engine} field {f} step {i}")
            else:
                np.testing.assert_array_equal(
                    a, b, err_msg=f"{fmt}/{engine} field {f} step {i}")


def test_fused_ctcss_chain_equality():
    """fuse_ctcss (in-kernel CTCSS DFT driven by the RSSI-only schedule)
    vs the lp-plane path: every decision/event stream exact, audio
    bit-exact (the audio column is untouched by the fusion)."""
    iq = synth.make_scanner_iq(10 * C.SUBCHUNK_IN, channel=5, ctcss_code=12)
    res = {}
    for name, on in [("off", False), ("on", True)]:
        _, outs, _ = run_chain(iq, use_pallas=True, pallas_interpret=True,
                               fuse_ctcss=on)
        res[name] = outs
    a, b = res["off"], res["on"]
    for f in a:
        if f == "waterfall":
            continue
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_fuse_band_duo_chain_equality():
    """fuse_band (front end + PFB in ONE kernel, kernels/duo.py — the
    band never leaves VMEM) vs the two-kernel group path: decisions and
    CTCSS events exact, audio to f32 rounding, streaming state carried."""
    iq = synth.make_scanner_iq(16 * C.SUBCHUNK_IN, channel=5,
                               ctcss_code=12)
    res = {}
    for name, fb in [("trio", False), ("duo", True)]:
        _, outs, ch = run_chain(iq, subchunks_per_step=8, use_pallas=True,
                                pallas_interpret=True, fuse_band=fb)
        assert ch.fuse_band == fb
        res[name] = outs
    a, b = res["trio"], res["duo"]
    for f in a:
        if f in ("audio", "rel_rssi", "rssi_db", "ct_freq", "waterfall"):
            continue
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)
    np.testing.assert_allclose(a["rssi_db"], b["rssi_db"], rtol=0,
                               atol=5e-3)
    assert np.max(np.abs(a["audio"] - b["audio"])) < 1e-4


@pytest.mark.parametrize("w", [64, 80])
def test_duo_in_kernel_waterfall_matches_asgram(w):
    """The duo kernel's in-kernel hop-PSD waterfall epilogue (only the
    [K, w] |S|^2 sums ever leave VMEM) vs the trio path's band_out + XLA
    asgram tap: same dB rows across streaming steps (the cross-step hop
    window rides the PFB's own band-row history carry)."""
    from sdr_pmr446_tpu.ops import spectrogram
    assert spectrogram.kernel_wf_supported(w)
    iq = synth.make_scanner_iq(16 * C.SUBCHUNK_IN, channel=5,
                               ctcss_code=12)
    res = {}
    for name, fb in [("trio", False), ("duo", True)]:
        _, outs, ch = run_chain(iq, subchunks_per_step=8, use_pallas=True,
                                pallas_interpret=True, fuse_band=fb,
                                waterfall=w)
        assert ch.fuse_band == fb
        res[name] = outs["waterfall"]
    np.testing.assert_allclose(res["duo"], res["trio"], rtol=0, atol=2e-3)


def test_duo_waterfall_unsupported_width_falls_back():
    """w=120 (hop 30 does not divide the sub-chunk): the duo runs
    band_out + the XLA asgram-any tap, rows equal to the trio path's."""
    from sdr_pmr446_tpu.ops import spectrogram
    w = 120
    assert not spectrogram.kernel_wf_supported(w)
    iq = synth.make_scanner_iq(8 * C.SUBCHUNK_IN, channel=5,
                               ctcss_code=12)
    res = {}
    for name, fb in [("trio", False), ("duo", True)]:
        _, outs, _ = run_chain(iq, subchunks_per_step=8, use_pallas=True,
                               pallas_interpret=True, fuse_band=fb,
                               waterfall=w)
        res[name] = outs["waterfall"]
    np.testing.assert_allclose(res["duo"], res["trio"], rtol=0, atol=2e-3)


@pytest.mark.parametrize("w,k", [(128, 16), (120, 24)])
def test_duo_in_kernel_waterfall_general_widths(w, k):
    """VERDICT r4 #4: widths whose hop does NOT divide the 400-sample
    group row (w=120 is the reference README's own demo width) run
    in-kernel via the phase-class row-selector epilogue at phase-reset
    geometries — dB rows equal the band_out + XLA asgram-any tap across
    streaming steps (the per-step hop phase provably returns to 0)."""
    from sdr_pmr446_tpu.ops import spectrogram
    assert not spectrogram.kernel_wf_supported(w)          # not uniform
    assert spectrogram.kernel_wf_supported(w, k=k)         # general
    iq = synth.make_scanner_iq(2 * k * C.SUBCHUNK_IN, channel=5,
                               ctcss_code=12)
    res = {}
    for name, fb in [("trio", False), ("duo", True)]:
        _, outs, ch = run_chain(iq, subchunks_per_step=k, use_pallas=True,
                                pallas_interpret=True, fuse_band=fb,
                                waterfall=w)
        assert ch.fuse_band == fb
        res[name] = outs["waterfall"]
    np.testing.assert_allclose(res["duo"], res["trio"], rtol=0, atol=2e-3)


def test_wf_row_counts_match_onehot_oracle():
    """wf_row_counts (the static per-row averages of the general
    in-kernel path) equals the one-hot fire counting of asgram_rows_any
    at phase 0, for every legal width class."""
    from sdr_pmr446_tpu.ops import spectrogram
    sub = C.SUBCHUNK_RESAMP
    for w, k in [(120, 24), (128, 16), (64, 8), (24, 24)]:
        delay = w // 4
        counts = spectrogram.wf_row_counts(w, k)
        assert counts.shape == (k,)
        assert counts.sum() == (k * sub) // delay
        ends = np.arange(delay, k * sub + 1, delay)
        ref = np.zeros(k)
        for e in ends:
            ref[(e - 1) // sub] += 1
        np.testing.assert_array_equal(counts, ref)
