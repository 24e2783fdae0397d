"""Faithful-mode scanner: exact equality with the oracle THROUGH transitions.

The fast chain documents small transition-transient deviations; faithful
mode must have none — gated filters, frozen state, freqdem resets, shared
DC blocker — so the comparison includes every tuned sub-chunk with no
exclusions, at f32-vs-f64 tolerance.
"""

import numpy as np
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.oracle.chain import ScannerOracle
from sdr_pmr446_tpu.scanner.chain import make_runtime_params
from sdr_pmr446_tpu.scanner.faithful import FaithfulScannerChain


def _run_faithful(iq, args, k=5):
    chain = FaithfulScannerChain(subchunks_per_step=k,
                                 lowpass=args.lowpass)
    params = make_runtime_params(args)
    st = chain.init_state()
    outs = []
    for i in range(len(iq) // chain.input_len):
        st, o = chain.step(st, jnp.asarray(
            iq[i * chain.input_len:(i + 1) * chain.input_len],
            jnp.complex64), params)
        outs.append(o)
    cat = lambda f: np.concatenate([np.asarray(getattr(o, f)) for o in outs])
    return {f: cat(f) for f in outs[0]._fields}


def _busy_scenario():
    """tune ch3 -> stronger ch7 appears (lock max switches) -> silence
    (detune) -> ch5 with CTCSS -> end."""
    n1 = 15 * C.SUBCHUNK_IN
    seg1 = synth.make_scanner_iq(n1, channel=3, ctcss_code=20, seed=1)
    seg2a = synth.make_scanner_iq(n1, channel=3, amplitude=0.4,
                                  ctcss_code=20, seed=2, start_sample=n1)
    seg2b = synth.make_scanner_iq(n1, channel=7, amplitude=1.0,
                                  tone_hz=700.0, seed=3, start_sample=n1)
    rng = np.random.default_rng(4)
    seg3 = 1e-3 * (rng.standard_normal(n1) + 1j * rng.standard_normal(n1))
    seg4 = synth.make_scanner_iq(n1, channel=5, ctcss_code=12, seed=5,
                                 start_sample=3 * n1)
    return np.concatenate([seg1, seg2a + seg2b, seg3, seg4])


def test_faithful_matches_oracle_through_transitions():
    args = C.ScannerArgs(lock_mode="max")
    iq = _busy_scenario()
    ora = ScannerOracle(args)
    ora.process(iq)
    outs = _run_faithful(iq, args)

    np.testing.assert_array_equal(outs["active_chan"],
                                  np.asarray(ora.active_trace))
    kinds = [e.kind for e in ora.events]
    assert "tuned" in kinds and "changed" in kinds and "detuned" in kinds

    # audio: exact sample-for-sample comparison, NO sub-chunks excluded
    valid = outs["audio_valid"]
    jax_audio = outs["audio"][valid].ravel()
    ora_audio = np.concatenate(ora.audio)
    assert jax_audio.shape == ora_audio.shape
    err = jax_audio - ora_audio
    denom = max(float(np.mean(ora_audio ** 2)), 1e-30)
    snr = 10 * np.log10(denom / max(float(np.mean(err ** 2)), 1e-30))
    assert snr > 60.0, f"faithful-mode SNR vs oracle {snr:.1f} dB"
    # peak error bound too (f32 vs f64 arithmetic only)
    assert np.max(np.abs(err)) < 2e-2, np.max(np.abs(err))

    # detector trajectory identical
    assert bool(ora.goertzel.tone_detected) == bool(outs["ct_detected"][-1])
    assert ora.goertzel.max_power_index == outs["ct_max_idx"][-1]


def test_faithful_lowpass_variant():
    args = C.ScannerArgs(lowpass=True)
    n = 15 * C.SUBCHUNK_IN
    iq = synth.make_scanner_iq(n, channel=5, ctcss_code=12)
    ora = ScannerOracle(args)
    ora.process(iq)
    outs = _run_faithful(iq, args)
    jax_audio = outs["audio"][outs["audio_valid"]].ravel()
    ora_audio = np.concatenate(ora.audio)
    err = jax_audio - ora_audio
    snr = 10 * np.log10(np.mean(ora_audio ** 2)
                        / max(np.mean(err ** 2), 1e-30))
    assert snr > 60.0, f"{snr:.1f}"


def test_randomized_event_soak():
    """Randomized multi-event schedule: control decisions must match the
    oracle exactly for the fast chain, and faithful-mode audio must match
    through every transition."""
    rng = np.random.default_rng(123)
    segs = []
    t0 = 0
    for _ in range(6):
        n = int(rng.integers(5, 9)) * C.SUBCHUNK_IN
        kind = rng.choice(["sig", "noise", "two"])
        if kind == "noise":
            segs.append(2e-3 * (rng.standard_normal(n)
                                + 1j * rng.standard_normal(n)))
        else:
            ch = int(rng.integers(1, 17))
            code = int(rng.integers(1, 39))
            s = synth.make_scanner_iq(n, channel=ch, ctcss_code=code,
                                      tone_hz=float(rng.integers(500, 2500)),
                                      seed=int(rng.integers(1 << 30)),
                                      start_sample=t0)
            if kind == "two":
                ch2 = (ch + 7) % 16 + 1
                s = s + synth.make_scanner_iq(
                    n, channel=ch2, amplitude=0.5, tone_hz=800.0,
                    seed=int(rng.integers(1 << 30)), start_sample=t0)
            segs.append(s)
        t0 += n
    iq = np.concatenate(segs)
    iq = iq[: (len(iq) // (5 * C.SUBCHUNK_IN)) * (5 * C.SUBCHUNK_IN)]

    args = C.ScannerArgs(lock_mode="max")
    ora = ScannerOracle(args)
    ora.process(iq)

    # fast chain: control equality
    from sdr_pmr446_tpu.scanner.chain import ScannerChain
    chain = ScannerChain(C.BlockConfig(5))
    params = make_runtime_params(args)
    st = chain.init_state()
    traces = []
    for i in range(len(iq) // chain.block.input_len):
        st, o = chain.step(st, jnp.asarray(
            iq[i * chain.block.input_len:(i + 1) * chain.block.input_len],
            jnp.complex64), params)
        traces.append(np.asarray(o.active_chan))
    np.testing.assert_array_equal(np.concatenate(traces),
                                  np.asarray(ora.active_trace))

    # faithful chain: audio equality through transitions
    outs = _run_faithful(iq, args)
    np.testing.assert_array_equal(outs["active_chan"],
                                  np.asarray(ora.active_trace))
    if len(ora.audio):
        jax_audio = outs["audio"][outs["audio_valid"]].ravel()
        ora_audio = np.concatenate(ora.audio)
        err = jax_audio - ora_audio
        snr = 10 * np.log10(max(np.mean(ora_audio ** 2), 1e-30)
                            / max(np.mean(err ** 2), 1e-30))
        assert snr > 55.0, f"soak faithful SNR {snr:.1f} dB"
