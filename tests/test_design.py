"""Filter-design spec tests (the reference validates by plotting only;
SURVEY.md §4 requires real assertions)."""

import numpy as np
import scipy.signal as sig

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.taps import design as D


def _resp_db(taps, freqs, fs, gain=1.0):
    w, h = sig.freqz(taps, worN=16384, fs=fs)
    mag = np.interp(freqs, w, np.abs(h)) / gain
    return 20 * np.log10(np.maximum(mag, 1e-12))


def test_deemph_iir_matches_reference_constants():
    # src/sdr_pmr446.c:460-463 hardcodes the 50us bilinear design
    b, a = D.deemph_iir_coeffs()
    assert abs(b[0] - 0.507301437230636) < 1e-12
    assert abs(b[1] - 0.507301437230636) < 1e-12
    assert abs(a[1] - 0.014602874461272194) < 1e-12


def test_deemph_fir_equiv_is_exact():
    b, a = D.deemph_iir_coeffs()
    imp = np.zeros(64)
    imp[0] = 1
    ref = sig.lfilter(b, a, imp)
    fir = D.deemph_fir_equiv()
    assert np.max(np.abs(ref[: len(fir)] - fir)) == 0.0
    assert np.max(np.abs(ref[len(fir):])) < 1e-30


def test_resampler_taps_spec():
    h = D.resampler_taps()
    assert len(h) % C.RESAMP_L == 0
    fs_up = C.SDR_SAMPLERATE * C.RESAMP_L
    pb = _resp_db(h, np.linspace(0, 90e3, 64), fs_up, gain=C.RESAMP_L)
    sb = _resp_db(h, np.linspace(106e3, 300e3, 64), fs_up, gain=C.RESAMP_L)
    assert np.all(np.abs(pb) < 0.1), "passband ripple"
    assert np.all(sb < -58.0), "60 dB stopband"


def test_pfb_prototype_spec():
    h = D.pfb_prototype()
    assert len(h) == 2 * C.NUM_CHANNELS * C.PFB_SEMILENGTH
    fs = C.SDR_RESAMPLERATE
    assert abs(_resp_db(h, [0.0], fs)[0]) < 0.01           # unity DC gain
    edge = _resp_db(h, [C.CHANNEL_WIDTH_HZ / 2], fs)[0]    # -6 dB at half-spacing
    assert -7.5 < edge < -4.5
    adj = _resp_db(h, [1.5 * C.CHANNEL_WIDTH_HZ], fs)[0]   # next channel center
    assert adj < -75.0, "80 dB adjacent-channel rejection"


def test_ctcss_hp_spec():
    h = D.ctcss_hp_taps()
    assert len(h) == C.HP_AUDIO_FILT_TAPS
    fs = C.AUDIO_SAMPLERATE
    tones = _resp_db(h, list(C.CTCSS_FREQS), fs)
    assert np.all(tones < -55.0), "CTCSS tones rejected"
    voice = _resp_db(h, np.linspace(450, 6000, 64), fs)
    assert np.all(np.abs(voice) < 0.5), "voice band flat"


def test_audio_lp_spec():
    h = D.audio_lp_taps()
    assert len(h) == C.LP_AUDIO_FILT_TAPS
    fs = C.AUDIO_SAMPLERATE
    assert abs(_resp_db(h, [1000.0], fs)[0]) < 0.5
    assert _resp_db(h, [6000.0], fs)[0] < -30.0


def test_dc_blocker_spec():
    b, a = D.dc_blocker_coeffs()
    w, h = sig.freqz(b, a, worN=[0.0, np.pi / 2, np.pi])
    assert abs(h[0]) < 1e-9, "infinite DC rejection"
    assert abs(abs(h[2]) - 1.0) < 1e-3, "unity HF gain"


def test_channel_mask_parser():
    # src/sdr_pmr446.c:263-299 semantics: listed channels get their bits CLEARED
    full = (1 << C.MAX_CHANNELS) - 1
    m = C.parse_channel_mask("1,2,8-16")
    for ch in [1, 2] + list(range(8, 17)):
        assert not (m >> (ch - 1)) & 1
    for ch in [3, 4, 5, 6, 7, 17]:
        assert (m >> (ch - 1)) & 1
    assert C.parse_channel_mask("") == full
    import pytest
    with pytest.raises(ValueError):
        C.parse_channel_mask("0")
    with pytest.raises(ValueError):
        C.parse_channel_mask("65")


def test_resampler_print_diagnostic():
    """The msresamp_crcf_print analog (src/sdr_pmr446.c:428): rate,
    polyphase geometry, tap count, delay, stopband in one line."""
    from sdr_pmr446_tpu.taps.design import resampler_print, resampler_taps
    s = resampler_print()
    n = resampler_taps().shape[0]
    assert "25/128" in s and f"{n} taps" in s and "60 dB" in s
    assert f"{n // 25} per phase" in s


def test_deemph_exploration_candidates():
    """The reference's de-emphasis design-exploration candidates
    (scripts/filter_des.py:47-69) are reproducible: the reson_lp peaks
    near its resonance with ~+4 dB gain and the butterworth is a
    monotone lowpass; both stay within a few dB of the shipped 50 us
    one-pole across the voice band (that closeness is WHY the study
    picked the standard curve)."""
    import scipy.signal as sig
    from sdr_pmr446_tpu.taps import design as D

    br, ar = D.deemph_reson_lp()
    w, h = sig.freqz(br, ar, worN=2048, fs=12500.0)
    mag = 20 * np.log10(np.maximum(np.abs(h), 1e-12))
    pk = w[int(np.argmax(mag))]
    assert 150.0 < pk < 450.0            # resonance near 250 Hz
    assert abs(mag[0] - 4.0) < 0.5       # the +4 dB base gain
    assert 8.0 < mag.max() < 13.0        # Q=2 resonance on top

    bb, ab = D.deemph_butter_lp()
    w2, h2 = sig.freqz(bb, ab, worN=2048, fs=12500.0)
    m2 = 20 * np.log10(np.maximum(np.abs(h2), 1e-12))
    assert m2[0] > -1.0                  # unity passband
    # 3rd order: ~ -18 dB/octave beyond cutoff; strictly decreasing tail
    assert m2[-1] < -3.0
