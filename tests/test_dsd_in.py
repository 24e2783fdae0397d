"""dsd_in chain tests: differential vs a float64 SciPy oracle chain.

Note on fidelity: the reference applies a DC blocker to raw IQ
(src/dsd_in.c:97,167), whose nonlinear phase near DC genuinely distorts an FM
signal whose carrier sits near the tuned center — a float64 SciPy rendition
of the same chain shows the identical effect.  The right correctness measure
is therefore differential SNR against that oracle chain (same taps, float64),
plus absolute sanity bounds.
"""

import numpy as np
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.scanner.dsd_in import DsdInChain


def _scipy_oracle(iq):
    """float64 rendition of the dsd_in chain with the same taps."""
    from sdr_pmr446_tpu.oracle.chain import DsdInOracle
    return DsdInOracle().process(iq)


def _mk_iq(n, tone_hz=1000.0, dev=2000.0, amp=0.5, offset_hz=300.0):
    fs = C.SDR_SAMPLERATE
    t = np.arange(n) / fs
    msg = amp * np.sin(2 * np.pi * tone_hz * t)
    return np.exp(1j * 2 * np.pi
                  * (dev * np.cumsum(msg) + offset_hz * np.arange(n)) / fs)


def test_matches_scipy_oracle():
    chain = DsdInChain(subchunks_per_step=5)
    n = 2 * chain.input_len
    iq = _mk_iq(n)
    ref = _scipy_oracle(iq)

    state = chain.init_state()
    outs = []
    for i in range(2):
        state, o = chain.step(
            state, jnp.asarray(iq[i * chain.input_len:(i + 1) * chain.input_len],
                               jnp.complex64))
        outs.append(np.asarray(o.pcm))
    pcm = np.concatenate(outs).astype(np.float64)
    assert len(pcm) == n * 3 // 64 == len(ref)

    err = pcm - ref
    snr = 10 * np.log10(np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-30))
    assert snr > 50.0, f"differential SNR vs oracle {snr:.1f} dB"

    # absolute sanity: the tone comes through (DC-blocker distortion floor
    # included, same as the reference chain exhibits on this fixture)
    tone_snr = synth.tone_snr_db(pcm[12000:] / 32767.0, 1000.0, fs=48000.0)
    assert tone_snr > 17.0


def test_high_snr_away_from_dc():
    # small deviation with the carrier offset so no significant FM line falls
    # on the DC-blocker notch: the chain is then near-transparent
    chain = DsdInChain(subchunks_per_step=5)
    n = 2 * chain.input_len
    iq = _mk_iq(n, tone_hz=1000.0, dev=800.0, amp=0.5, offset_hz=2500.0)
    state = chain.init_state()
    outs = []
    for i in range(2):
        state, o = chain.step(
            state, jnp.asarray(iq[i * chain.input_len:(i + 1) * chain.input_len],
                               jnp.complex64))
        outs.append(np.asarray(o.pcm))
    pcm = np.concatenate(outs).astype(np.float64) / 32767.0
    tone_snr = synth.tone_snr_db(pcm[12000:], 1000.0, fs=48000.0)
    assert tone_snr > 38.0, f"tone SNR {tone_snr:.1f} dB"


def test_streaming_equals_single_shot():
    chain = DsdInChain(subchunks_per_step=2)
    n = 4 * chain.input_len
    rng = np.random.default_rng(7)
    iq = (np.exp(1j * 0.3 * np.cumsum(rng.standard_normal(n)))
          ).astype(np.complex64)
    st = chain.init_state()
    parts = []
    for i in range(4):
        st, o = chain.step(st, jnp.asarray(
            iq[i * chain.input_len:(i + 1) * chain.input_len]))
        parts.append(np.asarray(o.pcm))
    streamed = np.concatenate(parts)

    big = DsdInChain(subchunks_per_step=8)
    st2 = big.init_state()
    _, o2 = big.step(st2, jnp.asarray(iq))
    single = np.asarray(o2.pcm)
    # block-size invariance: same samples regardless of chunking (s16 lsb tol)
    assert streamed.shape == single.shape
    assert np.mean(np.abs(streamed.astype(int) - single.astype(int)) <= 1) > 0.999


def test_dsd_app_device_decode_matches_host(tmp_path):
    """dsd_in --device-decode on a cs16 capture == host-converted run."""
    from sdr_pmr446_tpu.apps import dsd_in as app
    from sdr_pmr446_tpu.io import iq as iq_io
    n = 10 * C.SUBCHUNK_IN
    t = np.arange(n) / C.SDR_SAMPLERATE
    msg = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    iq = 0.8 * np.exp(1j * 2 * np.pi *
                      (2000 * np.cumsum(msg) + 2500 * np.arange(n))
                      / C.SDR_SAMPLERATE)
    iqp = str(tmp_path / "cap.cs16")
    iq_io.write_iq(iqp, iq, "cs16")
    o1, o2 = str(tmp_path / "h.raw"), str(tmp_path / "d.raw")
    base = ["--input", iqp, "--subchunks-per-step", "5"]
    assert app.main(base + ["--output", o1]) == 0
    assert app.main(base + ["--output", o2, "--device-decode"]) == 0
    np.testing.assert_array_equal(np.fromfile(o1, dtype="<i2"),
                                  np.fromfile(o2, dtype="<i2"))


def test_pallas_engine_matches_xla():
    """The fused engine (front-end kernel + chan_tail kernel, two Pallas
    launches end to end) == the XLA op chain, streaming across steps.
    PCM is int16: gate differential SNR + max LSB error."""
    K = 8
    n = K * C.SUBCHUNK_IN
    iq = _mk_iq(2 * n)
    ref = DsdInChain(K)
    pal = DsdInChain(K, use_pallas=True, pallas_interpret=True)
    st1, st2 = ref.init_state(), pal.init_state()
    for i in range(2):
        x = jnp.asarray(iq[i * n:(i + 1) * n], jnp.complex64)
        st1, o1 = ref.step(st1, x)
        st2, o2 = pal.step(st2, x)
        p1 = np.asarray(o1.pcm, np.float64)
        p2 = np.asarray(o2.pcm, np.float64)
        err = p1 - p2
        snr = 10 * np.log10(np.mean(p1 ** 2) / max(np.mean(err ** 2),
                                                   1e-30))
        assert snr > 60.0, f"step {i}: {snr:.1f} dB"
        assert np.abs(err).max() <= 2.0


def test_pallas_engine_packed_wire():
    """cs16 wire bytes through the fused engine's in-kernel decode == the
    XLA chain fed the host-decoded samples of the same wire."""
    from sdr_pmr446_tpu.ops import decode as decode_op
    K = 8
    n = K * C.SUBCHUNK_IN
    iq = _mk_iq(n)
    raw = decode_op.pack_iq(iq, "cs16")
    dec = decode_op.decode_complex(jnp.asarray(raw), "cs16")
    ref = DsdInChain(K)
    pal = DsdInChain(K, input_format="cs16", use_pallas=True,
                     pallas_interpret=True)
    st1, o1 = ref.step(ref.init_state(), dec)
    st2, o2 = pal.step(pal.init_state(),
                       jnp.asarray(raw).reshape(pal.step_arg_shape))
    p1 = np.asarray(o1.pcm, np.float64)
    p2 = np.asarray(o2.pcm, np.float64)
    err = p1 - p2
    snr = 10 * np.log10(np.mean(p1 ** 2) / max(np.mean(err ** 2), 1e-30))
    assert snr > 60.0, f"{snr:.1f} dB"


def test_mono_engine_equals_two_kernel():
    """The MONO engine (whole chain in ONE kernel — band never leaves
    VMEM) == the two-kernel fused engine, streaming.  The band carries
    are bit-exact; sig/PCM differ only by matmul-shape accumulation
    order (different group tiling), so gate at f32 rounding."""
    K = 8
    n = K * C.SUBCHUNK_IN
    iq = _mk_iq(2 * n)
    two = DsdInChain(K, use_pallas=True, pallas_interpret=True,
                     mono=False)
    one = DsdInChain(K, use_pallas=True, pallas_interpret=True)
    assert one.mono and not two.mono
    st1, st2 = two.init_state(), one.init_state()
    for i in range(2):
        x = jnp.asarray(iq[i * n:(i + 1) * n], jnp.complex64)
        st1, o1 = two.step(st1, x)
        st2, o2 = one.step(st2, x)
        d = np.abs(np.asarray(o1.pcm, np.int32)
                   - np.asarray(o2.pcm, np.int32))
        assert d.max() <= 1, f"step {i}: {d.max()} LSB"
