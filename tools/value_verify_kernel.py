"""Value-verify ONE fused-front-end kernel execution on the real TPU.

Every kernel numerics gate so far runs on CPU (interpret mode); real-
backend activity has been compile probes, which prove lowering, not
values (VERDICT r3 weak #3).  This tool stages the one transfer the
tunnel's pathology permits (CLAUDE.md): a fresh process may fetch a small
f32 2-D result at process start, BEFORE any other nontrivial program has
poisoned the transfer path.

Two subprocesses:
  1. --expected: CPU backend (jax_platforms=cpu beats the axon plugin),
     runs the front-end kernel in interpret mode on a fixed seeded input,
     writes the band planes to an npz;
  2. --device: default (TPU) backend, compiles + runs the SAME kernel
     once, fetches yr/yi via runtime/transfer.fetch (f32 transport), and
     compares against the npz — the PASS line is the first value-level
     evidence that a Pallas kernel computes correctly on this hardware,
     and (because kernels pin HIGHEST) that the f32 contract-precision
     policy is in effect end to end (a bf16 contraction would show up as
     ~1e-3 relative error; the gate is 5e-5).

Run:  python tools/value_verify_kernel.py         (drives both)
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

NPZ = "/tmp/value_verify_front_end.npz"
NPZ_DUO = "/tmp/value_verify_duo.npz"
NPZ_WF = "/tmp/value_verify_duo_wf.npz"
NPZ_MONO = "/tmp/value_verify_mono.npz"
NPZ_AUDIO = "/tmp/value_verify_audio.npz"
T = 8 * 2048                  # 128 rows: one 8-row tile x 16, tiny
GATE = 5e-5                   # f32-contract rounding; bf16 would be ~1e-3
GATE_DUO = 2e-3               # demod goes through atan2: a driven channel
#                               keeps the phase well-conditioned, but the
#                               discriminator quotient amplifies rounding
#                               a few orders beyond the band's 1e-6


def _build_input():
    import numpy as np
    rng = np.random.default_rng(20260820)
    xr = rng.standard_normal(T).astype(np.float32) * 0.3
    xi = rng.standard_normal(T).astype(np.float32) * 0.3
    return xr, xi


def _run(interpret: bool):
    """One jitted program returning ONLY the f32 band planes: the complex
    state epilogue (new_dc_x/new_hist) is dead-code-eliminated, keeping
    the program in the tunnel's transfer-safe all-f32 class (complex ops
    poison later fetches — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from sdr_pmr446_tpu.kernels.front_end import PallasFrontEnd
    xr, xi = _build_input()
    fe = PallasFrontEnd(interpret=interpret)

    def band_only(xr, xi):
        dcx, dcy, hist = fe.init_state()
        _, _, _, yr, yi = fe.apply_planes(dcx, dcy, hist, xr, xi)
        return jnp.concatenate([yr, yi], axis=1)      # [rows, 50] f32

    return jax.jit(band_only)(jnp.asarray(xr), jnp.asarray(xi))


def main_expected() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    y = _run(interpret=True)
    np.savez(NPZ, y=np.asarray(y))
    print(f"expected: wrote {NPZ}", flush=True)


def main_device() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np
    exp = np.load(NPZ)["y"]
    y = _run(interpret=False)
    got = np.asarray(jax.device_get(y))   # plain f32 2-D fetch (the safe
    #                                       class, probe_precision pattern)
    scale = np.max(np.abs(exp)) + 1e-30
    rel = np.max(np.abs(got - exp)) / scale
    verdict = "PASS" if rel < GATE else "FAIL"
    print(f"value_verify band: max rel err {rel:.2e} "
          f"(gate {GATE:g}) -> {verdict}", flush=True)
    if verdict == "FAIL":
        sys.exit(1)
    print("value_verify: PASS — first value-level kernel evidence on "
          "this backend (f32 contract precision confirmed)", flush=True)


def _run_duo(interpret: bool):
    """DUO kernel (front+PFB+discriminator) on a strong single-channel
    FM signal (K=8): returns the [16, G, 25] demod plane — f32, and the
    driven channel's phase is well-conditioned everywhere."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.kernels.duo import PallasScannerDuo

    sig = synth.make_scanner_iq(8 * C.SUBCHUNK_IN, channel=5,
                                ctcss_code=12, seed=3)
    w = np.empty(2 * sig.shape[0], np.float32)
    w[0::2] = sig.real
    w[1::2] = sig.imag
    wire = w.reshape(-1, 256)
    duo = PallasScannerDuo("cf32w", interpret=interpret)

    def demod_only(wire):
        st = duo.init_state()
        out = duo.apply(st[0], st[1], st[2], st[3], st[4], st[5], wire)
        return out[3].reshape(16, -1)          # [16, F] f32

    return jax.jit(demod_only)(jnp.asarray(wire))


def main_expected_duo() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    np.savez(NPZ_DUO, y=np.asarray(_run_duo(True)))
    print(f"expected: wrote {NPZ_DUO}", flush=True)


def main_device_duo() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np
    exp = np.load(NPZ_DUO)["y"]
    got = np.asarray(jax.device_get(_run_duo(False)))
    # gate on the DRIVEN channel (5 -> row 4): its discriminator phase is
    # well-conditioned; noise-only channels are atan2-branch-flip
    # sensitive at the 1e-6 band level by nature (RESULTS.md round 3)
    ch = 4
    scale = np.max(np.abs(exp[ch])) + 1e-30
    rel = np.max(np.abs(got[ch] - exp[ch])) / scale
    verdict = "PASS" if rel < GATE_DUO else "FAIL"
    print(f"value_verify duo demod[ch5]: max rel err {rel:.2e} "
          f"(gate {GATE_DUO:g}) -> {verdict}", flush=True)
    if verdict == "FAIL":
        sys.exit(1)
    print("value_verify duo: PASS — the flagship front+PFB+discriminator "
          "kernel computes correctly on this backend", flush=True)


def _run_duo_wf(interpret: bool, wf_w: int = 80, k: int = 8):
    """DUO kernel with the in-kernel hop-PSD waterfall epilogue:
    returns the [K, w] |S|^2 sums — all-f32, matmul-only math (no
    atan2 conditioning caveat), so the front-end GATE applies.
    wf_w=80 is the uniform path; wf_w=120/k=24 exercises the round-5
    GENERAL (phase-class row-selector) path on hardware."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.kernels.duo import PallasScannerDuo

    sig = synth.make_scanner_iq(k * C.SUBCHUNK_IN, channel=5,
                                ctcss_code=12, seed=3)
    w = np.empty(2 * sig.shape[0], np.float32)
    w[0::2] = sig.real
    w[1::2] = sig.imag
    wire = w.reshape(-1, 256)
    duo = PallasScannerDuo("cf32w", interpret=interpret)

    def wf_only(wire):
        st = duo.init_state()
        out = duo.apply(st[0], st[1], st[2], st[3], st[4], st[5], wire,
                        waterfall_w=wf_w)
        return out[8]                          # [K, w] f32 PSD sums

    return jax.jit(wf_only)(jnp.asarray(wire))


def _wf_case() -> tuple:
    """(w, k, npz) from argv: wf120 flags select the general path."""
    if any("wf120" in a for a in sys.argv):
        return 120, 24, NPZ_WF.replace(".npz", "_120.npz")
    return 80, 8, NPZ_WF


def main_expected_wf() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    w, k, npz = _wf_case()
    np.savez(npz, y=np.asarray(_run_duo_wf(True, w, k)))
    print(f"expected: wrote {npz}", flush=True)


def main_device_wf() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np
    w, k, npz = _wf_case()
    exp = np.load(npz)["y"]
    got = np.asarray(jax.device_get(_run_duo_wf(False, w, k)))
    scale = np.max(np.abs(exp)) + 1e-30
    rel = np.max(np.abs(got - exp)) / scale
    verdict = "PASS" if rel < GATE else "FAIL"
    print(f"value_verify duo wf{w} PSD sums: max rel err {rel:.2e} "
          f"(gate {GATE:g}) -> {verdict}", flush=True)
    if verdict == "FAIL":
        sys.exit(1)
    print(f"value_verify wf{w}: PASS — the in-kernel hop-PSD waterfall "
          f"{'(GENERAL phase-class path) ' if w == 120 else ''}computes "
          "correctly on this backend", flush=True)


def _run_mono(interpret: bool):
    """MONO dsd chain (whole chain, ONE kernel) on a strong in-band FM
    signal: returns the 48 kHz PCM as f32 (pre-int16 cast) — all-f32
    fetch.  The discriminator is inside, but the signal keeps the phase
    well-conditioned (the dsd gate class)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.kernels.chan_tail import PallasMonoChain

    n = 8 * C.SUBCHUNK_IN
    fs = C.SDR_SAMPLERATE
    t = np.arange(n) / fs
    msg = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    sig = np.exp(1j * 2 * np.pi * (2000.0 * np.cumsum(msg)
                                   + 300.0 * np.arange(n)) / fs)
    w = np.empty(2 * n, np.float32)
    w[0::2] = sig.real
    w[1::2] = sig.imag
    wire = w.reshape(-1, 256)
    mc = PallasMonoChain("dsd", "cf32w", interpret=interpret)

    def pcm_only(wire):
        st = mc.init_state()
        out = mc.apply(*st, wire)
        return out[6].reshape(1, -1)           # [1, out48] f32

    return jax.jit(pcm_only)(jnp.asarray(wire))


def main_expected_mono() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    np.savez(NPZ_MONO, y=np.asarray(_run_mono(True)))
    print(f"expected: wrote {NPZ_MONO}", flush=True)


def main_device_mono() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np
    exp = np.load(NPZ_MONO)["y"]
    got = np.asarray(jax.device_get(_run_mono(False)))
    scale = np.max(np.abs(exp)) + 1e-30
    rel = np.max(np.abs(got - exp)) / scale
    verdict = "PASS" if rel < GATE_DUO else "FAIL"
    print(f"value_verify mono dsd PCM: max rel err {rel:.2e} "
          f"(gate {GATE_DUO:g}) -> {verdict}", flush=True)
    if verdict == "FAIL":
        sys.exit(1)
    print("value_verify mono: PASS — the one-kernel dsd chain computes "
          "correctly on this backend", flush=True)


def _run_audio(interpret: bool):
    """Audio-bank kernel (composed 640-tap FIRs + in-kernel DC blocker +
    CTCSS windowed DFT, apply_dc_ctcss_f32) on a seeded random demod
    plane, K=8: returns ONE [48, 128] f32 pack — 16 rows of strided
    audio samples (all tiles covered) + the 4 [8, 38] DFT sum planes.
    All-f32 program end to end (the f32 variant exists for exactly this
    fetch-safety reason), so the front-end GATE class applies to the
    audio rows; the DFT sums accumulate ~1.5k-term windows so they get
    a 10x-relaxed gate."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.kernels.audio_bank import PallasAudioBank

    k_sub = 8
    ns = C.SUBCHUNK_AUDIO
    out_len = k_sub * ns
    rng = np.random.default_rng(20260820)
    demod = rng.standard_normal((16, out_len)).astype(np.float32) * 0.5
    bank = PallasAudioBank(interpret=interpret)
    hist = rng.standard_normal((16, bank.hist)).astype(np.float32) * 0.5
    dc_x = rng.standard_normal(16).astype(np.float32) * 0.01
    dc_y = rng.standard_normal(16).astype(np.float32) * 0.01
    b_arr = rng.integers(0, ns, k_sub).astype(np.int32)
    sel = rng.integers(0, 16, k_sub).astype(np.int32)

    def pack(hist, dc_x, dc_y, demod, b_arr, sel):
        (_, _, _, audio, pre_re, pre_im, mem_re,
         mem_im) = bank.apply_dc_ctcss_f32(
            hist, dc_x, dc_y, demod, jnp.float32(0.15), b_arr, sel,
            out_len=out_len, ns=ns)
        a = audio[:, :out_len][:, ::76][:, :128]          # [16, 128]
        sums = jnp.concatenate([pre_re, pre_im, mem_re, mem_im], axis=0)
        sums = jnp.pad(sums, ((0, 0), (0, 128 - sums.shape[1])))
        return jnp.concatenate([a, sums], axis=0)         # [48, 128] f32

    return jax.jit(pack)(jnp.asarray(hist), jnp.asarray(dc_x),
                         jnp.asarray(dc_y), jnp.asarray(demod),
                         jnp.asarray(b_arr), jnp.asarray(sel))


def main_expected_audio() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    np.savez(NPZ_AUDIO, y=np.asarray(_run_audio(True)))
    print(f"expected: wrote {NPZ_AUDIO}", flush=True)


def main_device_audio() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np
    exp = np.load(NPZ_AUDIO)["y"]
    got = np.asarray(jax.device_get(_run_audio(False)))
    # audio rows: FIR outputs, front-end gate; sum rows: ~1.5k-term DFT
    # windows accumulate rounding, 10x headroom
    sa = np.max(np.abs(exp[:16])) + 1e-30
    ra = np.max(np.abs(got[:16] - exp[:16])) / sa
    ss = np.max(np.abs(exp[16:])) + 1e-30
    rs = np.max(np.abs(got[16:] - exp[16:])) / ss
    ok = ra < GATE and rs < 10 * GATE
    print(f"value_verify audio: audio max rel {ra:.2e} (gate {GATE:g}), "
          f"ctcss sums max rel {rs:.2e} (gate {10 * GATE:g}) -> "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    if not ok:
        sys.exit(1)
    print("value_verify audio: PASS — the audio-bank kernel (composed "
          "FIRs + DC + CTCSS DFT) computes correctly on this backend",
          flush=True)


def main() -> None:
    if "--expected" in sys.argv:
        return main_expected()
    if "--device" in sys.argv:
        return main_device()
    if "--expected-duo" in sys.argv:
        return main_expected_duo()
    if "--device-duo" in sys.argv:
        return main_device_duo()
    if "--expected-wf" in sys.argv or "--expected-wf120" in sys.argv:
        return main_expected_wf()
    if "--device-wf" in sys.argv or "--device-wf120" in sys.argv:
        return main_device_wf()
    if "--expected-mono" in sys.argv:
        return main_expected_mono()
    if "--device-mono" in sys.argv:
        return main_device_mono()
    if "--expected-audio" in sys.argv:
        return main_expected_audio()
    if "--device-audio" in sys.argv:
        return main_device_audio()
    if "--audio" in sys.argv:
        for flag in ("--expected-audio", "--device-audio"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), flag],
                timeout=2400)
            if r.returncode != 0:
                sys.exit(r.returncode)
        return
    me = os.path.abspath(__file__)
    flags = (("--expected", "--device") if "--front" in sys.argv
             else ("--expected", "--device", "--expected-duo",
                   "--device-duo", "--expected-wf", "--device-wf",
                   "--expected-wf120", "--device-wf120",
                   "--expected-mono", "--device-mono",
                   "--expected-audio", "--device-audio"))
    for flag in flags:
        r = subprocess.run([sys.executable, me, flag], timeout=2400)
        if r.returncode != 0:
            sys.exit(r.returncode)


if __name__ == "__main__":
    main()
