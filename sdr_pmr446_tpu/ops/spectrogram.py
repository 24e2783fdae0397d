"""Sliding windowed periodogram — liquid asgramcf/spgramcf semantics.

The reference's waterfall feeds EVERY resampled band sample into a liquid
``asgramcf`` (src/sdr_pmr446.c:473-477, 910-919), which wraps a ``spgramcf``
streaming periodogram: with FFT size ``w`` (the ``-w`` flag), a length
``w/2`` window slides in hops of ``w/4`` samples; each hop's windowed
segment is zero-padded to ``w``, FFT'd, and its ``|X|^2`` accumulated; the
displayed row is the dB average since the previous row.

This op is the TPU-native block formulation: all hops of a whole block are
computed as ONE batched FFT over a strided window matrix (built from two
frame-row slices — windows overlap 50% so no gather is needed), then
averaged per sub-chunk.  Streaming state is the last ``w/2`` band samples.

Documented deviations from liquid (display-only, test-gated against
oracle.asgram_rows which defines the semantics):
  - window function is Hamming (liquid's spgram default window family is
    implementation-detail; the scale constants -40 dB/2 dB still map the
    same dynamic range);
  - normalization is coherent-gain (a unit complex exponential reads
    ~0 dB), matching the scale the repo's renderer was tuned to.

Any width that is a multiple of 4 (>= 8, hop <= sub-chunk) works — the
reference's README demo is ``-w 120`` (README.md:27) and its asgram ring
absorbs any width (src/sdr_pmr446.c:473-477).  Widths whose hop divides
the sub-chunk take the static fast path (asgram_rows: every sub-chunk
fires the same transform count at the same phases); all others take
asgram_rows_any, which carries the oracle's in-hop sample counter as
state, extracts the phase-shifted windows with one traced roll, and
assigns each transform to its sub-chunk row with a one-hot matmul — the
variable per-row transform counts become a masked average over a static
max-hop matrix.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C


def validate_width(w: int, subchunk: int = C.SUBCHUNK_RESAMP) -> None:
    if w <= 0:
        return
    if w % 4 != 0 or w < 8:
        raise ValueError(f"waterfall width must be a multiple of 4, >= 8 "
                         f"(got {w})")
    if w // 4 > subchunk:
        raise ValueError(
            f"waterfall width {w}: hop {w // 4} exceeds the sub-chunk "
            f"band length {subchunk} (some rows would have no transform)")


def uses_fast_path(w: int, subchunk: int = C.SUBCHUNK_RESAMP) -> bool:
    """True when the hop divides the sub-chunk: phase is statically zero
    and the carried hop counter never leaves 0."""
    return w > 0 and subchunk % (w // 4) == 0


def hist_len(w: int) -> int:
    return w // 2


@functools.lru_cache(maxsize=None)
def _window(w: int) -> np.ndarray:
    wl = w // 2
    win = np.hamming(wl + 1)[:wl]          # periodic Hamming, length w/2
    return (win / np.sum(win)).astype(np.float32)   # coherent normalization


@functools.lru_cache(maxsize=None)
def _dft_planes(w: int) -> np.ndarray:
    """[2, w//2, w] f32: re/im of the zero-padded w-point DFT matrix.

    The hop FFTs are tiny non-power-of-2 transforms (w is typically 64-200)
    over tens of thousands of windows per block — as a dense DFT they map
    straight onto the MXU instead of XLA's generic FFT path.  Only the
    first w//2 rows are needed (hops are zero-padded from w/2 to w).
    """
    wl = w // 2
    j = np.arange(wl)[:, None]
    k = np.arange(w)[None, :]
    m = np.exp(-2j * np.pi * j * k / w)
    return np.stack([m.real, m.imag]).astype(np.float32)


def asgram_init(w: int) -> jax.Array:
    return jnp.zeros((hist_len(w),), jnp.complex64)


def asgram_rows(hist: jax.Array, band: jax.Array, k: int, w: int,
                subchunk: int = C.SUBCHUNK_RESAMP):
    """hist [w//2] c64, band [k*subchunk] c64 -> (new_hist, rows [k, w] f32).

    Row j is the dB-average periodogram of sub-chunk j's hops (fftshifted,
    DC at center), i.e. exactly what asgramcf_execute prints per chunk.
    """
    wl = w // 2
    delay = w // 4
    n_seg = subchunk // delay              # transforms per sub-chunk
    n_tot = k * n_seg
    xe = jnp.concatenate([hist, band])     # [(n_tot + 2) * delay]
    frames = xe.reshape(n_tot + 2, delay)
    # hop t's window = xe[(t+1)*delay : (t+1)*delay + wl] = frame rows
    # t+1, t+2 — 50% overlap means two shifted row-slices, no gather
    windows = jnp.concatenate([frames[1:n_tot + 1], frames[2:n_tot + 2]],
                              axis=-1)     # [n_tot, wl]
    p = _periodograms(windows, w).reshape(k, n_seg, w)
    p_avg = jnp.mean(p, axis=1)
    rows = 10.0 * jnp.log10(jnp.maximum(p_avg, 1e-30)).astype(jnp.float32)
    rows = jnp.fft.fftshift(rows, axes=-1)
    new_hist = xe[xe.shape[-1] - wl:]
    return new_hist, rows


def _periodograms(windows: jax.Array, w: int) -> jax.Array:
    """[n, w//2] c64 windows -> [n, w] |FFT|^2 via MXU DFT matmuls."""
    win = jnp.asarray(_window(w))
    wr = jnp.real(windows) * win[None, :]
    wi = jnp.imag(windows) * win[None, :]
    dft = _dft_planes(w)
    fr = jnp.asarray(dft[0])
    fi = jnp.asarray(dft[1])
    hi = jax.lax.Precision.HIGHEST
    sr = (jnp.matmul(wr, fr, precision=hi)
          - jnp.matmul(wi, fi, precision=hi))
    si = (jnp.matmul(wr, fi, precision=hi)
          + jnp.matmul(wi, fr, precision=hi))
    return sr ** 2 + si ** 2


def asgram_rows_any(hist: jax.Array, cnt: jax.Array, band: jax.Array,
                    k: int, w: int, subchunk: int = C.SUBCHUNK_RESAMP,
                    cnt_offset: jax.Array | None = None):
    """Arbitrary-width variant: hop w/4 need NOT divide the sub-chunk.

    hist [w//2] c64; cnt i32 scalar — the oracle's in-hop sample counter
    (samples consumed since the last transform fired, in [0, delay));
    band [k*subchunk] c64.  Returns (new_hist, new_cnt, rows [k, w]).

    A transform fires after every ``delay``-th stream sample and belongs
    to the sub-chunk containing that sample (AsgramStream semantics).
    All windows of the step are extracted with ONE traced roll of the
    extended signal (phase u0 = delay - cnt), then the static reshape
    trick; per-row averages use a one-hot fire->row matmul, with
    out-of-step fires falling off the one-hot range.

    ``cnt_offset`` (traced, optional) shifts the counter for time-sharded
    execution: shard r at K_local sub-chunks starts r*K_local*subchunk
    samples into the step, so its local counter is analytic from the
    carried one — no halo needed (parallel/scanner_sharded.py).  The
    returned new_cnt is local to THIS call's k sub-chunks; a sharded
    caller advances the carried counter by the full step outside.
    """
    wl = w // 2
    delay = w // 4
    ks = k * subchunk
    if cnt_offset is not None:
        cnt = (cnt + cnt_offset) % delay
    xe = jnp.concatenate([hist, band])          # [wl + ks]
    n_max = ks // delay + 1
    u0 = delay - cnt                            # first fire at xe[u0+wl-1]
    xr = jnp.roll(xe, -u0)
    frames = xr[: (n_max + 1) * delay].reshape(n_max + 1, delay)
    windows = jnp.concatenate([frames[:n_max], frames[1:]], axis=-1)
    p = _periodograms(windows, w)               # [n_max, w]
    # fire i consumes band sample u0 + i*delay (1-based); its row is the
    # sub-chunk containing it; fires past the step (u > ks) one-hot to
    # nothing.  delay <= subchunk (validate_width) => every row >= 1 fire.
    u = u0 + delay * jnp.arange(n_max, dtype=jnp.int32)
    row = (u - 1) // subchunk                   # [n_max]; >= k for non-fires
    a = jax.nn.one_hot(row, k, dtype=jnp.float32)   # [n_max, k]
    hi = jax.lax.Precision.HIGHEST
    rows_sum = jnp.matmul(a.T, p, precision=hi)
    counts = jnp.maximum(jnp.sum(a, axis=0), 1.0)
    p_avg = rows_sum / counts[:, None]
    rows = 10.0 * jnp.log10(jnp.maximum(p_avg, 1e-30)).astype(jnp.float32)
    rows = jnp.fft.fftshift(rows, axes=-1)
    new_hist = xe[xe.shape[-1] - wl:]
    new_cnt = (cnt + ks) % delay
    return new_hist, new_cnt.astype(jnp.int32), rows
