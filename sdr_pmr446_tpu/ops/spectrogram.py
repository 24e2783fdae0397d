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
    ~0 dB), matching the scale the repo's renderer was tuned to;
  - the hop (w/4) must divide SUBCHUNK_RESAMP so each sub-chunk yields a
    static number of transforms (the reference's ring buffer absorbs any
    w; block-static shapes cannot).
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
    if subchunk % (w // 4) != 0:
        raise ValueError(
            f"waterfall width {w}: hop {w // 4} must divide the sub-chunk "
            f"band length {subchunk} (e.g. widths 64, 80, 100, 112, 140, "
            f"196, 200, 224, 280, 400 work)")


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
    win = jnp.asarray(_window(w))
    # windowed hop periodograms as MXU DFT matmuls on re/im planes
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
    p = (sr ** 2 + si ** 2).reshape(k, n_seg, w)
    p_avg = jnp.mean(p, axis=1)
    rows = 10.0 * jnp.log10(jnp.maximum(p_avg, 1e-30)).astype(jnp.float32)
    rows = jnp.fft.fftshift(rows, axes=-1)
    new_hist = xe[xe.shape[-1] - wl:]
    return new_hist, rows
