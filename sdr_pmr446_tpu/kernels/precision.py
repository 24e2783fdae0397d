"""MXU contract-precision policy for the Pallas kernels.

Probed on the real backend (tools/probe_precision.py, 2026-08-20, one
compute->fetch per subprocess): at DEFAULT precision this TPU contracts
f32 dots in **bf16** — one MXU pass with inputs rounded to an 8-bit
mantissa — in BOTH plain XLA dots and Mosaic kernels; only
``jax.lax.Precision.HIGHEST`` contracts in true f32 (Mosaic emits
``#tpu.contract_precision<fp32>`` for HIGHEST and nothing else).

Consequences for this chain (why the default here is HIGHEST):

  - the one-pole recurrences (DC blockers) run as selector/carry matmuls
    whose VALUE operand would be rounded to bf16 per step — audio-band
    error ~2^-9 relative, visible against every oracle gate;
  - the long value dots (416-tap PFB, 512-tap resampler window, 640-tap
    composed audio FIRs, CTCSS tone phasor sums) would carry ~1e-2 .. 1e-3
    worst-case relative error, collapsing the chain's >100 dB oracle SNR
    to ~50-60 dB and putting borderline squelch/CTCSS decisions at risk;
  - the XLA ops (ops/fir, ops/resample, ops/pfb, ops/spectrogram,
    scanner/fsm) already pin HIGHEST for exactly this reason — the
    kernels were the gap (interpret-mode CPU tests compute true f32 and
    cannot see it; the probe on hardware can).

``set_fast(True)`` switches every kernel dot back to DEFAULT (single-pass
bf16) for A/B measurement (tools/ab_bench.py --mode precision); it is a
trace-time knob — chains built afterwards pick it up.
"""

from __future__ import annotations

import jax

_FAST = False


def set_fast(fast: bool) -> None:
    """Trace-time switch: True -> DEFAULT (bf16 single pass) for A/B."""
    global _FAST
    _FAST = bool(fast)


def get():
    """Precision for every value-bearing kernel dot (None == backend
    default, i.e. bf16 contraction on this TPU)."""
    return None if _FAST else jax.lax.Precision.HIGHEST
