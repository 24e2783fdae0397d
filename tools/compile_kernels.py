"""Compile-only probe: do ALL Pallas kernels lower on the real TPU?

Interpret-mode tests prove math, not Mosaic lowering (CLAUDE.md) — this
compiles (never runs) every kernel entry point at a small geometry and
prints one PASS/FAIL line each.  No device->host transfers, safe on any
tunnel.  Covers: front-end variants (also probed by compile_front_end),
PFB+demod (plain and RSSI-fused), audio bank (plain and DC-fused).
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from sdr_pmr446_tpu import config as C                        # noqa: E402
from tools.compile_front_end import probe, main as fe_main    # noqa: E402


def main():
    ok = fe_main() == 0                   # the five front-end variants

    from sdr_pmr446_tpu.kernels.pfb_demod import PallasPfbDemod
    pfb = PallasPfbDemod(tile_f=1024)
    t = 2 * C.SUBCHUNK_AUDIO * 16
    br = jnp.zeros((t,), jnp.float32)
    hist = jnp.zeros((400,), jnp.complex64)
    prev = jnp.zeros((16,), jnp.complex64)
    par = jnp.zeros((), jnp.int32)
    ok &= probe("pfb_demod", pfb.call_planes, (br, br, hist, par, prev))
    ok &= probe("pfb_demod_rssi", pfb.call_planes_rssi,
                (br, br, hist, par, prev))

    from sdr_pmr446_tpu.kernels.audio_bank import PallasAudioBank
    bank = PallasAudioBank(tile_r=256)
    f = 2 * C.SUBCHUNK_AUDIO
    hist_a = jnp.zeros((16, bank.hist), jnp.float32)
    demod = jnp.zeros((16, f), jnp.float32)
    dcv = jnp.zeros((16,), jnp.float32)
    g = jnp.float32(4.0)
    ok &= probe("audio_bank", bank.apply, (hist_a, demod, g))
    ok &= probe("audio_bank_dc", bank.apply_dc,
                (hist_a, dcv, dcv, demod, g))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
