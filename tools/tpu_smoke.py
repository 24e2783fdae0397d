"""On-TPU end-to-end smoke: full driver scan on synthetic IQ, verify
events + audio SNR on host (through the f32 transport encoding)."""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import iq as iq_io, synth
from sdr_pmr446_tpu.runtime.driver import ScannerDriver

n = 30 * C.SUBCHUNK_IN
iq = synth.make_scanner_iq(n, channel=5, ctcss_code=12)
drv = ScannerDriver(subchunks_per_step=10)
t0 = time.time()
res = drv.run(iq_io.block_stream(iq, drv.block_len))
print("run took", round(time.time()-t0,1), "s")
print("events:", res.events[:4])
assert any(e.startswith("Tuned to channel 5") for e in res.events), res.events
assert any(e.startswith("Acquired CTCSS code: 12") for e in res.events), res.events
assert res.active_trace[-1] == 4
snr = synth.tone_snr_db(res.audio[3*1225:], 1000.0)
print(f"audio: {len(res.audio)} samples, tone SNR {snr:.1f} dB")
assert snr > 30
print("TPU E2E SMOKE OK")
