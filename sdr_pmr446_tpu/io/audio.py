"""Optional live audio sink (RtAudio-role, host side).

The reference plays audio via RtAudio (src/sdr_pmr446.c:520-603).  On a TPU
host there is usually no audio server; when one exists this sink pipes mono
float32/s16 PCM into ``aplay`` (ALSA) or ``pacat`` (PulseAudio), whichever
is available — the same role the reference's README fills with ``play``.
Falls back cleanly (``available()`` False) so file sinks remain the default.
"""

from __future__ import annotations

import shutil
import subprocess
from typing import List, Optional

import numpy as np

# The "compiled-in" audio API set — the analog of RtAudio's compiled API
# enum that the reference validates -b against (src/sdr_pmr446.c:234-257):
#   alsa  -> aplay      pulse -> pacat      wav -> file sink (always)
#   dummy -> discard (RtAudio's DUMMY api)
COMPILED_APIS = ("unspecified", "alsa", "pulse", "wav", "dummy")
_API_EXES = {"alsa": "aplay", "pulse": "pacat"}


def list_apis() -> List[str]:
    """APIs usable on THIS host (the device-enumeration analog of
    src/sdr_pmr446.c:552-577's RtAudio device listing)."""
    avail = ["wav", "dummy"]
    for api, exe in _API_EXES.items():
        if shutil.which(exe):
            avail.append(api)
    return avail


def _backend(api: str = "unspecified") -> Optional[list]:
    use_alsa = shutil.which("aplay") and api in ("unspecified", "alsa")
    use_pulse = shutil.which("pacat") and api in ("unspecified", "pulse")
    if use_alsa:
        return ["aplay", "-q", "-f", "FLOAT_LE", "-c", "1", "-r"]
    if use_pulse:
        return ["pacat", "--format=float32le", "--channels=1", "--rate"]
    return None


def available(api: str = "unspecified") -> bool:
    return _backend(api) is not None


class AudioSink:
    """Streams float32 mono PCM to the system audio player."""

    def __init__(self, sample_rate: int, api: str = "unspecified"):
        cmd = _backend(api)
        if cmd is None:
            raise RuntimeError(
                f"no live audio backend for API '{api}' (available: "
                f"{', '.join(list_apis())})")
        if cmd[0] == "aplay":
            argv = cmd + [str(sample_rate)]
        else:
            argv = cmd[:-1] + [f"{cmd[-1]}={sample_rate}"]
        self.proc = subprocess.Popen(argv, stdin=subprocess.PIPE)

    def write(self, samples: np.ndarray) -> None:
        self.proc.stdin.write(
            np.ascontiguousarray(samples, np.float32).tobytes())
        self.proc.stdin.flush()

    def close(self) -> None:
        if self.proc.stdin:
            self.proc.stdin.close()
        self.proc.wait(timeout=5)
