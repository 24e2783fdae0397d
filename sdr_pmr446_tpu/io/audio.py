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
from typing import Optional

import numpy as np


def _backend() -> Optional[list]:
    if shutil.which("aplay"):
        return ["aplay", "-q", "-f", "FLOAT_LE", "-c", "1", "-r"]
    if shutil.which("pacat"):
        return ["pacat", "--format=float32le", "--channels=1", "--rate"]
    return None


def available() -> bool:
    return _backend() is not None


class AudioSink:
    """Streams float32 mono PCM to the system audio player."""

    def __init__(self, sample_rate: int):
        cmd = _backend()
        if cmd is None:
            raise RuntimeError("no audio backend (aplay/pacat) available")
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
