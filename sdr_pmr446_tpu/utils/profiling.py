"""Profiling & throughput harness (the observability layer of SURVEY.md §5).

The reference has no tracing at all (closest: msresamp_crcf_print at init);
here profiling is first-class: jax.profiler trace capture around block steps
and a per-block samples/s meter whose output feeds bench.py and the scaling
studies.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Optional

import jax


@dataclasses.dataclass
class ThroughputMeter:
    """Accumulates per-block timings -> samples/s statistics."""

    samples_per_block: int
    blocks: int = 0
    total_time: float = 0.0
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        assert self._t0 is not None
        self.total_time += time.perf_counter() - self._t0
        self.blocks += 1
        self._t0 = None

    @property
    def samples_per_sec(self) -> float:
        if self.total_time == 0:
            return 0.0
        return self.samples_per_block * self.blocks / self.total_time

    @property
    def realtime_multiple(self) -> float:
        from sdr_pmr446_tpu import config as C
        return self.samples_per_sec / C.SDR_SAMPLERATE

    def report(self) -> dict:
        return {
            "blocks": self.blocks,
            "samples_per_sec": self.samples_per_sec,
            "realtime_multiple": self.realtime_multiple,
            "ms_per_block": (1e3 * self.total_time / max(self.blocks, 1)),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a code region (view in XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def log_jsonl(path: str, record: dict) -> None:
    """Append one structured metrics record (per-block event stream)."""
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
