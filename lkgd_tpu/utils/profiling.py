"""Lightweight observability (SURVEY.md §5: the reference has only tqdm + CUDA memory
stats, `finetune/utils/memory_utils.py:13-27`; this is the TPU-native equivalent)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GB (CUDA memory-stats analog)."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 1e9,
                "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 1e9,
                "limit_gb": stats.get("bytes_limit", 0) / 1e9,
            }
    return out


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context: writes a TensorBoard/Perfetto trace when given a dir,
    otherwise just wall-times the block."""
    t0 = time.time()
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
    dt = time.time() - t0
    print(f"[trace] {dt*1e3:.1f} ms" + (f" -> {log_dir}" if log_dir else ""))


class StepTimer:
    """Rolling steps/sec + block-until-ready wall times for train loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def tick(self, result=None) -> Optional[float]:
        if result is not None:
            jax.block_until_ready(result)
        now = time.time()
        if self._last is not None:
            self.times.append(now - self._last)
            self.times = self.times[-self.window:]
        self._last = now
        return self.steps_per_sec()

    def steps_per_sec(self) -> Optional[float]:
        if not self.times:
            return None
        return len(self.times) / sum(self.times)
