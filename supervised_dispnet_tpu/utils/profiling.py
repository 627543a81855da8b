"""Profiling / tracing utilities.

The reference's only observability was wall-clock AverageMeters
(reference: ``logger.py`` batch_time/data_time in ``train.py::train``);
here we add the TPU-native equivalents: jax.profiler traces (viewable in
TensorBoard / Perfetto) and a steady-state throughput timer that is safe
against async dispatch and the remote-relay execution cache (see
BASELINE.md timing-protocol note).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def enable_compile_cache(path: str = "/tmp/jax_comp_cache",
                         min_compile_secs: int = 10) -> None:
    """Persistent XLA compile cache — first compiles through the remote
    tunnel take minutes; cached reruns are instant. Safe to call anytime
    before heavy compiles; ignored if unsupported."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a jax.profiler trace around a code block."""
    logdir = str(logdir)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def steady_state_images_per_sec(
    step_fn,
    example_args: tuple,
    batch_size: int,
    iters: int = 20,
    warmup: int = 3,
) -> float:
    """Measure throughput of a jitted scalar-returning step via a serial
    dependency chain: ``step_fn(*args, carry) -> scalar`` where carry is the
    previous scalar (defeats dispatch dedup; forces real execution)."""
    carry = jnp.float32(0.0)
    for _ in range(warmup):
        carry = step_fn(*example_args, carry)
    float(carry)
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(*example_args, carry)
    float(carry)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


class StepTimer:
    """batch_time / data_time meters around a training loop (same scalar
    names as the reference console logs)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._last = time.time()
        self.data_time = 0.0
        self.batch_time = 0.0
        self.count = 0

    def mark_data(self):
        now = time.time()
        self.data_time += now - self._last
        self._mark_data_t = now

    def mark_step(self):
        now = time.time()
        self.batch_time += now - self._last
        self._last = now
        self.count += 1

    def averages(self) -> dict[str, float]:
        n = max(self.count, 1)
        return {"batch_time": self.batch_time / n, "data_time": self.data_time / n}
