"""Tracing / profiling / debug hooks (SURVEY §5: the reference has only
wall-clock prints; these are the framework-level replacements)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (view with TensorBoard / xprof):

        with profiling.trace("/tmp/trace"):
            train_step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Raise on NaN production inside jitted code (debug mode; recompiles)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Throughput counter (samples/sec, steps/sec) — the BASELINE metrics.

    NOTE: call ``sync()`` (device-side reduction + scalar pull) before
    reading on tunneled backends; block_until_ready may not block there.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.samples = 0

    def update(self, batch_size: int, n_steps: int = 1):
        self.steps += n_steps
        self.samples += batch_size * n_steps

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def samples_per_sec(self) -> float:
        return self.samples / max(self.elapsed, 1e-9)

    @staticmethod
    def sync(array) -> float:
        """Force completion of everything producing ``array``."""
        import jax.numpy as jnp
        return float(jax.jit(jnp.sum)(array))
