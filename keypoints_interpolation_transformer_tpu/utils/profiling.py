"""Tracing and step-time profiling.

The reference has no profiler (SURVEY.md §5.1).  Here: ``trace`` wraps
jax.profiler for TensorBoard-consumable device traces, and ``StepTimer``
measures steady-state step time / throughput with correct async-dispatch
accounting (block_until_ready on the watermark output only).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/kit_tpu_trace"):
    """Device trace context: view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timing.

    Usage:
        timer = StepTimer(warmup=2)
        for batch in ...:
            out = step(...)
            timer.step(out, frames=...)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._seen = 0
        self._frames = 0
        self._t0: Optional[float] = None
        self._last_out = None

    @staticmethod
    def _sync(out):
        """Force REAL execution: on remote-tunnel backends
        block_until_ready() can return at enqueue time, so read back a
        dependent scalar instead."""
        import jax.numpy as jnp

        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(
                      x.dtype, jnp.floating)]
        if leaves:
            float(jnp.sum(leaves[0]))
        else:
            jax.block_until_ready(out)

    def step(self, out, frames: int = 0):
        self._seen += 1
        self._last_out = out
        if self._seen == self.warmup:
            self._sync(out)
            self._t0 = time.perf_counter()
            self._frames = 0
        elif self._seen > self.warmup:
            self._frames += frames

    def summary(self) -> dict:
        if self._t0 is None or self._seen <= self.warmup:
            return {"steps": 0}
        self._sync(self._last_out)
        dt = time.perf_counter() - self._t0
        steps = self._seen - self.warmup
        return {"steps": steps, "wall_sec": dt,
                "sec_per_step": dt / steps,
                "frames_per_sec": self._frames / dt if self._frames else 0.0}
