"""Tracing / profiling utilities (SURVEY §5: the reference has none — only
tqdm progress bars).

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of device execution.
- ``annotate(name)``: names a region in the trace (TraceAnnotation).
- ``StepTimer``: wall-clock per-step timing with warmup skip and summary
  stats; forces completion through a scalar probe so timings are real even
  on async dispatch paths.
- ``accum_log`` re-export: the trainers' metrics-dict accumulator (the
  reference's one observability hook, train_vqgan_vae.py:41-45).
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

import jax

from ..train.data import accum_log  # noqa: F401  (re-export)


@contextlib.contextmanager
def trace(logdir, *, create_perfetto_link=False):
    jax.profiler.start_trace(str(logdir), create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    return jax.profiler.TraceAnnotation(name)


def force_completion(x):
    """Block until ``x`` is actually computed. On transports where
    ``block_until_ready`` is asynchronous (e.g. tunneled TPUs), reading a
    scalar back is the only reliable barrier."""
    leaf = jax.tree.leaves(x)[0]
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(leaf)[:1]))


class StepTimer:
    """Accumulates per-step wall times; skips ``warmup`` steps (compile)."""

    def __init__(self, warmup=1):
        self.warmup = warmup
        self.times = []
        self._seen = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self):
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self):
        return float(np.median(self.times)) if self.times else float("nan")

    def summary(self):
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.median(arr)),
            "min_s": float(arr.min()),
            "max_s": float(arr.max()),
        }
