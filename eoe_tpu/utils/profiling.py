"""Profiling helpers (SURVEY.md §5.1: the reference has only a homegrown
wall-clock Timer + tqdm tracker; the TPU equivalent is jax.profiler traces
plus the img/s counters the trainer already emits)."""

import contextlib
import time

import jax


@contextlib.contextmanager
def profile(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(results: list):
    """block_until_ready-bracketed wall-clock of a step; appends seconds."""
    t0 = time.time()
    out = {}
    yield out
    if "sync" in out:
        jax.block_until_ready(out["sync"])
    results.append(time.time() - t0)
