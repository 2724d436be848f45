"""Profiling helpers: jax.profiler traces around named regions.

The TPU-side story for the reference's ``solver_counter`` timing prints
(SURVEY.md §5): hot ops already carry ``jax.named_scope`` annotations
(kron matvec, basis build, Φ); wrap any region with :func:`trace` to dump a
TensorBoard-viewable trace, or use :func:`timed` for quick wall-clock spans
with proper device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "timed"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed region into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, results: dict | None = None):
    """Wall-clock a region (synchronizing via ``block_until_ready`` is the
    caller's job for async backends — see bench.py for the axon caveat)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    else:
        print(f"[timed] {label}: {dt:.4f}s")
