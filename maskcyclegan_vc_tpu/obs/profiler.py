"""Profiling hooks (SURVEY §5.1 build requirement).

The reference's only timing is wall-clock prints; here:
  * ``trace(dir)`` — context manager capturing a ``jax.profiler`` trace
    (TensorBoard/Perfetto readable) around any code region;
  * ``timed_steps`` — robust step timer using value-fetch barriers
    (``block_until_ready`` is a no-op on some tunneled platforms).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace; no-op if the backend can't profile."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # tunneled/experimental backends
        print(f"[profiler] trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def timed_steps(step_fn: Callable, state, batches: Iterable, *,
                sync_leaf: Callable = None) -> Tuple[object, float]:
    """Run chained steps; return (final_state, seconds_per_step).

    Forces completion with a scalar fetch of the final metrics (the state
    chain transitively forces every step).
    """
    batches = list(batches)
    t0 = time.perf_counter()
    metrics = None
    for b in batches:
        state, metrics = step_fn(state, b)
    leaf = sync_leaf(metrics) if sync_leaf else jax.tree.leaves(metrics)[0]
    float(leaf)
    return state, (time.perf_counter() - t0) / max(1, len(batches))
