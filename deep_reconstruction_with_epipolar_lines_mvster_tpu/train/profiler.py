"""Profiling / tracing utilities (SURVEY.md §5.1).

The reference has only wall-clock prints + CUDA peak-memory
(``test_mvs4.py:338,345-348``) and an *unimplemented* ``--mode profile``
(train_mvs4.py:19,605-606). Here:

- ``profile_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace (xplane) for a window of steps;
- ``device_memory_stats``: per-device live-bytes snapshot (the TPU analog of
  ``torch.cuda.max_memory_allocated``);
- ``profile_step_fn``: times a jitted step over N iterations with
  compile/first-step split, returning a stats dict.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict


@contextlib.contextmanager
def profile_trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    import jax

    out: Dict[str, Dict[str, float]] = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": float(stats.get("bytes_in_use", 0)),
                "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
                "bytes_limit": float(stats.get("bytes_limit", 0)),
            }
    return out


def profile_step_fn(
    step_fn: Callable[[], Any], *, iters: int = 10, warmup: int = 2
) -> Dict[str, float]:
    """Time ``step_fn`` (must block on its own result or return arrays)."""
    import jax

    t0 = time.perf_counter()
    out = step_fn()
    jax.block_until_ready(out)
    first = time.perf_counter() - t0

    for _ in range(max(0, warmup - 1)):
        jax.block_until_ready(step_fn())

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn()
    jax.block_until_ready(out)
    per_iter = (time.perf_counter() - t0) / iters
    return {
        "first_call_s": first,
        "steady_state_s": per_iter,
        "steps_per_s": 1.0 / per_iter if per_iter > 0 else float("inf"),
    }
