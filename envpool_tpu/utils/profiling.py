"""Profiling helpers (aux-subsystem parity, SURVEY.md §5).

The reference's observability is wall-clock accumulators around queue ops
(``core/async_envpool.h:57,79-81``) and an FPS script
(``benchmark/test_envpool.py:99-107``).  The TPU equivalents: device traces
via ``jax.profiler`` and an FPS counter with a true completion barrier
(plain ``block_until_ready`` is optimistic through remote relays — see
bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax

__all__ = ["trace", "fps_counter"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/envpool_tpu_trace") -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fps_counter(
    step_fn: Callable[[], jax.Array],
    steps_per_call: int,
    num_envs: int,
    calls: int = 3,
    frame_skip: int = 1,
) -> dict[str, float]:
    """Measure env-steps/s and FPS with a device_get completion barrier.

    ``step_fn`` runs one (rolled-out) pool step program and returns an
    array to fetch; FPS counts env frames = steps x frame_skip, matching
    the reference's accounting (``benchmark/README.md:24-25``).
    """
    jax.device_get(step_fn())  # warmup / compile
    t0 = time.perf_counter()
    out = None
    for _ in range(calls):
        out = step_fn()
    jax.device_get(out)
    dt = time.perf_counter() - t0
    steps = num_envs * steps_per_call * calls
    return {
        "env_steps_per_s": steps / dt,
        "fps": steps * frame_skip / dt,
        "seconds": dt,
    }
