"""Profiling/observability — the rebuild of the reference's wall-clock-only
instrumentation (SURVEY.md §5.1: pred_time meters, --timetest prints).

Provides: jax.profiler trace capture around an interpolation call (Perfetto
trace viewable in TensorBoard / ui.perfetto.dev), a frames/sec/chip meter,
and per-level timing via repeated partial forwards (the XLA-world analog of
--timetest: levels compile separately so each can be timed in isolation).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fldrx_trace"):
    """Capture a jax.profiler trace around the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _force(x) -> float:
    """Device-side reduce + scalar fetch: the only reliable completion fence
    under async dispatch (block_until_ready can return early on relayed
    backends — see .claude/skills/verify/SKILL.md)."""
    return float(jnp.sum(x))


def fps_meter(fn: Callable, *args, iters: int = 8, warmup: int = 1):
    """Frames/sec for `fn(*args)` returning one frame batch."""
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = time.perf_counter() - t0
    return iters / dt


def time_levels(interp, frames: np.ndarray, t) -> dict:
    """--timetest equivalent: time the forward truncated at each pyramid
    depth; differences isolate per-level cost."""
    from ..eval.pipeline import Interpolator

    cfg = interp.cfg
    results = {}
    prev = None
    for s in range(1, cfg.S_tst + 1):
        sub = Interpolator(interp.params, cfg.replace(S_tst=s))
        f = lambda fr, tt: sub(fr, tt)
        fps = fps_meter(f, jnp.asarray(frames), jnp.asarray(t), iters=3)
        total = 1.0 / fps
        results[f"S_tst={s} total_s"] = total
        if prev is not None:
            results[f"level_{s}_delta_s"] = total - prev
        prev = total
    return results
