"""Lightweight stage profiling.

Plays the role of gtsam_points' easy_profiler + the reference's elapsed-ms
logging (SURVEY.md §5 tracing/profiling): named scopes accumulate wall-time
statistics per stage; ``report()`` logs a summary table. For device-level
traces, ``device_trace`` wraps ``jax.profiler.trace`` when a trace directory
is configured (the TPU equivalent of nvprof-style inspection).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Dict

from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("prof")

_lock = threading.Lock()
_stats: Dict[str, list] = {}


@contextlib.contextmanager
def profile_scope(name: str):
    """Accumulate wall time under `name` (thread-safe)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats.setdefault(name, [0, 0.0, 0.0])  # n, total, max
            s[0] += 1
            s[1] += dt
            s[2] = max(s[2], dt)


def report(reset: bool = False) -> Dict[str, dict]:
    """Log + return per-scope stats {name: {n, total_s, mean_ms, max_ms}}."""
    with _lock:
        snap = {k: list(v) for k, v in _stats.items()}
        if reset:
            _stats.clear()
    out = {}
    for name, (n, total, mx) in sorted(snap.items(), key=lambda kv: -kv[1][1]):
        out[name] = dict(n=n, total_s=round(total, 3),
                         mean_ms=round(total / max(n, 1) * 1e3, 2),
                         max_ms=round(mx * 1e3, 2))
        logger.info("profile %-28s n=%-6d total=%7.2fs mean=%7.2fms max=%7.2fms",
                    name, n, total, total / max(n, 1) * 1e3, mx * 1e3)
    return out


@contextlib.contextmanager
def device_trace(name: str = "glim"):
    """jax.profiler trace scope, active when GLIM_TPU_TRACE_DIR is set."""
    trace_dir = os.environ.get("GLIM_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
