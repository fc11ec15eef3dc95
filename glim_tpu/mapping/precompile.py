"""Background precompilation of padding-bucket program variants.

The live global-mapping thread compiles a fresh XLA program whenever any
padded dimension crosses a bucket (mapping/global_factors.py BUCKETS):
on chip the fused global_gn program costs ~20 s on first compile and a
bucket crossing ~0.5-1.5 s (BENCH_r04 `global_optimize_periodic_ms_16sm`
= 22.1 s) — a robot running live would freeze exactly that long. The
reference's iSAM2 increments never stall like this
(reference: src/glim/mapping/global_mapping.cpp:492-544), so neither may
we: this worker warms the process-wide jit cache AHEAD of the live
thread.

Jobs are (signature, thunk) pairs; a thunk builds zero-filled dummy
arguments with exactly the shapes/dtypes/weak-types the live call will
use and invokes the jitted function once. XLA compilation dominates the
job; executing the dummy program afterwards is cheap (on an all-zero
graph the convergence-gated GN scan exits after one real iteration) and
guarantees the executable is resident in the SAME dispatch cache the
live call hits — `.lower().compile()` alone populates a separate AOT
object.

Device-queue note: the dummy execution shares the accelerator with the
live pipeline, but one extra ~100 ms solve per bucket crossing is three
orders of magnitude cheaper than the synchronous compile it replaces.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("precompile")


class Precompiler:
    """Serial background compile worker with signature dedup.

    ``submit(sig, thunk)`` enqueues one compile job per unique signature;
    ``ready(sig)`` says whether the live thread can call that variant
    without stalling; ``wait_idle()`` blocks until the queue drains (used
    by tests and by stress tools to attribute compile time separately
    from steady-state time — VERDICT r4 item 10)."""

    def __init__(self, name: str = "precompile"):
        self._cv = threading.Condition()
        self._queue: deque = deque()
        self._queued: set = set()
        self._done: set = set()
        self._inflight: Optional[tuple] = None
        self._stop = False
        self.stats = {"jobs": 0, "compile_s": 0.0, "errors": 0}
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=name)
        self._thread.start()
        from glim_tpu.utils import lifecycle
        lifecycle.register(self)

    def submit(self, sig, thunk: Callable[[], None]) -> bool:
        """Enqueue a compile job unless this signature is already queued,
        in flight, or done. Returns True if enqueued."""
        with self._cv:
            if self._stop or sig in self._done or sig in self._queued \
                    or (self._inflight and self._inflight[0] == sig):
                return False
            self._queue.append((sig, thunk))
            self._queued.add(sig)
            self._cv.notify_all()
            return True

    def ready(self, sig) -> bool:
        with self._cv:
            return sig in self._done

    def pending(self) -> int:
        with self._cv:
            return len(self._queue) + (1 if self._inflight else 0)

    def pending_for(self, sig) -> bool:
        """Is this signature queued or currently compiling?"""
        with self._cv:
            return sig in self._queued \
                or (self._inflight is not None and self._inflight[0] == sig)

    def wait_idle(self, timeout: Optional[float] = None) -> bool:
        """Block until the queue is empty and nothing is in flight."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cv:
            while self._queue or self._inflight:
                remaining = None if deadline is None \
                    else max(deadline - time.monotonic(), 0.0)
                if remaining == 0.0:
                    return False
                self._cv.wait(remaining)
            return True

    def wait_for(self, sig, timeout: Optional[float] = None) -> bool:
        """Block until `sig` is compiled (it must have been submitted)."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cv:
            while sig not in self._done:
                if not (sig in self._queued
                        or (self._inflight and self._inflight[0] == sig)):
                    return sig in self._done
                remaining = None if deadline is None \
                    else max(deadline - time.monotonic(), 0.0)
                if remaining == 0.0:
                    return False
                self._cv.wait(remaining)
            return True

    def stop(self, timeout: float = 2.0) -> None:
        with self._cv:
            self._stop = True
            self._queue.clear()
            self._queued.clear()
            self._cv.notify_all()
        self._thread.join(timeout=timeout)

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop:
                    return
                sig, thunk = self._queue.popleft()
                self._queued.discard(sig)
                self._inflight = (sig, thunk)
            t0 = time.perf_counter()
            try:
                thunk()
                dt = time.perf_counter() - t0
                with self._cv:
                    self._done.add(sig)
                    self.stats["jobs"] += 1
                    self.stats["compile_s"] += dt
                logger.debug("precompiled %s in %.2fs", sig, dt)
            except Exception as exc:      # never kill the worker
                dt = time.perf_counter() - t0
                with self._cv:
                    self.stats["errors"] += 1
                logger.warning("precompile of %s failed: %s", sig, exc)
            finally:
                with self._cv:
                    self._inflight = None
                    self._cv.notify_all()
            # Duty-cycle throttle: the worker shares the device queue, the
            # dispatch path, and the GIL with the live pipeline — measured
            # on chip, an unthrottled warmup burst halves the async
            # pipeline's throughput for its duration. Yield ~25% of each
            # job's wall between jobs (bounded) so live dispatches slot in.
            if not self._stop and dt > 0.05:
                with self._cv:
                    more = bool(self._queue)
                if more:
                    time.sleep(min(dt * 0.25, 2.0))


_SHARED: Optional[Precompiler] = None
_SHARED_LOCK = threading.Lock()


def _atexit_stop() -> None:
    """Stop the shared worker BEFORE interpreter teardown: a daemon thread
    frozen inside an XLA compile while the runtime's C++ statics destruct
    aborts the process ('FATAL: exception not rethrown' at CLI exit). stop()
    drains the queue and joins the in-flight job (idle in practice at the
    end of a run, so this is instant)."""
    with _SHARED_LOCK:
        pc = _SHARED
    if pc is not None and not pc._stop:
        pc.stop(timeout=60.0)


def get_precompiler() -> Precompiler:
    """Process-wide shared worker — the jit cache it warms is process-wide
    too, so per-instance workers would only duplicate compiles. A stopped
    worker (test-suite lifecycle cleanup) is transparently replaced."""
    global _SHARED
    with _SHARED_LOCK:
        if _SHARED is None or _SHARED._stop:
            _SHARED = Precompiler()
            import atexit
            atexit.register(_atexit_stop)
        return _SHARED


def dummy_gn_args(dims: dict, M: int, matching_weight: float):
    """Zero-filled arguments for ``global_factors.global_gn`` whose avals
    (shape, dtype, weak-type) match what ``GlobalMapping._padded_args``
    produces for the same dims, so a dummy call lands in the exact jit
    cache entry the live call will hit. Mirrors _padded_args' constructors
    one-to-one — tests/test_precompile.py asserts cache-hit equivalence
    against the real assembly."""
    Sp, Fp, Bp, Jp, Ap, Tp = (dims[k] for k in
                              ("Sp", "Fp", "Bp", "Jp", "Ap", "Tp"))
    from glim_tpu.odometry.window_estimator import _zero_preints
    zero_pre = jax.tree_util.tree_map(lambda x: x[0], _zero_preints(2))
    if Jp:
        from glim_tpu.mapping.global_factors import pad_stack_tree
        m_pre = pad_stack_tree([], Jp, zero_pre)
        m_i = m_j = jnp.zeros(Jp, jnp.int32)
        m_AR = m_AL = jnp.zeros((Jp, 4, 4), jnp.float32)
        m_valid = jnp.zeros(Jp, bool)
        junc = jnp.zeros((Jp, 12), jnp.float32)
    else:
        m_pre = jax.tree_util.tree_map(lambda x: x[:0], _zero_preints(2))
        m_i = m_j = jnp.zeros(0, jnp.int32)
        m_AR = m_AL = jnp.zeros((0, 4, 4), jnp.float32)
        m_valid = jnp.zeros(0, bool)
        junc = jnp.zeros((0, 12), jnp.float32)
    eye4 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (Sp, 1, 1))
    return dict(
        poses0=eye4, junc0=junc,
        f_tgt=jnp.zeros(Fp, jnp.int32), f_src=jnp.zeros(Fp, jnp.int32),
        f_w=jnp.zeros(Fp, jnp.float32),
        f_mu=jnp.zeros((Fp, M, 3), jnp.float32),
        f_ct=jnp.zeros((Fp, M, 3, 3), jnp.float32),
        f_hit=jnp.zeros((Fp, M), bool),
        sm_pts=jnp.zeros((Sp, M, 3), jnp.float32),
        sm_covs=jnp.zeros((Sp, M, 3, 3), jnp.float32),
        b_i=jnp.zeros(Bp, jnp.int32), b_j=jnp.zeros(Bp, jnp.int32),
        b_Z=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (Bp, 1, 1)),
        b_info=jnp.tile(jnp.eye(6, dtype=jnp.float32)[None], (Bp, 1, 1)),
        b_valid=jnp.zeros(Bp, bool),
        m_i=m_i, m_j=m_j, m_AR=m_AR, m_AL=m_AL, m_pre=m_pre,
        m_valid=m_valid,
        prior_T=jnp.eye(4, dtype=jnp.float32),
        prior_sqrt=jnp.full(6, 1.0, jnp.float32),
        grav_idx=(jnp.zeros(Ap, jnp.int32) if Ap
                  else jnp.zeros(0, jnp.int32)),
        grav_valid=(jnp.zeros(Ap, bool) if Ap else jnp.zeros(0, bool)),
        grav_sqrt=jnp.asarray(np.float64(1.0), jnp.float32),
        damping=jnp.asarray(np.full(Sp, 1e-3, np.float32)),
        gravity=jnp.asarray(np.array([0.0, 0.0, -9.80665], np.float32)),
        matching_weight=jnp.float32(matching_weight),
        t_idx=(jnp.zeros(Tp, jnp.int32) if Tp else None),
        t_pos=(jnp.zeros((Tp, 3), jnp.float32) if Tp else None),
        t_sqrt=(jnp.zeros((Tp, 3), jnp.float32) if Tp else None),
        t_valid=(jnp.zeros(Tp, bool) if Tp else None),
    )
