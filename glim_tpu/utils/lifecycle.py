"""Registry of live thread-owning framework objects.

Every object that owns a worker thread (async pipeline wrappers, the
loop-detection worker) registers itself here at construction. ``stop_all``
shuts down whatever is still alive — used by the test suite between tests
(so hundreds of tests in one process cannot accumulate pollling worker
threads) and available to embedders for hard shutdowns. Registration is a
WeakSet: normal operation never keeps an object alive through this module.
"""

from __future__ import annotations

import weakref

_LIVE: "weakref.WeakSet" = weakref.WeakSet()


def register(obj) -> None:
    """Track a thread-owning object. ``obj`` must expose ``stop()`` or
    ``join()`` (checked in that order by stop_all)."""
    _LIVE.add(obj)


def stop_all(timeout: float = 5.0) -> int:
    """Stop every live registered object; returns how many were stopped."""
    n = 0
    for obj in list(_LIVE):
        stop = getattr(obj, "stop", None) or getattr(obj, "join", None)
        try:
            try:
                stop(timeout=timeout)
            except TypeError:
                stop()
            n += 1
        except Exception:
            pass
        _LIVE.discard(obj)
    return n
