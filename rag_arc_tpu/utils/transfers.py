"""Batched device→host readbacks for streamed dispatch.

Through this box's axon tunnel every ``jax.device_get`` is a host↔device
round trip (~28-35 ms) regardless of whether the result is already
computed — so a stream of N dispatched batches fetched one-by-one pays
N round trips even though the device finished long ago (measured: the
dense path's fetch loop cost ~60 ms/batch at 100k docs where the device
program is ~2 ms). A :class:`TransferPool` collects every pending device
tree registered during a stream's dispatch phase and pulls them ALL in
one ``jax.device_get`` (one round trip) at the first ``result`` demand.

Usage (the streamed pipeline entry does this):

    with transfer_pool():
        fetches = [retriever.dispatch_batch(b, k=k) for b in batches]
        results = [f() for f in fetches]   # 1 flush, not len(batches)

Dispatchers opt in by checking :func:`current_pool` at dispatch time;
with no active pool they ``device_get`` directly, so single-shot calls
are unchanged. Lazily-launched device work (the BM25 device-query
coalescer) registers at launch time instead — callers expose a
``prime()`` hook so a streaming driver can force every lazy launch
BEFORE the first ``result`` demand and keep the flush count at one.
"""

from __future__ import annotations

import contextlib
import contextvars
import threading
from typing import Any, Dict, Optional

import jax

_current: contextvars.ContextVar[Optional["TransferPool"]] = (
    contextvars.ContextVar("rag_arc_transfer_pool", default=None)
)


class TransferPool:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._pending: Dict[int, Any] = {}
        self._done: Dict[int, Any] = {}
        self._flushing = False
        self._ctr = 0

    def register(self, tree: Any) -> int:
        """Record a device tree for the next flush; returns a handle."""
        with self._lock:
            handle = self._ctr
            self._ctr += 1
            self._pending[handle] = tree
            return handle

    def result(self, handle: int) -> Any:
        """Host copy of a registered tree. The first demand flushes every
        pending tree in ONE ``jax.device_get``; results cache until their
        (single) owner claims them. A demand racing another thread's
        in-flight flush waits for it instead of double-fetching."""
        with self._cond:
            while True:
                if handle in self._done:
                    return self._done.pop(handle)
                if handle in self._pending:
                    keys = list(self._pending)
                    trees = [self._pending.pop(kk) for kk in keys]
                    self._flushing = True
                    break
                if self._flushing:
                    # our tree rides a flush another thread started
                    self._cond.wait()
                    continue
                raise KeyError(f"unknown transfer handle {handle}")
        try:
            fetched = jax.device_get(trees)
        except BaseException:
            with self._cond:  # re-park so owners see a clean error, not a hang
                for kk, tt in zip(keys, trees):
                    self._pending[kk] = tt
                self._flushing = False
                self._cond.notify_all()
            raise
        with self._cond:
            for kk, vv in zip(keys, fetched):
                self._done[kk] = vv
            self._flushing = False
            self._cond.notify_all()
            return self._done.pop(handle)


def current_pool() -> Optional[TransferPool]:
    return _current.get()


@contextlib.contextmanager
def transfer_pool():
    """Activate a :class:`TransferPool` for dispatches made inside the
    block. Fetch closures capture the pool, so they keep working after
    the block exits."""
    pool = TransferPool()
    token = _current.set(pool)
    try:
        yield pool
    finally:
        _current.reset(token)
