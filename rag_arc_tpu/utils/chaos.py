"""Deterministic fault injection.

SURVEY.md §5: the reference has retries and graceful degradation but no
way to *test* them. ``flaky`` wraps any object so chosen methods raise on
a deterministic schedule — tests assert that isolation/retry/degradation
paths actually engage, without monkeypatching internals.

    llm = flaky(FakeLLM(), methods=["parse_chat"], failures=[0, 2])
    # calls 0 and 2 raise InjectedFault; others pass through
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence


class InjectedFault(RuntimeError):
    """Raised by fault-injected methods."""


class _FlakyProxy:
    def __init__(
        self,
        target: Any,
        methods: Sequence[str],
        failures: Optional[Iterable[int]] = None,
        every: Optional[int] = None,
    ):
        self._target = target
        self._methods = set(methods)
        self._failures = set(failures or [])
        self._every = every
        self._counts: Dict[str, int] = {}

    def __getattr__(self, name: str) -> Any:
        attr = getattr(self._target, name)
        if name not in self._methods or not callable(attr):
            return attr

        def wrapper(*args: Any, **kwargs: Any):
            n = self._counts.get(name, 0)
            self._counts[name] = n + 1
            if n in self._failures or (self._every and (n + 1) % self._every == 0):
                raise InjectedFault(f"injected fault in {name} (call #{n})")
            return attr(*args, **kwargs)

        return wrapper

    def fault_counts(self) -> Dict[str, int]:
        return dict(self._counts)


def flaky(
    target: Any,
    methods: Sequence[str],
    failures: Optional[Iterable[int]] = None,
    every: Optional[int] = None,
) -> _FlakyProxy:
    """Wrap ``target`` so ``methods`` raise InjectedFault at the 0-based
    call indices in ``failures`` (and/or every ``every``-th call)."""
    return _FlakyProxy(target, methods, failures=failures, every=every)
