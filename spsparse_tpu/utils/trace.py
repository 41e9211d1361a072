"""Tracing/profiling hooks.

The reference has no tracing at all (SURVEY §5 — only ``#if 0`` printf
vestiges in hot loops, ``multiply_sparse.hpp:199-205``). Here every public
op wraps its XLA graph in a ``jax.named_scope`` so the JAX/XLA profiler
attributes device time to framework ops, and an optional lightweight
host-side event log records op launches with their static capacities for
quick audits without a full profile.
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time
from typing import Any, Callable

import jax

logger = logging.getLogger("spsparse_tpu.trace")

__all__ = ["traced", "trace_scope", "enable_event_log", "get_event_log"]

_EVENTS: list | None = None


def enable_event_log(on: bool = True) -> None:
    """Start/stop recording host-side op-launch events."""
    global _EVENTS
    _EVENTS = [] if on else None


def get_event_log() -> list:
    return list(_EVENTS or [])


@contextlib.contextmanager
def trace_scope(name: str, **meta):
    """``jax.named_scope`` + optional host event record."""
    t0 = time.perf_counter() if _EVENTS is not None else 0.0
    with jax.named_scope(name):
        yield
    if _EVENTS is not None:
        _EVENTS.append({"op": name, "host_s": time.perf_counter() - t0,
                        **meta})


def traced(name: str) -> Callable:
    """Decorator: wrap an op's trace in a named scope for the profiler."""
    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any):
            with trace_scope(name):
                return fn(*args, **kwargs)
        return wrapper
    return deco
