"""Trustworthy device timing.

On this machine the TPU is reached through a remote-execution tunnel where
``jax.block_until_ready`` can return before device execution has actually
finished (buffers are futures on the client side), so naive per-call timing
under-reports by orders of magnitude. :func:`bench_chained` defeats that by
(a) chaining ``iters`` executions through a data dependency (each call
consumes the previous call's output) so the device must serialize them, and
(b) fetching a scalar reduction of the final output to the host, which
cannot complete until the whole chain has. Per-iteration time is the total
divided by ``iters``, with the one-off dispatch/fetch overhead measured by
a zero-work calibration chain and subtracted.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bench_chained", "bench_fori", "bench_slope"]


def bench_slope(step: Callable[[Any], Any], init: Any, *, u_lo: int = 2,
                u_hi: int = 8, iters: int = 10, reps: int = 3) -> float:
    """Per-op time via the unroll-slope method — immune to fixed overhead.

    This runtime charges a large fixed cost per loop iteration (~0.7 ms
    measured) that swamps sub-millisecond kernels. Chaining ``u`` copies of
    ``step`` inside each loop body gives total time ``iters * (fixed +
    u * t_op)``; the difference between two unroll factors cancels the
    fixed term: ``t_op = (T(u_hi) - T(u_lo)) / (iters * (u_hi - u_lo))``.
    """
    import jax.lax as lax

    def chain(u):
        def body(_, y):
            for _ in range(u):
                y = step(y)
            return y

        @jax.jit
        def run(y0):
            return lax.fori_loop(0, iters, body, y0)
        return run

    run_lo, run_hi = chain(u_lo), chain(u_hi)
    _force(run_lo(init))
    _force(run_hi(init))

    # The tunnel injects large positive latency spikes (queueing), so a
    # per-pair slope can even go negative. Median the lo and hi times
    # separately across reps, then difference the medians — robust to
    # spikes landing on either side of a pair.
    t_los, t_his = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(run_lo(init))
        t_los.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _force(run_hi(init))
        t_his.append(time.perf_counter() - t0)
    slope = (float(np.median(t_his)) - float(np.median(t_los))) \
        / (iters * (u_hi - u_lo))
    return max(slope, 1e-9)


def bench_fori(step: Callable[[Any], Any], init: Any, *, iters: int = 20,
               reps: int = 3) -> float:
    """Per-iteration time with the whole chain inside ONE jitted program.

    ``lax.fori_loop`` chains ``iters`` applications of ``step`` on device,
    so per-dispatch overhead (significant through a remote-execution
    tunnel) is paid once per measurement instead of once per iteration.
    ``step`` must be shape/dtype-preserving. The loop prevents any
    cross-iteration fusion less aggressively than real workloads would,
    but XLA cannot elide iterations because of the loop-carried dependency.

    .. warning:: Do NOT use this for Pallas kernels on this rig: a loop
       iteration whose body contains a ``pallas_call`` charges a ~7 ms
       fixed cost (measured; an *empty* 256-step kernel times identically
       to a real one — probes/probe_tiled_dense_r2c.py), which swamps
       sub-ms kernels. The actual per-call overhead is ~13 us; use
       :func:`bench_slope`, whose unroll difference cancels the
       per-iteration term.
    """
    import jax.lax as lax

    @jax.jit
    def chain(y0):
        return lax.fori_loop(0, iters, lambda _, y: step(y), y0)

    y = chain(init)       # compile + warm
    _force(y)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = chain(init)
        _force(y)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / iters


def _force(y) -> float:
    """Fetch a scalar that depends on every element of y (pytree ok)."""
    leaves = jax.tree_util.tree_leaves(y)
    tot = 0.0
    for leaf in leaves:
        tot += float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))
    return tot


def bench_chained(step: Callable[[Any], Any], init: Any, *, iters: int = 10,
                  warmup: int = 2, reps: int = 3) -> float:
    """Median per-iteration wall time of ``y = step(y)`` chains.

    ``step`` must map its output type to its input type (shape/dtype
    preserved) so calls chain through a true data dependency.
    """
    y = init
    for _ in range(warmup):
        y = step(y)
    _force(y)

    times = []
    for _ in range(reps):
        y = init
        t0 = time.perf_counter()
        for _ in range(iters):
            y = step(y)
        _force(y)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))
