"""Vectorized sorted-merge joins — the xiter protocol, TPU style.

The reference's ``Join2Xiter``/``Join3Xiter``
(/root/reference/slib/spsparse/xiter.hpp:146-282 with the shared advance
loop in ``next_noincr_body.hpp:1-54``) advance 2/3 *sorted, non-repeating*
key streams element-by-element to successive common keys — the workhorse of
its sparse dot products. Sequential pointer-chasing is the wrong shape for a
vector machine, so here the same relation is computed with
``searchsorted``-based set intersection: one vectorized probe of stream A's
keys into stream B, a match mask, and a prefix-sum compaction. Results are
identical for sorted unique keys (pinned against the reference's
``tests/test_xiter.cpp`` goldens).

All functions take padded key arrays plus live counts, and return
``JoinResult`` with compacted matched positions — fully static shapes,
jit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["JoinResult", "join2", "join3", "intersect_mask"]

Array = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JoinResult:
    """Matched positions of a k-way sorted join, compacted to the front.

    ``pos[s][m]`` is the position in input stream ``s`` of the ``m``-th
    common key (for ``m < n_match``); padding positions are ``cap`` (one
    past the end) so out-of-bounds-gather modes drop them cleanly.
    """

    pos: tuple = dataclasses.field(metadata=dict(static=False))
    n_match: Array = dataclasses.field(metadata=dict(static=False))

    @property
    def cap(self) -> int:
        return self.pos[0].shape[0]

    def valid_mask(self) -> Array:
        return jnp.arange(self.cap, dtype=jnp.int32) < self.n_match


def _as_padded(keys, n, sentinel):
    keys = jnp.asarray(keys)
    live = jnp.arange(keys.shape[0], dtype=jnp.int32) < n
    return jnp.where(live, keys, jnp.asarray(sentinel, keys.dtype)), live


def intersect_mask(keys1, n1, keys2, n2, sentinel):
    """For each live position in sorted ``keys1``, whether its key is present
    in sorted ``keys2``, and at which position. Returns ``(match, pos2)``."""
    k1, live1 = _as_padded(keys1, n1, sentinel)
    k2, _ = _as_padded(keys2, n2, sentinel)
    p2 = jnp.searchsorted(k2, k1, side="left").astype(jnp.int32)
    found = jnp.take(k2, p2, mode="fill", fill_value=sentinel) == k1
    match = live1 & (p2 < n2) & found
    return match, p2


def _compact(match, positions, cap):
    """Scatter matched positions to the front; padding = cap."""
    new_pos = jnp.cumsum(match.astype(jnp.int32)) - 1
    tgt = jnp.where(match, new_pos, jnp.asarray(cap, jnp.int32))
    outs = []
    for p in positions:
        out = jnp.full((cap,), p.shape[0], jnp.int32).at[tgt].set(
            p.astype(jnp.int32), mode="drop")
        outs.append(out)
    return tuple(outs), jnp.sum(match).astype(jnp.int32)


def join2(keys1, n1, keys2, n2, *, sentinel, cap: int | None = None) -> JoinResult:
    """2-way sorted-unique-key join (reference ``Join2Xiter``,
    ``xiter.hpp:236-282``). ``sentinel`` must compare greater than any live
    key (use the dimension extent)."""
    cap = cap if cap is not None else min(
        jnp.shape(keys1)[0], jnp.shape(keys2)[0])
    match, p2 = intersect_mask(keys1, n1, keys2, n2, sentinel)
    p1 = jnp.arange(jnp.shape(keys1)[0], dtype=jnp.int32)
    pos, n_match = _compact(match, (p1, p2), cap)
    return JoinResult(pos=pos, n_match=n_match)


def join3(keys1, n1, keys2, n2, keys3, n3, *, sentinel,
          cap: int | None = None) -> JoinResult:
    """3-way sorted-unique-key join (reference ``Join3Xiter``,
    ``xiter.hpp:149-198``): keys present in all three streams."""
    cap = cap if cap is not None else min(
        jnp.shape(keys1)[0], jnp.shape(keys2)[0], jnp.shape(keys3)[0])
    m12, p2 = intersect_mask(keys1, n1, keys2, n2, sentinel)
    m13, p3 = intersect_mask(keys1, n1, keys3, n3, sentinel)
    match = m12 & m13
    p1 = jnp.arange(jnp.shape(keys1)[0], dtype=jnp.int32)
    pos, n_match = _compact(match, (p1, p2, p3), cap)
    return JoinResult(pos=pos, n_match=n_match)
