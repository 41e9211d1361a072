"""Merge-join tests pinned to the reference's xiter goldens
(/root/reference/tests/test_xiter.cpp:37-125)."""

import numpy as np
import jax.numpy as jnp

from spsparse_tpu import join2, join3


def pad(xs, cap, sentinel):
    out = np.full((cap,), sentinel, dtype=np.int32)
    out[: len(xs)] = xs
    return jnp.asarray(out), jnp.asarray(len(xs), jnp.int32)


def join2_keys(v1, v2, sentinel=100, cap=16):
    k1, n1 = pad(v1, cap, sentinel)
    k2, n2 = pad(v2, cap, sentinel)
    r = join2(k1, n1, k2, n2, sentinel=sentinel)
    m = int(r.n_match)
    p1 = np.asarray(r.pos[0])[:m]
    p2 = np.asarray(r.pos[1])[:m]
    # Matched keys must agree between streams (xiter invariant)
    np.testing.assert_array_equal(np.asarray(k1)[p1], np.asarray(k2)[p2])
    return np.asarray(k1)[p1].tolist()


def join3_keys(v1, v2, v3, sentinel=100, cap=16):
    k1, n1 = pad(v1, cap, sentinel)
    k2, n2 = pad(v2, cap, sentinel)
    k3, n3 = pad(v3, cap, sentinel)
    r = join3(k1, n1, k2, n2, k3, n3, sentinel=sentinel)
    m = int(r.n_match)
    keys = np.asarray(k1)[np.asarray(r.pos[0])[:m]]
    np.testing.assert_array_equal(keys, np.asarray(k2)[np.asarray(r.pos[1])[:m]])
    np.testing.assert_array_equal(keys, np.asarray(k3)[np.asarray(r.pos[2])[:m]])
    return keys.tolist()


class TestJoin2:
    # test_xiter.cpp:52-98
    def test_subset(self):
        assert join2_keys([0, 2, 4, 6], [0, 1, 2, 3, 4, 5, 6, 7]) == [0, 2, 4, 6]

    def test_subset_reversed(self):
        assert join2_keys([0, 1, 2, 3, 4, 5, 6, 7], [0, 2, 4, 6]) == [0, 2, 4, 6]

    def test_asymmetric(self):
        assert join2_keys([0, 2, 4, 5, 6, 7, 8, 9], [1, 2, 3, 4, 6]) == [2, 4, 6]

    def test_empty(self):
        assert join2_keys([], [1, 2, 3]) == []
        assert join2_keys([1, 2, 3], []) == []

    def test_docstring_example(self):
        # xiter.hpp:12-18
        assert join2_keys([0, 3, 4, 8], [1, 4, 5, 6, 7, 8, 10]) == [4, 8]


class TestJoin3:
    # test_xiter.cpp:102-125
    def test_golden(self):
        assert join3_keys([0, 2, 4, 6], [0, 1, 2, 3, 4, 5, 6, 7],
                          [1, 2, 3, 6]) == [2, 6]
