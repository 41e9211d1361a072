"""Driver entry points compile and run on the test backend (protects
__graft_entry__ against library refactors between driver invocations)."""

import importlib.util
import os

import pytest

import jax


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry_test", os.path.join(os.path.dirname(__file__), "..",
                                         "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (512, 128)


@pytest.mark.slow
def test_dryrun_two_devices():
    m = _load()
    m.dryrun_multichip(2)
