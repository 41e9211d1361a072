"""Real-chip test lane (``python -m pytest tests_tpu -m tpu``).

Unlike ``tests/`` (which forces the CPU backend for hermeticity), this
lane keeps the default platform — on this machine the single TPU v5e chip
via the axon tunnel — so Mosaic lowering of the production kernels is
covered by tests, not only by bench probes. Kept outside the default
``testpaths`` because first compiles through the tunnel take 30-120 s and
only one process may use the TPU at a time.
"""

import numpy as np
import pytest

import jax


def pytest_collection_modifyitems(config, items):
    on_tpu = False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        pass
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU device available")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
