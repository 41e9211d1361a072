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


def _axon_tunnel_alive() -> bool:
    """When the platform is the axon relay, probe its port before touching
    ``jax.devices()`` — with the relay dead, device init HANGS forever
    (does not raise), which would wedge the whole pytest run."""
    import os
    import socket

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True          # not the relay; jax.devices() is safe
    for port in (8082, 8113):
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def pytest_collection_modifyitems(config, items):
    on_tpu = False
    try:
        if _axon_tunnel_alive():
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
