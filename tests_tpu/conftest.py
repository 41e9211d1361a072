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


def _axon_port_open() -> bool:
    """Fast-path check: with JAX_PLATFORMS=axon and every relay port
    (8082-8117) refusing connections, the relay is certainly dead — skip
    without paying the device-init timeout. An open port is only a hint
    (could be an unrelated listener); _devices_with_timeout still guards
    the hang in that case."""
    import os
    import socket

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True          # not the relay; jax.devices() is safe
    for port in range(8082, 8118):
        s = socket.socket()
        s.settimeout(0.5)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def _devices_with_timeout(seconds: float = 180.0):
    """``jax.devices()`` guarded by a daemon-thread timeout.

    With the axon relay dead, device init HANGS forever (does not raise),
    which would wedge the whole pytest run; and a port probe alone is not
    enough (an unrelated listener on a relay port would still hang us).
    Returns None on timeout/failure."""
    import threading

    out = []

    def target():
        try:
            out.append(jax.devices())
        except Exception:
            out.append(None)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(seconds)
    return out[0] if out else None


def pytest_collection_modifyitems(config, items):
    on_tpu = False
    if _axon_port_open():
        devs = _devices_with_timeout()
        if devs:
            on_tpu = devs[0].platform == "tpu"
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU device available")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
