"""Test harness: force an 8-virtual-device CPU platform.

Tests never require TPU hardware: sharded paths run on a spoofed
8-device CPU mesh (the TPU-world analogue of multi-node testing without
a cluster, SURVEY.md §4e). Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def random_rect_params(rng, n, pos_range=6.0):
    """(w, h, x, y, theta) float32 arrays for n random rectangles."""
    return (
        rng.uniform(0.1, 5.0, n).astype(np.float32),
        rng.uniform(0.1, 5.0, n).astype(np.float32),
        rng.uniform(-pos_range, pos_range, n).astype(np.float32),
        rng.uniform(-pos_range, pos_range, n).astype(np.float32),
        rng.uniform(0.0, 2.0 * np.pi, n).astype(np.float32),
    )


def oracle_vertices(w, h, x, y, t):
    """Reference-arithmetic float32 vertices via the SAT.py oracle."""
    import SAT

    n = len(w)
    out = np.stack(
        [
            SAT.rot_trans_rectangle(SAT.create_rect(w[i], h[i]), x[i], y[i], t[i])
            for i in range(n)
        ]
    )
    return out.reshape(n, 4, 2)
