"""Test harness: force an 8-virtual-device CPU platform.

Tests never require TPU hardware: sharded paths run on a spoofed
8-device CPU mesh (the TPU-world analogue of multi-node testing without
a cluster, SURVEY.md §4e). Env vars must be set before the first jax
import. NOTE: this container's sitecustomize force-registers the `axon`
TPU plugin as the default backend no matter what JAX_PLATFORMS says, so
we additionally pin jax_default_device to a CPU device.
"""

import os

# CLI entry points enable the persistent compilation cache as a global
# JAX config side effect; tests must neither write to ~/.cache nor run
# later cases under a mutated global config (cli.main() is called
# in-process by the CLI tests).
os.environ.setdefault("COLLIDE2D_CACHE_DIR", "")

os.environ["JAX_NUM_CPU_DEVICES"] = "8"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize's axon register() forces jax_platforms="axon,cpu" at the
# CONFIG level (env JAX_PLATFORMS=cpu is a no-op against it), so the
# first jax.devices() call initializes the remote axon backend — a
# tunnel round-trip that blocks the whole CPU suite for minutes (or
# forever) whenever the tunnel is loaded. Re-pin the config AFTER the
# import so backends() never constructs the axon client: the suite must
# run green with the tunnel wedged.
jax.config.update("jax_platforms", "cpu")

_CPU_DEVICES = jax.devices("cpu")
jax.config.update("jax_default_device", _CPU_DEVICES[0])

import json  # noqa: E402
import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---- fast/slow lanes (data-driven) ---------------------------------------
# tests/durations.json records per-test wall time from a full-suite run;
# collection marks anything recorded at >= SLOW_SECONDS as `slow`, so
#   pytest -m "not slow"   is the <= ~5 min inner loop, and
#   pytest                 (no filter) stays the full round gate.
# Unrecorded (new) tests default to the fast lane until the next refresh:
#   pytest --update-durations        (rewrites the file from this run)
SLOW_SECONDS = 5.0
_DURATIONS_FILE = pathlib.Path(__file__).parent / "durations.json"


def pytest_addoption(parser):
    parser.addoption(
        "--update-durations", action="store_true", default=False,
        help="rewrite tests/durations.json from this run's measured times",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: recorded wall time >= 5s (auto-applied from "
        "tests/durations.json; deselect with -m 'not slow')",
    )


def pytest_collection_modifyitems(config, items):
    try:
        recorded = json.loads(_DURATIONS_FILE.read_text())
    except (OSError, ValueError):
        recorded = {}
    unrecorded = []
    for item in items:
        if recorded.get(item.nodeid, 0.0) >= SLOW_SECONDS:
            item.add_marker(pytest.mark.slow)
        elif (recorded and item.nodeid not in recorded
              and not item.get_closest_marker("skip")
              and not item.get_closest_marker("skipif")):
            # skip-marked tests (the TPU-gated ones) never record a
            # duration under the CPU harness — not a lane-decay signal
            unrecorded.append(item.nodeid)
    if unrecorded:
        # A new test rides the fast lane by default no matter how slow
        # it is; surface that so the next full run refreshes the record
        # (review r4 #8 — the lane boundary must not decay silently).
        import warnings

        warnings.warn(
            f"{len(unrecorded)} test(s) have no recorded duration in "
            f"tests/durations.json and default to the fast lane "
            f"(first: {unrecorded[0]}); refresh with "
            f"`pytest --update-durations`",
            stacklevel=1,
        )


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    if call.when == "call" and item.config.getoption("--update-durations"):
        store = getattr(item.session, "_collide2d_durations", None)
        if store is None:
            store = item.session._collide2d_durations = {}
        store[item.nodeid] = round(call.duration, 2)
    return outcome.get_result()


def pytest_sessionfinish(session, exitstatus):
    store = getattr(session, "_collide2d_durations", None)
    if store and session.config.getoption("--update-durations"):
        # Merge over the existing record so partial runs (-k, a single
        # file) refresh only what they measured.
        try:
            recorded = json.loads(_DURATIONS_FILE.read_text())
        except (OSError, ValueError):
            recorded = {}
        recorded.update(store)
        _DURATIONS_FILE.write_text(
            json.dumps(recorded, indent=0, sort_keys=True) + "\n"
        )


def cpu_devices():
    return _CPU_DEVICES


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


def deterministic_uniform_stub():
    """A stand-in for the Pallas hardware-PRNG uniform source.

    Built from iota + integer hashing so it traces INSIDE a kernel (no
    captured constants) and replays identically outside it: value depends
    only on (shape, call index). Returns floats in (0, 1].
    """
    import jax
    import jax.numpy as jnp

    calls = [0]

    def stub(shape):
        calls[0] += 1
        i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        h = (i * jnp.int32(shape[1]) + j) * jnp.int32(-1640531535) + jnp.int32(
            calls[0] * 40503
        )
        u24 = jax.lax.shift_right_logical(h, 8) & jnp.int32(0xFFFFFF)
        return (u24.astype(jnp.float32) + 1.0) * jnp.float32(1.0 / (1 << 24))

    return stub


def random_configs(rng, n, sigma=0.3, shape_sigma=0.0):
    """A random Configs batch for estimator tests (shared helper)."""
    import jax.numpy as jnp

    from collide2d_tpu.mc.estimator import Configs

    pose_shape = rng.uniform(0, sigma, (n, 3))
    wh_noise = (
        rng.uniform(0, shape_sigma, (n, 2)) if shape_sigma else np.zeros((n, 2))
    )
    return Configs(
        position=jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32)),
        pose_theta=jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32)),
        obstacle_wh=jnp.asarray(rng.uniform(0.5, 5, (n, 2)).astype(np.float32)),
        std_dev=jnp.asarray(
            np.concatenate([pose_shape, wh_noise], axis=1).astype(np.float32)
        ),
    )
