"""Multi-chip SPMD paths on a spoofed 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from collide2d_tpu.mc.estimator import Configs, mc_round
from collide2d_tpu.parallel import (
    make_mesh,
    sample_sharded_probability,
    shard_configs,
    sharded_mc_round,
)
from tests.conftest import cpu_devices

ROBOT = jnp.asarray([4.07, 1.74], jnp.float32)


from tests.conftest import random_configs as _configs


@pytest.fixture(scope="module")
def devices():
    devs = cpu_devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs


def test_config_dp_bitwise_matches_unsharded(rng, devices):
    # P1: pure data parallelism over the config axis must be a no-op on
    # values — same counts bit for bit.
    C = 64
    cfgs = _configs(rng, C)
    key = jax.random.PRNGKey(0)
    uids = jnp.arange(C, dtype=jnp.int32)
    base = np.array(mc_round(key, uids, cfgs, ROBOT, jnp.int32(0), n_batch=512))

    mesh = make_mesh(devices)  # (8, 1)
    sharded = shard_configs(cfgs, mesh)
    uids_s = jax.device_put(uids, NamedSharding(mesh, P("config")))
    got = mc_round(key, uids_s, sharded, ROBOT, jnp.int32(0), n_batch=512)
    assert len(got.sharding.device_set) == 8  # actually ran sharded
    np.testing.assert_array_equal(np.array(got), base)


def test_2d_mesh_round(rng, devices):
    # (config=4, sample=2) mesh: per-device partial counts + psum.
    C = 64
    cfgs = _configs(rng, C)
    mesh = make_mesh(devices, sample_axis=2)
    sharded = shard_configs(cfgs, mesh)
    counts = np.array(
        sharded_mc_round(
            jax.random.PRNGKey(1),
            jnp.arange(C, dtype=jnp.int32),
            sharded,
            ROBOT,
            jnp.int32(0),
            n_batch=512,
            step_samples=128,
            mesh=mesh,
        )
    )
    assert counts.shape == (C,)
    assert (counts >= 0).all() and (counts <= 512).all()
    base = np.array(
        mc_round(jax.random.PRNGKey(1), jnp.arange(C, dtype=jnp.int32), cfgs,
                 ROBOT, jnp.int32(0), n_batch=512)
    )
    # Different key streams => statistical agreement only.
    np.testing.assert_allclose(counts / 512, base / 512, atol=0.15)


def test_sample_sharding_partition_matches_manual(rng, devices):
    # P2: the psum-of-partials must equal the sum of each shard's
    # independent stream computed by hand on one device.
    C = 16
    cfgs = _configs(rng, C)
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(devices, sample_axis=8)  # pure sample sharding
    n_samples = 1024
    got = np.array(
        sample_sharded_probability(key, cfgs, ROBOT, n_samples, mesh)
    )
    uids = jnp.arange(C, dtype=jnp.int32)
    manual = np.zeros(C, np.int64)
    for sidx in range(8):
        manual += np.array(
            mc_round(
                jax.random.fold_in(key, sidx), uids, cfgs, ROBOT, jnp.int32(0),
                n_batch=n_samples // 8, step_samples=128,
            )
        )
    np.testing.assert_allclose(got, manual / n_samples, atol=1e-6)


def test_make_mesh_validation(devices):
    with pytest.raises(ValueError):
        make_mesh(devices, sample_axis=3)


def test_adaptive_sharded_bitwise_matches_unsharded(rng, devices):
    # DP labeling over the mesh must be a value-level no-op: uid-keyed
    # threefry streams are position-independent.
    from collide2d_tpu.mc.estimator import (
        AdaptiveConfig,
        adaptive_collision_probabilities,
    )

    cfgs = _configs(rng, 64)
    cfg = AdaptiveConfig(
        max_samples=8000, initial_batch=1000, initial_phase_samples=2000,
        later_batch=2000, bin_accuracy=(0.002, 0.002, 0.005), min_active=16,
        impl="jnp",
    )
    key = jax.random.PRNGKey(21)
    base = adaptive_collision_probabilities(key, cfgs, ROBOT, cfg)
    mesh = make_mesh(devices)  # (8, 1)
    got = adaptive_collision_probabilities(key, cfgs, ROBOT, cfg, mesh=mesh)
    for a, b in zip(got, base):
        np.testing.assert_array_equal(a, b)
