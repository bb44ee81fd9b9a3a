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


def test_2d_mesh_round_bitwise(rng, devices):
    # (config=4, sample=2) mesh: sample STEPS round-robin over the sample
    # axis with the single-chip fold_in tags, so the psum'd counts equal
    # the unsharded counts BIT FOR BIT (int32 addition is order-free).
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
    base = np.array(
        mc_round(jax.random.PRNGKey(1), jnp.arange(C, dtype=jnp.int32), cfgs,
                 ROBOT, jnp.int32(0), n_batch=512, step_samples=128)
    )
    np.testing.assert_array_equal(counts, base)


def test_sample_sharding_bitwise_matches_single_device(rng, devices):
    # P2: a pure sample-axis mesh is a value-level no-op vs the same
    # stream summed on one device (same step_samples => same tags).
    C = 16
    cfgs = _configs(rng, C)
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(devices, sample_axis=8)  # pure sample sharding
    n_samples = 1024
    got = np.array(
        sample_sharded_probability(key, cfgs, ROBOT, n_samples, mesh)
    )
    uids = jnp.arange(C, dtype=jnp.int32)
    base = np.array(
        mc_round(key, uids, cfgs, ROBOT, jnp.int32(0),
                 n_batch=n_samples, step_samples=128)
    )
    np.testing.assert_array_equal(got * n_samples, base.astype(np.float32))


def test_make_mesh_validation(devices):
    with pytest.raises(ValueError):
        make_mesh(devices, sample_axis=3)


def test_adaptive_sample_sharded_bitwise_matches_unsharded(rng, devices):
    # The FULL adaptive driver over a pure sample-axis mesh (the ztest
    # deep-budget path) must produce bit-identical labels: steps round-
    # robin with single-chip tags, psum is exact (VERDICT r1 item 5).
    from collide2d_tpu.mc.estimator import (
        AdaptiveConfig,
        adaptive_collision_probabilities,
    )

    cfgs = _configs(rng, 48)
    cfg = AdaptiveConfig(
        max_samples=8192, fixed_batch=1024, step_samples=128,
        bin_accuracy=(0.002, 0.002, 0.005), min_active=8, impl="jnp",
    )
    key = jax.random.PRNGKey(11)
    base = adaptive_collision_probabilities(key, cfgs, ROBOT, cfg)
    mesh = make_mesh(devices, sample_axis=8)  # (config=1, sample=8)
    got = adaptive_collision_probabilities(key, cfgs, ROBOT, cfg, mesh=mesh)
    for a, b in zip(got, base):
        np.testing.assert_array_equal(a, b)


def test_adaptive_2d_mesh_bitwise_matches_unsharded(rng, devices):
    # Both axes at once: (config=4, sample=2).
    from collide2d_tpu.mc.estimator import (
        AdaptiveConfig,
        adaptive_collision_probabilities,
    )

    cfgs = _configs(rng, 64)
    cfg = AdaptiveConfig(
        max_samples=4096, fixed_batch=512, step_samples=128,
        bin_accuracy=(0.002, 0.002, 0.005), min_active=8, impl="jnp",
    )
    key = jax.random.PRNGKey(13)
    base = adaptive_collision_probabilities(key, cfgs, ROBOT, cfg)
    mesh = make_mesh(devices, sample_axis=2)
    got = adaptive_collision_probabilities(key, cfgs, ROBOT, cfg, mesh=mesh)
    for a, b in zip(got, base):
        np.testing.assert_array_equal(a, b)


def test_adaptive_pallas_with_sample_mesh_accepted(rng, devices):
    # impl='pallas' + sample axis > 1 is a supported combination (round-3
    # sample-split, estimator._pallas_sharded_counts): the driver must
    # keep the fused kernel — no fallback warning, impl stays 'pallas',
    # and the round mesh is the full 2-D mesh so the shard_map wrapper
    # sees the sample axis. The kernel itself needs a TPU, so this pins
    # the DRIVER resolution only (the step-split math is pinned in
    # test_pallas_sample_axis_step_split_* below).
    import warnings

    from collide2d_tpu.mc.driver import AdaptiveRun
    from collide2d_tpu.mc.estimator import AdaptiveConfig

    cfgs = _configs(rng, 16)
    mesh = make_mesh(devices, sample_axis=8)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        run = AdaptiveRun(
            jax.random.PRNGKey(17), cfgs, ROBOT,
            AdaptiveConfig(
                impl="pallas", max_samples=2048, fixed_batch=512,
                bin_accuracy=(0.002, 0.002, 0.005), min_active=8,
            ),
            mesh=mesh, warmup=False,
        )
    assert run.scheduler.impl == "pallas"
    assert run.ops.round_mesh is mesh


def _shape_only_uniform_stub():
    """A seed-blind AND call-index-blind uniform source: values depend
    only on the requested shape, so every step of every shard (and every
    separately jitted trace, cached or fresh) draws identical noise.
    Counts are then exactly linear in the executed step count — the
    property the step-split tests below lean on."""
    import jax
    import jax.numpy as jnp

    def stub(shape):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        h = (i * jnp.int32(shape[1]) + j) * jnp.int32(-1640531535) + jnp.int32(
            40503
        )
        u24 = jax.lax.shift_right_logical(h, 8) & jnp.int32(0xFFFFFF)
        return (u24.astype(jnp.float32) + 1.0) * jnp.float32(1.0 / (1 << 24))

    return stub


def test_pallas_sample_axis_step_split_exact(rng, devices, monkeypatch):
    # Sample-axis pallas: shard s runs n_steps//S steps (+1 for the first
    # n_steps%S shards); the psum'd counts must equal the unsharded
    # kernel at the SAME total step count. Under the shape-only stub,
    # counts are linear in executed steps, so equality at n_steps=12 over
    # S=8 shards (locals 2,2,2,2,1,1,1,1) pins the split, the remainder
    # distribution, and the psum wiring exactly — over-replication
    # (8x12) or a dropped remainder (8x1) would both fail.
    import collide2d_tpu.ops.mc_pallas as mcp
    from collide2d_tpu.mc.estimator import _pallas_sharded_counts
    from collide2d_tpu.ops.mc_pallas import mc_round_pallas

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", _shape_only_uniform_stub())
    C = mcp.LANE_CONFIGS
    cfgs = _configs(rng, C)
    key = jax.random.PRNGKey(5)
    base = np.asarray(
        mc_round_pallas(
            key, cfgs, ROBOT, jnp.int32(0),
            n_steps=jnp.int32(12), sub=16, interpret=True,
        )
    )
    mesh = make_mesh(devices, sample_axis=8)
    got = np.asarray(
        _pallas_sharded_counts(
            key, cfgs, ROBOT, jnp.int32(0), jnp.int32(12),
            sub=16, mesh=mesh, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, base)
    assert base.max() > 0  # some configurations collide under the stub


def test_pallas_sample_axis_step_split_polygons(rng, devices, monkeypatch):
    # Same exact-step-split pin for the fused POLYGON kernel dispatch
    # (PolygonConfigs shards route to ops.mc_polygon_pallas, which shares
    # the uniform source hook with ops.mc_pallas).
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    from collide2d_tpu.mc.estimator import _pallas_sharded_counts
    from collide2d_tpu.models.collision_model import example_polygon_configs

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", _shape_only_uniform_stub())
    C = mpp.LANE_CONFIGS
    cfgs = example_polygon_configs(C, k=6, seed=9)
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    key = jax.random.PRNGKey(5)
    base = np.asarray(
        mpp.mc_round_polygons_pallas(
            key, cfgs, robot, jnp.int32(0),
            n_steps=jnp.int32(11), sub=16, interpret=True,
        )
    )
    mesh = make_mesh(devices, sample_axis=8)
    got = np.asarray(
        _pallas_sharded_counts(
            key, cfgs, robot, jnp.int32(0), jnp.int32(11),
            sub=16, mesh=mesh, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, base)
    assert base.max() > 0


def test_pallas_sharded_counts_smoke_interpret(rng, devices, monkeypatch):
    # CPU interpret-mode smoke of the shard_map wrapping of the fused
    # Pallas kernel (per-shard seeds over the config axis). The hardware
    # PRNG has no CPU lowering, so the uniform source is stubbed.
    import collide2d_tpu.ops.mc_pallas as mcp
    from collide2d_tpu.mc.estimator import _pallas_sharded_counts
    from tests.conftest import deterministic_uniform_stub

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    C = 8 * mcp.LANE_CONFIGS
    cfgs = _configs(rng, C)
    mesh = make_mesh(devices)  # (config=8, sample=1)
    counts = np.array(
        _pallas_sharded_counts(
            jax.random.PRNGKey(5), cfgs,
            ROBOT, jnp.int32(0), jnp.int32(4),  # 4 steps x sub 16 = 64
            sub=16, mesh=mesh, interpret=True,
        )
    )
    assert counts.shape == (C,)
    assert (counts >= 0).all() and (counts <= 64).all()
    assert counts.max() > 0  # some configurations collide


def test_pallas_sharded_counts_polygons_smoke_interpret(rng, devices, monkeypatch):
    # Same shard_map smoke for the fused POLYGON kernel: PolygonConfigs
    # shards dispatch to ops.mc_polygon_pallas with per-shard seeds.
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    from collide2d_tpu.mc.estimator import _pallas_sharded_counts
    from collide2d_tpu.models.collision_model import example_polygon_configs
    from tests.conftest import deterministic_uniform_stub

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    C = 8 * mpp.LANE_CONFIGS
    cfgs = example_polygon_configs(C, k=6, seed=9)
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    mesh = make_mesh(devices)
    counts = np.array(
        _pallas_sharded_counts(
            jax.random.PRNGKey(5), cfgs,
            robot, jnp.int32(0), jnp.int32(4),
            sub=16, mesh=mesh, interpret=True,
        )
    )
    assert counts.shape == (C,)
    assert (counts >= 0).all() and (counts <= 64).all()
    assert counts.max() > 0


def test_pallas_sharded_counts_moving_polygons_smoke_interpret(
    rng, devices, monkeypatch
):
    # Same shard_map smoke for the fused TRAJECTORY k-gon kernel:
    # translation-only MovingPolygonConfigs shards dispatch to
    # ops.mc_moving_polygon_pallas with per-shard seeds.
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    from collide2d_tpu.mc.estimator import _pallas_sharded_counts
    from collide2d_tpu.mc.moving import moving_polygon_configs
    from collide2d_tpu.models.collision_model import example_polygon_configs
    from tests.conftest import deterministic_uniform_stub

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    C = 8 * mpp.LANE_CONFIGS
    static = example_polygon_configs(C, k=6, seed=9)
    np_rng = np.random.default_rng(3)
    cfgs = moving_polygon_configs(
        static.position, static.pose_theta, static.obstacle_verts,
        static.std_dev,
        np_rng.uniform(-2, 2, (C, 2)).astype(np.float32),
        0.0,
        np_rng.uniform(0.5, 3, C).astype(np.float32),
    )
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    mesh = make_mesh(devices)
    counts = np.array(
        _pallas_sharded_counts(
            jax.random.PRNGKey(5), cfgs,
            robot, jnp.int32(0), jnp.int32(4),
            sub=16, mesh=mesh, interpret=True,
        )
    )
    assert counts.shape == (C,)
    assert (counts >= 0).all() and (counts <= 64).all()
    assert counts.max() > 0


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


def test_process_batch_range_partition():
    from collide2d_tpu.parallel import process_batch_range

    # union over processes is exactly the global range, disjoint, ordered
    for num_batches, n_proc, start in [(100, 8, 0), (7, 3, 5), (3, 8, 0)]:
        seen = []
        for pid in range(n_proc):
            r = process_batch_range(
                num_batches, start, process_id=pid, num_processes=n_proc
            )
            seen.extend(r)
        assert seen == list(range(start, start + num_batches))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        process_batch_range(10, process_id=4, num_processes=4)


def test_global_mesh_single_host(devices):
    # single-host: global_mesh == make_mesh over local devices; the
    # sample axis must divide the per-process device count.
    from collide2d_tpu.parallel import global_mesh

    mesh = global_mesh(sample_axis=2, devices=devices)
    assert mesh.shape["sample"] == 2
    assert mesh.shape["config"] * 2 == len(devices)
    with pytest.raises(ValueError, match="ICI"):
        global_mesh(sample_axis=16, devices=devices)


def test_toi_and_distance_shard_over_config_axis(rng, devices):
    # the geometric query layer composes with the DP mesh: sharding the
    # batch axis is a no-op on values (communication-free map).
    from jax import shard_map

    from collide2d_tpu.ops.distance import rect_signed_distance
    from collide2d_tpu.ops.toi import rect_time_of_impact

    mesh = make_mesh(devices)
    n = 64
    c1 = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(2, 5, (n, 2)).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    th = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    v2 = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    zeros2 = jnp.zeros((n, 2), jnp.float32)

    def dist(c1, e1, th, c2, e2):
        return rect_signed_distance(c1, e1, th, c2, e2, th)

    def toi(c1, e1, th, c2, e2, v2, w):
        return rect_time_of_impact(
            c1, e1, th, zeros2[: c1.shape[0]], w,
            c2, e2, th, v2, -w, t_max=6.0, iters=64,
        )

    spec2 = P("config", None)
    spec1 = P("config")
    sharded_dist = jax.jit(shard_map(
        dist, mesh=mesh,
        in_specs=(spec2, spec2, spec1, spec2, spec2), out_specs=spec1,
    ))
    # XLA fuses the candidate tensors differently per shard shape:
    # values agree to f32 rounding (the Pallas kernels, which pin the
    # op order, are covered by the bitwise mc sharding tests above)
    got = np.array(sharded_dist(c1, e1, th, c2, e2))
    np.testing.assert_allclose(
        got, np.array(dist(c1, e1, th, c2, e2)), atol=2e-6, rtol=1e-6)

    sharded_toi = jax.jit(shard_map(
        toi, mesh=mesh,
        in_specs=(spec2, spec2, spec1, spec2, spec2, spec2, spec1),
        out_specs=spec1,
    ))
    # the CA loop's distance math fuses differently per shard shape, so
    # times agree to f32 rounding, hit/miss decisions exactly
    got_t = np.array(sharded_toi(c1, e1, th, c2, e2, v2, w))
    want_t = np.array(toi(c1, e1, th, c2, e2, v2, w))
    np.testing.assert_array_equal(np.isfinite(got_t), np.isfinite(want_t))
    m = np.isfinite(want_t)
    np.testing.assert_allclose(got_t[m], want_t[m], atol=1e-5)
    assert m.any()


def test_moving_sample_axis_bitwise(rng, devices):
    # MovingConfigs through the sample-axis step round-robin: the psum
    # of partial counts must be BITWISE the unsharded counts (same
    # fold_in tags; the TOI predicate is deterministic per draw).
    from collide2d_tpu.mc.moving import moving_configs

    C = 32
    cfgs = moving_configs(
        rng.uniform(-4, 4, (C, 2)).astype(np.float32),
        rng.uniform(0, 7, C).astype(np.float32),
        rng.uniform(0.5, 4, (C, 2)).astype(np.float32),
        rng.uniform(0, 0.3, (C, 5)).astype(np.float32),
        rng.uniform(-1, 1, (C, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, C).astype(np.float32),
        2.0,
    )
    key = jax.random.PRNGKey(9)
    uids = jnp.arange(C, dtype=jnp.int32)
    base = np.array(mc_round(key, uids, cfgs, ROBOT, jnp.int32(0),
                             n_batch=512, step_samples=64))
    from collide2d_tpu.mc.estimator import _sample_sharded_counts

    mesh = make_mesh(devices, sample_axis=4)
    got = np.array(_sample_sharded_counts(
        key, uids, shard_configs(cfgs, mesh), ROBOT, jnp.int32(0),
        jnp.int32(8), step_samples=64, use_vertices=False, mesh=mesh,
    ))
    np.testing.assert_array_equal(got, base)


def test_query_layer_config_dp_bitwise(rng, devices):
    # The round-3 query layer (manifold, raycast, hull) under config-axis
    # DP: sharding the batch must be a value-level no-op (GSPMD inserts
    # no value-changing collectives for elementwise batch ops).
    from jax.sharding import Mesh

    from collide2d_tpu.ops.geometry import convex_hull
    from collide2d_tpu.ops.manifold import polygon_contact_manifold
    from collide2d_tpu.ops.raycast import polygon_raycast
    from tests.test_distance import _random_pair_batch

    p1, p2 = _random_pair_batch(rng, n=96)
    o = jnp.asarray(rng.uniform(-6, 6, (96, 2)).astype(np.float32))
    d = jnp.asarray(rng.uniform(-1, 1, (96, 2)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-2, 2, (96, 12, 2)).astype(np.float32))

    # jit both sides: eager-vs-jit fusion differences are rounding
    # noise unrelated to sharding; the DP claim is jit vs jit.
    base_m = [np.array(a) for a in jax.jit(polygon_contact_manifold)(p1, p2)]
    base_r = [np.array(a) for a in jax.jit(polygon_raycast)(o, d, p1)]
    base_h = np.array(jax.jit(convex_hull)(pts))

    mesh = Mesh(np.array(devices[:8]), ("config",))
    sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    p1s = sh(p1, P("config", None, None))
    p2s = sh(p2, P("config", None, None))
    os_ = sh(o, P("config", None))
    ds = sh(d, P("config", None))
    ptss = sh(pts, P("config", None, None))

    got_m = [np.array(a) for a in jax.jit(polygon_contact_manifold)(p1s, p2s)]
    got_r = [np.array(a) for a in jax.jit(polygon_raycast)(os_, ds, p1s)]
    got_h = np.array(jax.jit(convex_hull)(ptss))
    for a, b in zip(base_m, got_m):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(base_r, got_r):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(base_h, got_h)
