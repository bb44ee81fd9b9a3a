"""Monte Carlo estimation for convex k-gons — the extension beyond the
reference (its README.md:3 names arbitrary convex polygons for SAT; its
MC machinery is rectangle-only). Same adaptive driver, same guarantees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from collide2d_tpu.mc.estimator import (
    AdaptiveConfig,
    Configs,
    PolygonConfigs,
    adaptive_collision_probabilities,
    collision_probability,
    collision_probability_pruned,
    mc_round,
)
from collide2d_tpu.models.collision_model import (
    PolygonCollisionProbabilityModel,
    example_polygon_configs,
)
from tests.conftest import cpu_devices

RECT_ROBOT_WH = np.asarray([4.07, 1.74], np.float32)
# The reference robot as a CCW polygon (create_rect layout, utils.cu:119-130)
RECT_ROBOT_VERTS = jnp.asarray(
    [
        [-2.035, -0.87],
        [2.035, -0.87],
        [2.035, 0.87],
        [-2.035, 0.87],
    ],
    jnp.float32,
)


def _rect_verts(wh):
    w, h = wh[..., 0] * 0.5, wh[..., 1] * 0.5
    return jnp.stack(
        [
            jnp.stack([-w, -h], -1),
            jnp.stack([w, -h], -1),
            jnp.stack([w, h], -1),
            jnp.stack([-w, h], -1),
        ],
        axis=-2,
    )


def test_zero_noise_equals_deterministic_sat(rng):
    cfgs0 = example_polygon_configs(32, k=6, seed=3)
    cfgs = cfgs0._replace(std_dev=jnp.zeros_like(cfgs0.std_dev))
    model = PolygonCollisionProbabilityModel(RECT_ROBOT_VERTS)
    want = np.array(model.collide(cfgs), np.float32)
    got = np.array(model.forward(jax.random.PRNGKey(0), cfgs, 64))
    np.testing.assert_array_equal(got, want)


def test_rect_as_polygon_agrees_with_rect_path(rng):
    # A rectangle expressed as a 4-gon with pose-only noise must estimate
    # the same probabilities as the rectangle path (statistically: the
    # draws differ — (S,3) vs (S,5) normals).
    C, n = 48, 40_000
    pos = rng.uniform(-5, 5, (C, 2)).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, C).astype(np.float32)
    owh = rng.uniform(0.5, 5, (C, 2)).astype(np.float32)
    sd3 = rng.uniform(0.05, 0.4, (C, 3)).astype(np.float32)
    rect_cfgs = Configs(
        position=jnp.asarray(pos),
        pose_theta=jnp.asarray(theta),
        obstacle_wh=jnp.asarray(owh),
        std_dev=jnp.concatenate(
            [jnp.asarray(sd3), jnp.zeros((C, 2), jnp.float32)], axis=1
        ),
    )
    poly_cfgs = PolygonConfigs(
        position=jnp.asarray(pos),
        pose_theta=jnp.asarray(theta),
        obstacle_verts=_rect_verts(jnp.asarray(owh)),
        std_dev=jnp.asarray(sd3),
    )
    cp_rect = np.array(
        collision_probability(
            jax.random.PRNGKey(7), rect_cfgs, RECT_ROBOT_WH, n, impl="jnp"
        )
    )
    cp_poly = np.array(
        collision_probability(
            jax.random.PRNGKey(8), poly_cfgs, RECT_ROBOT_VERTS, n
        )
    )
    # MC sigma at n=4e4 is <= 0.0025; 6 sigma with margin.
    np.testing.assert_allclose(cp_poly, cp_rect, atol=0.02)


def test_polygon_impl_resolution(rng):
    # Off-TPU, 'auto' resolves polygons to the jnp path (the fused
    # polygon kernel needs the hardware PRNG); mc_round accepts both
    # types uniformly.
    from collide2d_tpu.mc.estimator import resolve_impl

    cfgs = example_polygon_configs(8)
    assert resolve_impl("auto", cfgs.position) == "jnp"
    counts = mc_round(
        jax.random.PRNGKey(0),
        jnp.arange(8, dtype=jnp.int32),
        cfgs,
        RECT_ROBOT_VERTS,
        jnp.int32(0),
        n_batch=64,
        impl="auto",
    )
    assert counts.shape == (8,)


def test_from_padded_mask_equals_exact_k(rng):
    # A pentagon padded to k=8 with garbage in the padded slots + a mask
    # must label exactly like the repeat-padded form.
    base = example_polygon_configs(16, k=5, seed=11)
    C = base.num
    garbage = jnp.asarray(rng.uniform(-50, 50, (C, 3, 2)).astype(np.float32))
    padded_verts = jnp.concatenate([base.obstacle_verts, garbage], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((C, 5), bool), jnp.zeros((C, 3), bool)], axis=1
    )
    clean = PolygonConfigs.from_padded(
        base.position, base.pose_theta, padded_verts, base.std_dev, mask=mask
    )
    repeat = jnp.concatenate(
        [base.obstacle_verts, jnp.repeat(base.obstacle_verts[:, -1:], 3, 1)],
        axis=1,
    )
    want = PolygonConfigs(base.position, base.pose_theta, repeat, base.std_dev)
    key = jax.random.PRNGKey(5)
    np.testing.assert_array_equal(
        np.array(collision_probability(key, clean, RECT_ROBOT_VERTS, 256)),
        np.array(collision_probability(key, want, RECT_ROBOT_VERTS, 256)),
    )


def test_adaptive_polygon_labels_satisfy_ci(rng):
    from collide2d_tpu.mc import stats

    cfgs = example_polygon_configs(64, k=6, seed=2)
    cfg = AdaptiveConfig(
        accuracy_bins=(0.0, 0.1, 1.0),
        bin_accuracy=(0.01, 0.05),
        max_samples=40_000,
        fixed_batch=1000,
    )
    cp, n_used, done = adaptive_collision_probabilities(
        jax.random.PRNGKey(9), cfgs, RECT_ROBOT_VERTS, cfg
    )
    assert done.all()
    assert ((cp >= 0) & (cp <= 1)).all()
    k = np.round(cp * n_used).astype(np.int64)
    slack = np.array(
        stats.calc_slack(jnp.asarray(n_used, jnp.int32), jnp.asarray(k, jnp.int32))
    )
    bins = np.array([0.0, 0.1, 1.0], np.float32)
    acc = np.array([0.01, 0.05], np.float32)
    b = np.clip(np.searchsorted(bins, cp, side="right") - 1, 0, len(acc) - 1)
    assert (slack <= acc[b] + 1e-7).all()


def test_polygon_pruned_matches_unpruned_on_candidates(rng):
    # Far-away polygons label 0 without sampling; candidate rows are
    # BITWISE the unpruned labels (uid-keyed streams survive compaction).
    cfgs0 = example_polygon_configs(32, k=6, seed=4)
    far = jnp.asarray(
        np.where(rng.uniform(size=(32, 1)) < 0.5, 500.0, 1.0).astype(np.float32)
    )
    cfgs = cfgs0._replace(position=cfgs0.position * far)
    key = jax.random.PRNGKey(3)
    pruned = collision_probability_pruned(
        key, cfgs, RECT_ROBOT_VERTS, 512, impl="jnp"
    )
    full = np.array(collision_probability(key, cfgs, RECT_ROBOT_VERTS, 512))
    far_rows = np.asarray(far[:, 0]) > 100
    assert (pruned[far_rows] == 0).all()
    np.testing.assert_array_equal(pruned[~far_rows], full[~far_rows])


def test_polygon_config_dp_bitwise(rng):
    # P1 data parallelism stays a value-level no-op for polygons (the jnp
    # path's uid-keyed streams are position-independent).
    devs = cpu_devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from collide2d_tpu.parallel import make_mesh

    C = 64
    cfgs = example_polygon_configs(C, k=6, seed=6)
    key = jax.random.PRNGKey(0)
    uids = jnp.arange(C, dtype=jnp.int32)
    base = np.array(
        mc_round(key, uids, cfgs, RECT_ROBOT_VERTS, jnp.int32(0), n_batch=512)
    )
    mesh = make_mesh(devs)
    sharding = NamedSharding(mesh, P("config"))
    sharded = PolygonConfigs(
        *(jax.device_put(a, sharding) for a in cfgs)
    )
    got = mc_round(
        key,
        jax.device_put(uids, sharding),
        sharded,
        RECT_ROBOT_VERTS,
        jnp.int32(0),
        n_batch=512,
    )
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.array(got), base)


def test_polylabel_cli_roundtrip(tmp_path, rng):
    # End-to-end CLI: npz in -> adaptive labels out; zero-noise rows must
    # equal the deterministic SAT label exactly.
    from collide2d_tpu.cli import main
    from collide2d_tpu.models.collision_model import (
        PolygonCollisionProbabilityModel,
    )

    C = 32
    base = example_polygon_configs(C, k=5, seed=21)
    sd = np.array(base.std_dev)  # writable host copy
    sd[: C // 2] = 0.0  # half the rows: deterministic
    inp = tmp_path / "polys.npz"
    outp = tmp_path / "labels.npz"
    np.savez(
        inp,
        obstacle_verts=np.asarray(base.obstacle_verts),
        position=np.asarray(base.position),
        pose_theta=np.asarray(base.pose_theta),
        std_dev=sd,
        robot_verts=np.asarray(RECT_ROBOT_VERTS),
    )
    rc = main([
        "polylabel", "--data_in", str(inp), "--data_out", str(outp),
        "--max_samples", "4000",
        "--accuracy_bins", "0.0", "0.1", "1.0",
        "--bin_accuracy", "0.02", "0.05",
        "--impl", "jnp", "--seed", "3", "--verbose", "true",
    ])
    assert rc == 0
    out = np.load(outp)
    assert out["cp"].shape == (C,)
    model = PolygonCollisionProbabilityModel(RECT_ROBOT_VERTS)
    det = np.array(
        model.collide(base._replace(std_dev=jnp.zeros_like(base.std_dev)))
    )
    np.testing.assert_array_equal(out["cp"][: C // 2], det[: C // 2].astype(np.float32))
    assert out["converged"].all()


def test_polygon_checkpoint_resume_identical(rng, tmp_path):
    # The generic checkpoint machinery (type(configs)-reconstructed
    # active arrays) must resume polygon runs bit-identically too.
    cfgs = example_polygon_configs(48, k=6, seed=8)
    # Tight targets so the loop needs several rounds and checkpoints
    # actually land before the interrupt (same shape as test_aux.CFG).
    cfg = AdaptiveConfig(
        max_samples=6000, initial_batch=1000, initial_phase_samples=2000,
        later_batch=2000, bin_accuracy=(0.002, 0.002, 0.005), min_active=32,
    )
    key = jax.random.PRNGKey(11)
    base, base_n, base_done = adaptive_collision_probabilities(
        key, cfgs, RECT_ROBOT_VERTS, cfg
    )

    ckpt = tmp_path / "checkpoint.npz"

    class Stop(Exception):
        pass

    def bomb(round, **kw):
        if round >= 3:
            raise Stop

    try:
        adaptive_collision_probabilities(
            key, cfgs, RECT_ROBOT_VERTS, cfg,
            progress=lambda **kw: bomb(**kw),
            checkpoint_path=str(ckpt), checkpoint_every=1,
        )
    except Stop:
        pass
    assert ckpt.exists()

    cp, n_used, done = adaptive_collision_probabilities(
        key, cfgs, RECT_ROBOT_VERTS, cfg,
        checkpoint_path=str(ckpt), checkpoint_every=1,
    )
    np.testing.assert_array_equal(cp, base)
    np.testing.assert_array_equal(n_used, base_n)
    np.testing.assert_array_equal(done, base_done)


def test_polygon_sample_axis_bitwise(rng):
    # P2 for polygons: the generic step-round-robin sample sharding
    # (estimator._sample_sharded_counts -> _counts_chunk's polygon
    # branch) must stay bitwise-equal to the unsharded stream sum.
    devs = cpu_devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from collide2d_tpu.parallel import make_mesh

    C = 32
    cfgs = example_polygon_configs(C, k=6, seed=12)
    key = jax.random.PRNGKey(4)
    uids = jnp.arange(C, dtype=jnp.int32)
    base = np.array(
        mc_round(key, uids, cfgs, RECT_ROBOT_VERTS, jnp.int32(0),
                 n_batch=512, step_samples=64)
    )
    mesh = make_mesh(devs, sample_axis=2)  # (config=4, sample=2)
    sharding = NamedSharding(mesh, P("config"))
    from collide2d_tpu.mc.estimator import _sample_sharded_counts

    got = np.array(
        _sample_sharded_counts(
            key,
            jax.device_put(uids, sharding),
            PolygonConfigs(*(jax.device_put(a, sharding) for a in cfgs)),
            RECT_ROBOT_VERTS,
            jnp.int32(0),
            jnp.int32(512 // 64),
            step_samples=64,
            use_vertices=False,
            mesh=mesh,
        )
    )
    np.testing.assert_array_equal(got, base)


def test_polygon_adaptive_dp_bitwise_matches_unsharded(rng):
    # Full adaptive polygon labeling under a config-DP mesh equals the
    # unsharded run bit for bit (uid-keyed jnp streams).
    devs = cpu_devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from collide2d_tpu.parallel import make_mesh

    cfgs = example_polygon_configs(64, k=6, seed=14)
    cfg = AdaptiveConfig(
        accuracy_bins=(0.0, 0.1, 1.0), bin_accuracy=(0.02, 0.05),
        max_samples=10_000, fixed_batch=1000, min_active=32,
    )
    key = jax.random.PRNGKey(6)
    base = adaptive_collision_probabilities(key, cfgs, RECT_ROBOT_VERTS, cfg)
    got = adaptive_collision_probabilities(
        key, cfgs, RECT_ROBOT_VERTS, cfg, mesh=make_mesh(devs)
    )
    for a, b in zip(got, base):
        np.testing.assert_array_equal(a, b)


def test_polylabel_cli_data_parallel_bitwise(tmp_path, rng, monkeypatch):
    # --data_parallel labels must equal the single-device run bit for bit
    # (uid-keyed jnp streams under config DP). The CLI builds its mesh
    # over jax.devices() — the real chips in production; pin it to the
    # CPU harness here (this container's axon plugin registers a remote
    # TPU that jax.devices() reports even under the CPU-pinned harness).
    devs = cpu_devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    import collide2d_tpu.parallel as par
    from collide2d_tpu.parallel import make_mesh

    monkeypatch.setattr(par, "make_mesh", lambda *a, **k: make_mesh(devs))
    from collide2d_tpu.cli import main

    base = example_polygon_configs(32, k=6, seed=31)
    inp = tmp_path / "polys.npz"
    np.savez(
        inp,
        obstacle_verts=np.asarray(base.obstacle_verts),
        position=np.asarray(base.position),
        pose_theta=np.asarray(base.pose_theta),
        std_dev=np.asarray(base.std_dev),
        robot_verts=np.asarray(RECT_ROBOT_VERTS),
    )
    args = [
        "polylabel", "--data_in", str(inp),
        "--max_samples", "2000",  # 2 rounds: the bitwise claim needs no more
        "--accuracy_bins", "0.0", "0.1", "1.0",
        "--bin_accuracy", "0.02", "0.05",
        "--impl", "jnp", "--seed", "3",
    ]
    assert main(args + ["--data_out", str(tmp_path / "a.npz")]) == 0
    assert main(
        args + ["--data_out", str(tmp_path / "b.npz"), "--data_parallel"]
    ) == 0
    a = np.load(tmp_path / "a.npz")
    b = np.load(tmp_path / "b.npz")
    np.testing.assert_array_equal(a["cp"], b["cp"])
    np.testing.assert_array_equal(a["n_samples"], b["n_samples"])


def test_polygon_kernel_tile_vs_numpy_oracle(rng, monkeypatch):
    # Third, fully independent line of evidence for the fused polygon
    # kernel's math: counts on stubbed draws must equal the repo-root
    # NumPy oracle (SAT.py, the reference-semantics ground truth — not
    # sat_polygons, which the other tests already use) applied to
    # explicitly transformed vertices sample by sample.
    import SAT
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    from tests.conftest import deterministic_uniform_stub

    C = mpp.LANE_CONFIGS
    sub, K = 16, 5
    cfgs = example_polygon_configs(C, k=K, seed=23)
    robot = np.asarray(RECT_ROBOT_VERTS)
    keep = mpp.dedup_robot_axes(robot)
    params = mpp.pack_polygon_mc_params(cfgs, jnp.asarray(robot), keep)

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    counts = np.array(
        mpp.mc_poly_counts_pallas(
            jnp.asarray([1, 2], jnp.int32), params, jnp.int32(1),
            sub=sub, k=K, k2=4, k2_axes=len(keep), interpret=True,
            # one method suffices for the oracle check (the wiring tests
            # in test_pallas.py cover both draw methods); pin it so the
            # replay below stays stream-exact
            normal_method="box_muller",
        )
    )

    # Replay the exact draws, then brute-force per (sample, config).
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    shape = (sub // 2, C)
    za_dx, zb_dx = mcp._box_muller(shape)
    za_dy, zb_dy = mcp._box_muller(shape)
    za_th, zb_th = mcp._box_muller(shape)

    pos = np.asarray(cfgs.position)
    theta = np.asarray(cfgs.pose_theta)
    ov = np.asarray(cfgs.obstacle_verts)
    sd = np.asarray(cfgs.std_dev)
    want = np.zeros((C,), np.int64)
    for z_dx, z_dy, z_th in (
        (np.asarray(za_dx), np.asarray(za_dy), np.asarray(za_th)),
        (np.asarray(zb_dx), np.asarray(zb_dy), np.asarray(zb_th)),
    ):
        for s in range(sub // 2):
            for c in range(C):
                ca, sa = np.cos(theta[c]), np.sin(theta[c])
                R = np.asarray([[ca, -sa], [sa, ca]], np.float32)
                rob = robot @ R.T + pos[c]
                dth = np.float32(z_th[s, c] * sd[c, 2])
                ct, st = np.cos(dth), np.sin(dth)
                R2 = np.asarray([[ct, -st], [st, ct]], np.float32)
                obs = ov[c] @ R2.T + np.asarray(
                    [z_dx[s, c] * sd[c, 0], z_dy[s, c] * sd[c, 1]], np.float32
                )
                want[c] += SAT.convex_collide_polygons(rob, obs)
    np.testing.assert_array_equal(counts, want)


def test_polylabel_cli_sample_parallel_bitwise(tmp_path, rng, monkeypatch):
    # --sample_parallel (new in r3: flag parity with ztest/relabel) must
    # label bit-identically to the single-device run: sample STEPS
    # round-robin over a (1, s) mesh with the single-chip fold_in tags
    # (estimator._sample_sharded_counts). Pin the CLI's jax.devices()
    # to the CPU harness (the axon plugin reports a remote TPU).
    devs = cpu_devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    import collide2d_tpu.parallel as par
    from collide2d_tpu.parallel.sharding import make_mesh as real_make_mesh

    monkeypatch.setattr(
        par, "make_mesh",
        lambda devices=None, sample_axis=None: real_make_mesh(
            devs[: (sample_axis or len(devs))], sample_axis=sample_axis
        ),
    )
    monkeypatch.setattr(jax, "devices", lambda *a, **k: devs)
    from collide2d_tpu.cli import main

    base = example_polygon_configs(32, k=6, seed=33)
    inp = tmp_path / "polys.npz"
    np.savez(
        inp,
        obstacle_verts=np.asarray(base.obstacle_verts),
        position=np.asarray(base.position),
        pose_theta=np.asarray(base.pose_theta),
        std_dev=np.asarray(base.std_dev),
        robot_verts=np.asarray(RECT_ROBOT_VERTS),
    )
    args = [
        "polylabel", "--data_in", str(inp),
        "--max_samples", "2048",
        "--accuracy_bins", "0.0", "0.1", "1.0",
        "--bin_accuracy", "0.02", "0.05",
        "--impl", "jnp", "--seed", "3",
    ]
    assert main(args + ["--data_out", str(tmp_path / "a.npz")]) == 0
    assert main(
        args + ["--data_out", str(tmp_path / "b.npz"),
                "--sample_parallel", "4"]
    ) == 0
    a = np.load(tmp_path / "a.npz")
    b = np.load(tmp_path / "b.npz")
    np.testing.assert_array_equal(a["cp"], b["cp"])
    np.testing.assert_array_equal(a["n_samples"], b["n_samples"])


def test_polylabel_cli_checkpoint_flag(tmp_path, rng):
    # --checkpoint_every wires mid-run checkpoints into polylabel; clean
    # finish removes <data_out>.checkpoint.npz.
    from collide2d_tpu.cli import main

    base = example_polygon_configs(32, k=6, seed=34)
    inp = tmp_path / "polys.npz"
    np.savez(
        inp,
        obstacle_verts=np.asarray(base.obstacle_verts),
        position=np.asarray(base.position),
        pose_theta=np.asarray(base.pose_theta),
        std_dev=np.asarray(base.std_dev),
        robot_verts=np.asarray(RECT_ROBOT_VERTS),
    )
    outp = tmp_path / "labels.npz"
    assert main([
        "polylabel", "--data_in", str(inp), "--data_out", str(outp),
        "--max_samples", "2048",
        "--accuracy_bins", "0.0", "0.1", "1.0",
        "--bin_accuracy", "0.02", "0.05",
        "--impl", "jnp", "--seed", "4", "--checkpoint_every", "1",
    ]) == 0
    assert outp.exists()
    assert not (tmp_path / "labels.npz.checkpoint.npz").exists()
