"""Trajectory labels for convex k-gon pairs (`MovingPolygonConfigs`,
mc/moving.py): the {moving} x {polygon} corner of the label matrix.
Pins: bitwise degeneration to the static polygon path at zero motion,
exact translation windows (CA-budget independence, grazing hits),
deterministic analytic motions incl. pure rotation, the adaptive
driver + pruning + config-DP sharding, the impl guard, the model
surface, and the movelabel CLI roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collide2d_tpu.mc.estimator import (
    AdaptiveConfig,
    PolygonConfigs,
    adaptive_collision_probabilities,
    collision_probability,
    mc_round,
)
from collide2d_tpu.mc.moving import (
    MovingPolygonConfigs,
    moving_polygon_configs,
    trajectory_collision_probability,
)

# a 4.07 x 1.74 rectangle as a 4-gon robot (the reference's robot as
# vertices, so rect-path intuitions carry over)
ROBOT = jnp.asarray(
    [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
    jnp.float32,
)


def _ellipse_polys(rng, n, k=6):
    ang = np.sort(rng.uniform(0, 2 * np.pi, (n, k)), axis=-1)
    ab = rng.uniform(0.5, 3.0, (n, 1, 2))
    return (np.stack([np.cos(ang), np.sin(ang)], -1) * ab).astype(np.float32)


def _static_and_moving(rng, n, k=6, v=0.0, w=0.0, t_max=1.0):
    pos = rng.uniform(-4, 4, (n, 2)).astype(np.float32)
    th = rng.uniform(0, 7, n).astype(np.float32)
    verts = _ellipse_polys(rng, n, k)
    sd = rng.uniform(0, 0.3, (n, 3)).astype(np.float32)
    static = PolygonConfigs(jnp.asarray(pos), jnp.asarray(th),
                            jnp.asarray(verts), jnp.asarray(sd))
    moving = moving_polygon_configs(pos, th, verts, sd, v, w, t_max)
    return static, moving


def test_zero_motion_is_bitwise_the_static_polygon_path(rng):
    # same key, same (n_lanes, 3) draws, velocity = omega = 0: every
    # translation-window axis test degenerates to the static
    # sat_polygons interval test on the same separately-rounded
    # projections (ops.toi.polygon_translation_toi_parts) — counts,
    # and hence cp, are bitwise the static polygon path's.
    static, moving = _static_and_moving(rng, 64)
    key = jax.random.PRNGKey(3)
    a = np.array(collision_probability(key, static, ROBOT, 4096,
                                       impl="jnp"))
    b = np.array(trajectory_collision_probability(key, moving, ROBOT, 4096))
    np.testing.assert_array_equal(a, b)
    assert (a > 0).any() and (a < 1).any()


def test_deterministic_motion_analytic():
    # zero noise => every sample identical => cp in {0, 1} exactly:
    # an approaching translation hits, a receding one misses, a
    # too-short horizon misses, an initial overlap hits at t=0.
    tri = np.array([[[-1.0, -1.0], [1.0, -1.0], [0.0, 1.0]]] * 4,
                   np.float32)
    cfgs = moving_polygon_configs(
        position=np.array(
            [[8.0, 0.0], [8.0, 0.0], [8.0, 0.0], [0.3, 0.0]], np.float32),
        pose_theta=0.0,
        obstacle_verts=tri,
        std_dev=np.zeros(3, np.float32),
        velocity=np.array(
            [[-1.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, 0.0]], np.float32),
        omega=0.0,
        t_max=np.array([10.0, 10.0, 2.0, 1.0], np.float32),
    )
    cp = np.array(trajectory_collision_probability(
        jax.random.PRNGKey(0), cfgs, ROBOT, 256))
    np.testing.assert_array_equal(cp, [1.0, 0.0, 0.0, 1.0])


def test_pure_rotation_analytic():
    # The bar robot rotating in place about the origin. An obstacle
    # triangle parked OFF-AXIS at ~45 degrees (closest vertex (1.3,1.3),
    # radius 1.84 < the bar's corner radius 2.21) is swept by a
    # counterclockwise quarter turn (the corner dips under it: cp = 1)
    # but NOT by the clockwise quarter turn — under cw rotation every
    # triangle point stays at body-frame |y| >= 1.30 > the half-height
    # 0.87 throughout (the bar is symmetric, so an ON-axis obstacle
    # would be hit by both directions). Zero noise: deterministic; CA
    # must certify the transversal hit.
    tri = np.array(
        [[[1.3, 1.3], [2.0, 1.3], [1.3, 2.1]]] * 2, np.float32)
    cfgs = moving_polygon_configs(
        position=np.zeros((2, 2), np.float32),
        pose_theta=0.0,
        obstacle_verts=tri,
        std_dev=np.zeros(3, np.float32),
        velocity=np.zeros(2, np.float32),
        omega=np.array([np.pi / 2, -np.pi / 2], np.float32),
        t_max=1.0,
    )
    cp = np.array(trajectory_collision_probability(
        jax.random.PRNGKey(0), cfgs, ROBOT, 128, ca_iters=96))
    np.testing.assert_array_equal(cp, [1.0, 0.0])


def test_translation_batches_are_exact_and_iter_independent(rng):
    # omega == 0 everywhere: every sample resolves through the exact
    # k-gon window, so labels are INDEPENDENT of the CA budget, and the
    # adaptive driver's auto-detection (effective ca_iters = 0) changes
    # nothing.
    _, moving = _static_and_moving(rng, 32, v=(-0.8, 0.3), t_max=3.0)
    key = jax.random.PRNGKey(21)
    a = np.array(trajectory_collision_probability(key, moving, ROBOT, 2048,
                                                  ca_iters=1))
    b = np.array(trajectory_collision_probability(key, moving, ROBOT, 2048,
                                                  ca_iters=96))
    np.testing.assert_array_equal(a, b)

    cfg_hi = AdaptiveConfig(max_samples=8_000,
                            bin_accuracy=(0.02, 0.02, 0.02), ca_iters=48)
    cfg_lo = cfg_hi.__class__(**{**cfg_hi.__dict__, "ca_iters": 3})
    got_hi = adaptive_collision_probabilities(key, moving, ROBOT, cfg_hi)
    got_lo = adaptive_collision_probabilities(key, moving, ROBOT, cfg_lo)
    for x, y in zip(got_hi, got_lo):
        np.testing.assert_array_equal(x, y)


def test_grazing_translation_counted():
    # A corner-graze no CA budget can certify is an exact-window hit:
    # zero noise, a unit-square robot passing with its top edge exactly
    # touching the obstacle's bottom vertex. cp must be exactly 1
    # (touching collides, the sat_polygons convention).
    square = jnp.asarray(
        [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]], jnp.float32)
    tri = np.array([[[0.0, 0.5], [1.0, 2.0], [-1.0, 2.0]]], np.float32)
    cfgs = moving_polygon_configs(
        position=np.array([[5.0, 0.0]], np.float32), pose_theta=0.0,
        obstacle_verts=tri, std_dev=np.zeros(3, np.float32),
        velocity=np.array([[-1.0, 0.0]], np.float32), omega=0.0,
        t_max=10.0)
    cp = np.array(trajectory_collision_probability(
        jax.random.PRNGKey(0), cfgs, square, 256))
    np.testing.assert_array_equal(cp, [1.0])


def test_rect_as_4gon_agrees_with_rect_trajectory_family(rng):
    # Cross-FAMILY oracle: the same physical problem — a rectangle robot
    # moving past a noisy rectangle obstacle — labeled by the rectangle
    # trajectory family (`MovingConfigs`, closed-form OBB predicates) and
    # by the polygon family with the rectangles passed as centered
    # 4-gons. The obstacle noise models coincide exactly for a centered
    # box (rotate-about-origin == rotate-about-center), both families
    # decide translation samples exactly and rotating samples by CA on
    # the same (mathematically equal) signed distance, so two
    # independent-key fixed-budget estimates must agree to MC noise.
    from collide2d_tpu.mc.moving import moving_configs

    C, n = 48, 8192
    pos = rng.uniform(-4, 4, (C, 2)).astype(np.float32)
    th = rng.uniform(0, 7, C).astype(np.float32)
    wh = rng.uniform(0.5, 3.0, (C, 2)).astype(np.float32)
    sd3 = rng.uniform(0, 0.3, (C, 3)).astype(np.float32)
    sd5 = np.concatenate([sd3, np.zeros((C, 2), np.float32)], axis=1)
    vel = rng.uniform(-1.5, 1.5, (C, 2)).astype(np.float32)
    omega = rng.uniform(-0.8, 0.8, C).astype(np.float32)
    omega[: C // 3] = 0.0  # a translation-only (exact-exact) stripe
    t_max = rng.uniform(0.5, 2.5, C).astype(np.float32)

    hw, hh = wh[:, 0] / 2, wh[:, 1] / 2
    corners = np.stack([
        np.stack([-hw, -hh], -1), np.stack([hw, -hh], -1),
        np.stack([hw, hh], -1), np.stack([-hw, hh], -1),
    ], axis=1).astype(np.float32)  # (C, 4, 2) CCW, create_rect layout

    rect = moving_configs(pos, th, wh, sd5, vel, omega, t_max)
    poly = moving_polygon_configs(pos, th, corners, sd3, vel, omega, t_max)
    a = np.array(trajectory_collision_probability(
        jax.random.PRNGKey(101), rect, jnp.asarray([4.07, 1.74]), n,
        ca_iters=64))
    b = np.array(trajectory_collision_probability(
        jax.random.PRNGKey(202), poly, ROBOT, n, ca_iters=64))
    pbar = np.clip((a + b) / 2, 1e-6, 1 - 1e-6)
    z = np.abs(a - b) / np.sqrt(pbar * (1 - pbar) * 2 / n)
    assert z.max() < 6.0, (z.max(), np.abs(a - b).max())
    assert np.abs(a - b).mean() < 0.01
    assert (a > 0).any() and (a < 1).any()  # the workload is non-trivial


def test_adaptive_driver_prune_and_guard(rng):
    _, moving = _static_and_moving(rng, 48, v=(0.6, -0.4), w=0.3,
                                   t_max=2.0)
    key = jax.random.PRNGKey(9)
    cfg = AdaptiveConfig(max_samples=8_000,
                         bin_accuracy=(0.05, 0.05, 0.05), ca_iters=16)
    cp, n_used, done = adaptive_collision_probabilities(
        key, moving, ROBOT, cfg)
    assert done.all() and ((0 <= cp) & (cp <= 1)).all()
    # fixed-budget estimate agrees within CI noise
    ref = np.array(trajectory_collision_probability(
        jax.random.PRNGKey(77), moving, ROBOT, 4_000, ca_iters=16))
    se = np.sqrt(np.maximum(ref * (1 - ref), 1e-9) / 4_000)
    assert (np.abs(cp - ref) <= 4 * se + 5e-2).all()

    # noise-aware prune stays conservative for moving k-gons (velocity
    # reach + vertex-norm radii): pruned rows must be true zeros
    cfg_p = AdaptiveConfig(max_samples=8_000,
                           bin_accuracy=(0.05, 0.05, 0.05), ca_iters=16,
                           prune_sigma=6.0)
    cp_p, _, done_p = adaptive_collision_probabilities(
        key, moving, ROBOT, cfg_p)
    assert done_p.all()
    np.testing.assert_allclose(cp_p[cp > 0.05], cp[cp > 0.05])
    assert (cp[cp_p == 0] <= 1e-3).all()

    # explicit pallas is a user error, surfaced loudly
    with pytest.raises(ValueError, match="pallas"):
        mc_round(key, jnp.arange(16, dtype=jnp.int32), moving, ROBOT,
                 jnp.int32(0), n_batch=512, impl="pallas")
    with pytest.raises(ValueError, match="pallas"):
        adaptive_collision_probabilities(
            key, moving, ROBOT, AdaptiveConfig(impl="pallas"))


def test_config_dp_sharding_bitwise(rng):
    from tests.conftest import cpu_devices

    from collide2d_tpu.parallel import make_mesh

    _, moving = _static_and_moving(rng, 32, v=(0.5, 0.2), w=0.25)
    key = jax.random.PRNGKey(5)
    cfg = AdaptiveConfig(max_samples=8_000,
                         bin_accuracy=(0.05, 0.05, 0.05), ca_iters=16)
    plain = adaptive_collision_probabilities(key, moving, ROBOT, cfg)
    mesh = make_mesh(cpu_devices()[:4])
    sharded = adaptive_collision_probabilities(
        key, moving, ROBOT, cfg, mesh=mesh)
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_model_surface(rng):
    from collide2d_tpu.models.collision_model import (
        PolygonCollisionProbabilityModel,
    )

    model = PolygonCollisionProbabilityModel(ROBOT)
    _, moving = _static_and_moving(rng, 16, v=(0.4, 0.1), w=0.2)
    key = jax.random.PRNGKey(2)
    cp = np.array(model.trajectory_probability(key, moving, 1024,
                                               ca_iters=16))
    assert cp.shape == (16,) and ((0 <= cp) & (cp <= 1)).all()
    cp2, n2, done2 = model.label(
        key, moving,
        AdaptiveConfig(max_samples=8_000, ca_iters=16,
                       bin_accuracy=(0.05, 0.05, 0.05)))
    assert done2.all() and ((0 <= cp2) & (cp2 <= 1)).all()


def test_movelabel_cli_polygon_roundtrip(tmp_path, rng):
    # End-to-end CLI with a polygon npz. Zero-noise rows are
    # deterministic: cp must equal the exact translation-window hit
    # (ops.toi.polygon_time_of_impact) EXACTLY.
    from collide2d_tpu.cli import main
    from collide2d_tpu.ops.geometry import transform_vertices
    from collide2d_tpu.ops.toi import polygon_time_of_impact

    C = 32
    pos = rng.uniform(-4, 4, (C, 2)).astype(np.float32)
    th = rng.uniform(0, 7, C).astype(np.float32)
    verts = _ellipse_polys(rng, C)
    sd = rng.uniform(0, 0.2, (C, 3)).astype(np.float32)
    sd[: C // 2] = 0.0  # deterministic half
    vel = rng.uniform(-2, 2, (C, 2)).astype(np.float32)
    t_max = rng.uniform(0.5, 3, C).astype(np.float32)
    inp, outp = tmp_path / "movingp.npz", tmp_path / "labels.npz"
    np.savez(inp, position=pos, pose_theta=th, obstacle_verts=verts,
             std_dev=sd, velocity=vel, t_max=t_max,
             robot_verts=np.array(ROBOT))
    rc = main([
        "movelabel", "--data_in", str(inp), "--data_out", str(outp),
        "--max_samples", "4000",
        "--accuracy_bins", "0.0", "0.1", "1.0",
        "--bin_accuracy", "0.02", "0.05",
        "--seed", "7",
    ])
    assert rc == 0
    out = np.load(outp)
    assert out["cp"].shape == (C,) and out["converged"].all()
    robot0 = transform_vertices(ROBOT[None], pos[:, 0], pos[:, 1], th)
    toi = np.array(polygon_time_of_impact(
        robot0, jnp.asarray(verts), -vel * t_max[:, None], t_max=1.0))
    det = np.isfinite(toi).astype(np.float32)
    np.testing.assert_array_equal(out["cp"][: C // 2], det[: C // 2])

    # missing robot_verts is a loud error
    np.savez(tmp_path / "bad.npz", position=pos, pose_theta=th,
             obstacle_verts=verts, std_dev=sd, velocity=vel)
    with pytest.raises(SystemExit, match="robot_verts"):
        main(["movelabel", "--data_in", str(tmp_path / "bad.npz"),
              "--data_out", str(outp)])


def test_polygon_screened_counts_strictly_refine_the_pure_ca_loop(rng):
    """k-gon analogue of the rectangle cascade contract (round 4):
    screened rotating counts are a per-config superset of the pure
    advancement loop's, with most lanes certified closed-form."""
    from collide2d_tpu.mc.moving import (
        counts_chunk_moving_polygons,
        moving_polygon_configs,
    )

    n, s, k = 192, 48, 6
    ang = np.sort(rng.uniform(0, 2 * np.pi, (n, k)), axis=-1)
    ab = rng.uniform(0.5, 3.0, (n, 1, 2))
    verts = (np.stack([np.cos(ang), np.sin(ang)], -1) * ab).astype(
        np.float32)
    cfgs = moving_polygon_configs(
        rng.uniform(-6, 6, (n, 2)).astype(np.float32),
        rng.uniform(0, 2 * np.pi, n).astype(np.float32),
        verts,
        rng.uniform(0, 0.3, (n, 3)).astype(np.float32),
        rng.uniform(-2, 2, (n, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, n).astype(np.float32),
        rng.uniform(0.5, 3, n).astype(np.float32),
    )
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    pure = np.array(counts_chunk_moving_polygons(
        keys, cfgs, robot, s, ca_screen=False))
    screened, (maybe, hitc, amb) = counts_chunk_moving_polygons(
        keys, cfgs, robot, s, return_screen_masks=True)
    screened = np.array(screened)
    assert (screened >= pure).all()
    assert screened.sum() > 0
    assert float(np.array(amb).mean()) < 0.2
