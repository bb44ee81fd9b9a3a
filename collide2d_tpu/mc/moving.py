"""Trajectory collision probability — MC over MOVING robots.

Beyond the reference's static labels (its kernel freezes the robot at
one pose per configuration, generate_dataset.cu:199-236): a planner
validating an edge needs P(the MOTION collides), i.e. the probability
that a robot translating/rotating through ``t in [0, t_max]`` hits the
noisy obstacle at ANY time along the way. `MovingConfigs` extends the
dataset configuration with that rigid motion; the per-sample predicate
swaps the static OBB SAT for a conservative-advancement time-of-impact
query (the `ops.toi` contract) evaluated on the closed-form OBB signed
distance.

Design notes (all load-bearing for tests):

- The NOISE MODEL is exactly the dataset's (5 sigmas on the obstacle,
  `sample_rectangle` semantics, utils.cu:144-157): per sample the
  obstacle is an oriented box with center (dx, dy), extents
  wh + (dw, dh), angle dtheta — STATIC during the motion. Only the
  robot moves.
- The distance inside the advancement loop is
  `ops.distance_pallas.obb_signed_distance_tile` (plain jnp math, also
  usable outside Pallas), whose overlap-side sign is BITWISE equal to
  `sat.obb_collide`'s label. With ``velocity = omega = 0`` and
  ``tol = 0`` the advancement freezes at t = 0 and the predicate
  degenerates to the static collision test — so on identical draws the
  counts equal the static jnp path's counts bit for bit (pinned by
  tests/test_moving.py).
- NON-ROTATING samples (omega == 0) are decided EXACTLY: under pure
  translation the per-SAT-axis colliding-time set is a linear window
  and the hit test is a closed-form interval intersection
  (`ops.toi.obb_translation_toi_parts`) — no iteration, no tolerance
  band. The adaptive driver detects translation-only batches with one
  readback and compiles the advancement loop out entirely
  (effective ``ca_iters = 0``).
- ROTATING samples use conservative advancement with the certified-hit
  contract (`ops.toi`): a sample counts as a collision only when the
  advancement certifies contact (d(t) <= tol within the horizon).
  Grazing trajectories that ``ca_iters`` steps cannot certify are
  counted as misses — what this estimator guarantees is a LOWER bound
  that converges to the true probability as ``ca_iters`` grows (the
  uncertified measure concentrates near tangential contact; measured
  on random rotating workloads the 48 -> 512 iteration shift is < 0.02
  for ~99% of configurations with a tail of slow-graze motions — raise
  ``ca_iters`` via AdaptiveConfig when the tail matters).
- Per-config ``t_max`` folds into the motion (v*t_max, omega*t_max on a
  unit horizon), so one compiled program serves every horizon.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.distance_pallas import obb_signed_distance_tile
from collide2d_tpu.ops.toi import _advance, obb_translation_toi_parts

CA_ITERS = 48   # default advancement budget per sample
# Default contact tolerance. MUST be positive for moving samples:
# conservative advancement approaches a transversal contact root from
# below and never crosses it, so with tol = 0 certification would
# depend on f32 rounding luck (observed: non-monotone counts across
# horizons). tol = 0 remains meaningful ONLY at zero motion, where the
# predicate degenerates to the static sign test d(0) <= 0 — that is the
# bitwise-parity configuration pinned by tests.
CA_TOL = 1e-4


class MovingConfigs(NamedTuple):
    """A batch of C trajectory-validation configurations.

    The first four fields are exactly `estimator.Configs` (so the
    adaptive driver's compaction/sharding/checkpointing treat this type
    generically); the motion fields extend each row:

    position:    (C, 2) robot center at t=0, obstacle frame
    pose_theta:  (C,)   robot orientation at t=0
    obstacle_wh: (C, 2) obstacle width/height (obstacle sits at origin)
    std_dev:     (C, 5) noise sigmas (x, y, theta, width, height)
    velocity:    (C, 2) robot center velocity (units / unit time)
    omega:       (C,)   robot angular rate about its center (rad / time)
    t_max:       (C,)   motion horizon per configuration
    """

    position: Array
    pose_theta: Array
    obstacle_wh: Array
    std_dev: Array
    velocity: Array
    omega: Array
    t_max: Array

    @property
    def num(self) -> int:
        return self.position.shape[0]


def moving_configs(
    position, pose_theta, obstacle_wh, std_dev, velocity,
    omega=0.0, t_max=1.0,
) -> MovingConfigs:
    """Broadcasting constructor: scalars/row vectors expand to (C, ...)."""
    position = jnp.asarray(position, jnp.float32)
    c = position.shape[0]
    return MovingConfigs(
        position=position,
        pose_theta=jnp.broadcast_to(
            jnp.asarray(pose_theta, jnp.float32), (c,)),
        obstacle_wh=jnp.broadcast_to(
            jnp.asarray(obstacle_wh, jnp.float32), (c, 2)),
        std_dev=jnp.broadcast_to(jnp.asarray(std_dev, jnp.float32), (c, 5)),
        velocity=jnp.broadcast_to(
            jnp.asarray(velocity, jnp.float32), (c, 2)),
        omega=jnp.broadcast_to(jnp.asarray(omega, jnp.float32), (c,)),
        t_max=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (c,)),
    )


def counts_chunk_moving(
    keys: Array, configs: MovingConfigs, robot_wh: Array, n_lanes: int,
    *, ca_iters: int = CA_ITERS, tol: float = CA_TOL,
) -> Array:
    """Motion-collision count over ``n_lanes`` samples per configuration.

    Drop-in for `estimator._counts_chunk`'s rectangle path: SAME key
    schedule, SAME (n_lanes, 5) normal draws in the same order (so a
    zero-motion batch reproduces the static counts bitwise), then one
    conservative-advancement TOI per sample instead of one static SAT.
    """
    z = jax.vmap(lambda k: jax.random.normal(k, (n_lanes, 5), jnp.float32))(
        keys
    )
    d = z * configs.std_dev[:, None, :]  # (C, S, 5)

    rw = jnp.broadcast_to(
        jnp.asarray(robot_wh, jnp.float32), configs.position.shape)
    hx1 = jnp.abs(rw[:, 0:1]) * 0.5  # (C, 1) — broadcasts over samples
    hy1 = jnp.abs(rw[:, 1:2]) * 0.5

    # Noisy obstacle (static during the motion): same expressions as the
    # static chunk's obb_collide call, estimator._counts_chunk.
    ext2 = configs.obstacle_wh[:, None, :] + d[..., 3:5]
    hx2 = jnp.abs(ext2[..., 0]) * 0.5
    hy2 = jnp.abs(ext2[..., 1]) * 0.5
    c2_, s2_ = jnp.cos(d[..., 2]), jnp.sin(d[..., 2])
    ox, oy = d[..., 0], d[..., 1]  # (C, S)

    # Motion with the horizon folded to 1 (one program per shape, every
    # per-config t_max served).
    v_eff = configs.velocity * configs.t_max[:, None]  # (C, 2)
    w_eff = configs.omega * configs.t_max  # (C,)
    r_rob = 0.5 * jnp.hypot(rw[:, 0], rw[:, 1])
    bound = jnp.hypot(v_eff[:, 0], v_eff[:, 1]) + jnp.abs(w_eff) * r_rob
    # += 0*ox (not broadcast_to): under shard_map the advancement carry
    # is seeded from `bound` and must share the DRAWS' varying mesh axes
    # (config AND sample), or the fori_loop carry types mismatch.
    bound = bound[:, None] + 0.0 * ox

    px, py = configs.position[:, 0:1], configs.position[:, 1:2]
    vx, vy = v_eff[:, 0:1], v_eff[:, 1:2]
    th0 = configs.pose_theta[:, None]
    w = w_eff[:, None]

    # Non-rotating lanes resolve EXACTLY (first-contact window over the
    # 4 SAT axes — no iteration, no tolerance band; ops.toi). At zero
    # motion every axis window degenerates to the static gap test, so
    # the v = w = 0 bitwise-parity contract rides this path.
    c1_, s1_ = jnp.cos(th0), jnp.sin(th0)
    entry, exit_ = obb_translation_toi_parts(
        ox - px, oy - py, c1_, s1_, hx1, hy1, c2_, s2_, hx2, hy2,
        -vx, -vy,  # obstacle velocity relative to the robot
    )
    hit_exact = (entry <= exit_) & (entry <= 1.0) & (exit_ >= 0)

    rotating = w != 0  # (C, 1)
    if ca_iters > 0:
        def dist_of_t(t):  # (C, S) -> (C, S)
            a1 = th0 + t * w
            dx = ox - (px + t * vx)  # obstacle minus robot: c2 - c1
            dy = oy - (py + t * vy)
            return obb_signed_distance_tile(
                dx, dy, jnp.cos(a1), jnp.sin(a1), hx1, hy1,
                c2_, s2_, hx2, hy2,
            )

        toi = _advance(dist_of_t, bound, 1.0, ca_iters, tol)
        hit = jnp.where(rotating, jnp.isfinite(toi), hit_exact)
    else:
        # ca_iters == 0: the caller asserts the batch is translation-
        # only (the adaptive driver auto-detects this) — skip the CA
        # trace entirely.
        hit = hit_exact
    return jnp.sum(hit, axis=-1, dtype=jnp.int32)


def trajectory_collision_probability(
    key: Array, configs, robot, n_samples: int,
    *, step_samples: int = 0, ca_iters: int = CA_ITERS, tol: float = CA_TOL,
) -> Array:
    """Fixed-budget MC estimate of P(the motion collides). float32 (C,).

    The moving-robot analogue of `estimator.collision_probability`
    (identical uid-keyed threefry streams; adaptive-precision labeling
    goes through `adaptive_collision_probabilities`, which accepts
    trajectory batches directly). ``configs``: `MovingConfigs` (``robot``
    = (2,) width/height) or `MovingPolygonConfigs` (``robot`` = (K2, 2)
    CCW vertices in the robot frame).
    """
    from collide2d_tpu.mc import estimator

    return estimator.collision_probability(
        key, configs, robot, n_samples,
        step_samples=step_samples, impl="jnp",
        ca_iters=ca_iters, ca_tol=tol,
    )


class MovingPolygonConfigs(NamedTuple):
    """A batch of C trajectory configurations with convex-k-gon shapes —
    the {moving} x {polygon} corner of the label matrix (the reference
    covers only {static} x {rectangle}; see `MovingConfigs` and
    `estimator.PolygonConfigs` for the other two extensions this one
    composes).

    Noise model = `PolygonConfigs`' (POSE noise (x, y, theta) on the
    obstacle, std_dev (C, 3) — additive width/height noise has no k-gon
    analogue); motion model = `MovingConfigs`' (the robot k-gon
    translates at ``velocity`` and rotates at ``omega`` about its own
    origin through ``t in [0, t_max]``; the noisy obstacle is static
    during the motion). The robot is passed where rectangle calls pass
    ``robot_wh``: a (K2, 2) CCW vertex array in the robot frame.

    position:       (C, 2)    robot origin at t=0, obstacle frame
    pose_theta:     (C,)      robot orientation at t=0
    obstacle_verts: (C, K, 2) CCW convex vertices, obstacle frame
                              (fixed-K; repeat-pad like PolygonConfigs)
    std_dev:        (C, 3)    noise sigmas (x, y, theta)
    velocity:       (C, 2)    robot origin velocity (units / unit time)
    omega:          (C,)      robot angular rate about its origin
    t_max:          (C,)      motion horizon per configuration

    Per-sample predicate (`counts_chunk_moving_polygons`): non-rotating
    samples resolve through the EXACT translation window over the true
    edge normals (`ops.toi.polygon_translation_toi_parts`); rotating
    samples run certified conservative advancement on
    `ops.distance.polygon_signed_distance`. 'auto' resolves to the jnp
    path; explicit impl='pallas' opts translation-only batches into the
    fused window kernel (`ops.mc_moving_polygon_pallas`) and raises on
    rotating rows. Either way every rectangle-
    path guarantee holds: uid-keyed streams, compaction invariance,
    bitwise config-DP, pruning, checkpointing.
    """

    position: Array
    pose_theta: Array
    obstacle_verts: Array
    std_dev: Array
    velocity: Array
    omega: Array
    t_max: Array

    @property
    def num(self) -> int:
        return self.position.shape[0]


def moving_polygon_configs(
    position, pose_theta, obstacle_verts, std_dev, velocity,
    omega=0.0, t_max=1.0,
) -> MovingPolygonConfigs:
    """Broadcasting constructor: scalars/row vectors expand to (C, ...)."""
    position = jnp.asarray(position, jnp.float32)
    obstacle_verts = jnp.asarray(obstacle_verts, jnp.float32)
    c = position.shape[0]
    if obstacle_verts.ndim != 3 or obstacle_verts.shape[0] != c:
        raise ValueError(
            "moving_polygon_configs: obstacle_verts must be (C, K, 2) "
            f"with C={c}, got {obstacle_verts.shape}"
        )
    return MovingPolygonConfigs(
        position=position,
        pose_theta=jnp.broadcast_to(
            jnp.asarray(pose_theta, jnp.float32), (c,)),
        obstacle_verts=obstacle_verts,
        std_dev=jnp.broadcast_to(jnp.asarray(std_dev, jnp.float32), (c, 3)),
        velocity=jnp.broadcast_to(
            jnp.asarray(velocity, jnp.float32), (c, 2)),
        omega=jnp.broadcast_to(jnp.asarray(omega, jnp.float32), (c,)),
        t_max=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (c,)),
    )


def counts_chunk_moving_polygons(
    keys: Array, configs: MovingPolygonConfigs, robot_verts: Array,
    n_lanes: int, *, ca_iters: int = CA_ITERS, tol: float = CA_TOL,
) -> Array:
    """Motion-collision count over ``n_lanes`` samples per configuration
    for k-gon pairs. Drop-in for `estimator._counts_chunk_polygons`:
    SAME key schedule, SAME (n_lanes, 3) normal draws in the same order
    (so a zero-motion batch reproduces the static polygon counts bit for
    bit), then one continuous-collision test per sample instead of one
    static SAT.
    """
    from collide2d_tpu.ops.distance import polygon_signed_distance
    from collide2d_tpu.ops.geometry import transform_vertices
    from collide2d_tpu.ops.toi import polygon_translation_toi_parts

    z = jax.vmap(lambda k: jax.random.normal(k, (n_lanes, 3), jnp.float32))(
        keys
    )
    d = z * configs.std_dev[:, None, :]  # (C, S, 3)

    # Noisy obstacle (static during the motion) and the robot at t=0 —
    # the exact expressions of _counts_chunk_polygons (rotate about the
    # origin by the theta draw, then translate; utils.cu:132-142 order).
    rv = jnp.asarray(robot_verts, jnp.float32)
    robot0 = transform_vertices(
        rv[None], configs.position[:, 0], configs.position[:, 1],
        configs.pose_theta,
    )[:, None]  # (C, 1, K2, 2)
    obstacle = transform_vertices(
        configs.obstacle_verts[:, None], d[..., 0], d[..., 1], d[..., 2]
    )  # (C, S, K, 2)
    s_ = obstacle.shape[1]
    robot0_b = jnp.broadcast_to(
        robot0, robot0.shape[:1] + (s_,) + robot0.shape[2:]
    )

    # Motion with the horizon folded to 1 (`MovingConfigs` convention).
    v_eff = configs.velocity * configs.t_max[:, None]  # (C, 2)
    w_eff = configs.omega * configs.t_max  # (C,)

    # Non-rotating lanes: EXACT first-contact window over the true edge
    # normals of both k-gons (the Minkowski-sum normals — SAT is exact
    # at every t). At zero motion each axis window degenerates to the
    # static sat_polygons interval test on the same separately-rounded
    # projections: bitwise zero-motion parity.
    v_obs = jnp.broadcast_to(
        -v_eff[:, None, :], obstacle.shape[:2] + (2,)
    )  # obstacle velocity relative to the robot
    entry, exit_ = polygon_translation_toi_parts(robot0_b, obstacle, v_obs)
    hit_exact = (entry <= exit_) & (entry <= 1.0) & (exit_ >= 0)

    rotating = (w_eff != 0)[:, None]  # (C, 1)
    if ca_iters > 0:
        # Rotating lanes: conservative advancement on the exact convex
        # signed distance. Boundary-speed bound: |v| + |omega| * R with
        # R the robot's circumscribed radius about its rotation center
        # (the frame origin).
        r_rob = jnp.max(jnp.hypot(rv[..., 0], rv[..., 1]))
        bound = jnp.hypot(v_eff[:, 0], v_eff[:, 1]) + jnp.abs(w_eff) * r_rob
        # += 0*draws (NOT 0*entry: the window's entry is +-inf on
        # zero-velocity axes and 0*inf = NaN): under shard_map the
        # advancement carry must share the draws' varying mesh axes.
        bound = (jnp.maximum(bound, jnp.float32(1e-30))[:, None]
                 + 0.0 * d[..., 0])

        px = configs.position[:, 0:1]
        py = configs.position[:, 1:2]
        th0 = configs.pose_theta[:, None]
        w = w_eff[:, None]
        vx, vy = v_eff[:, 0:1], v_eff[:, 1:2]

        def dist_of_t(t):  # (C, S) -> (C, S)
            robot_t = transform_vertices(
                rv[None, None], px + t * vx, py + t * vy, th0 + t * w
            )  # (C, S, K2, 2)
            return polygon_signed_distance(robot_t, obstacle)

        toi = _advance(dist_of_t, bound, 1.0, ca_iters, tol)
        hit = jnp.where(rotating, jnp.isfinite(toi), hit_exact)
    else:
        # ca_iters == 0: the caller asserts the batch is translation-
        # only (the adaptive driver auto-detects this).
        hit = hit_exact
    return jnp.sum(hit, axis=-1, dtype=jnp.int32)
