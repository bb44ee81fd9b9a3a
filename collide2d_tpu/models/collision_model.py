"""The flagship model: batched collision-probability estimation.

Wraps the ops/mc layers into one object with jittable forward steps —
the user-facing surface equivalent to "one launch" of the reference's
monte_carlo_sample_collision_dataset_uniform kernel
(generate_dataset.cu:175-253) plus its deterministic SAT primitive.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.mc.estimator import (
    AdaptiveConfig,
    Configs,
    PolygonConfigs,
    adaptive_collision_probabilities,
    collision_probability,
    collision_probability_pruned,
)
from collide2d_tpu.ops.broad_phase import candidate_mask, collide_polygons_pruned
from collide2d_tpu.ops.sat import sat_rects, sat_polygons
from collide2d_tpu.ops.geometry import rects_from_params, transform_vertices


class CollisionProbabilityModel:
    """Collision labels + probabilities for a rectangular robot.

    Parameters mirror the reference CLI's robot knobs
    (generate_dataset.cu:60-61): ``robot_wh`` defaults to the reference's
    4.07 x 1.74 vehicle.
    """

    def __init__(self, robot_wh: Sequence[float] = (4.07, 1.74)):
        self.robot_wh = jnp.asarray(robot_wh, jnp.float32)

    # ---- deterministic narrow phase -------------------------------------
    def collide(
        self, position: Array, pose_theta: Array, obstacle_wh: Array,
        *, precision: str = "f32", impl: str = "auto", method: str = "vertex",
    ) -> Array:
        """Deterministic SAT label for robot-at-(position, theta) vs an
        axis-aligned obstacle at the origin. int32 (C,).

        ``precision='bf16'`` rounds VERTEX COORDINATES to bfloat16 before
        the test (the arithmetic itself stays float32): labels for pairs
        within ~0.4% relative of touching can differ from the f32 path —
        coarse labeling only, never bit-parity work. On TPU this halves
        the SAT kernel's HBM traffic (measured +14% pairs/s and half the
        footprint, ops.sat_pallas.pack_rects_bf16); elsewhere the same
        rounded labels come from the XLA path, so results are
        platform-independent. ``impl``: 'auto' = Pallas kernel on TPU,
        XLA elsewhere; 'jnp' forces the XLA path.

        ``method='obb'`` skips vertex materialization: the closed-form
        oriented-box test straight on the parameters (+30% pairs/s at
        2.7x less HBM traffic on TPU, `ops.sat_pallas.obb_collide_pallas`;
        `ops.sat.obb_collide` off-TPU). Labels equal the vertex path
        everywhere except measure-zero exactly-touching roundings (the
        obb_collide contract); f32 only.
        """
        if precision not in ("f32", "bf16"):
            raise ValueError(f"precision must be 'f32' or 'bf16', got "
                             f"{precision!r}")
        if method not in ("vertex", "obb"):
            raise ValueError(f"method must be 'vertex' or 'obb', got "
                             f"{method!r}")
        from collide2d_tpu.mc.estimator import resolve_impl

        if method == "obb":
            if precision != "f32":
                raise ValueError("method='obb' supports precision='f32' "
                                 "only (the bf16 contract is about vertex "
                                 "coordinate rounding)")
            c1 = jnp.asarray(position, jnp.float32)
            ext1 = jnp.broadcast_to(self.robot_wh, c1.shape)
            th1 = jnp.broadcast_to(
                jnp.asarray(pose_theta, jnp.float32), c1.shape[:-1]
            )
            c2 = jnp.zeros_like(c1)
            ext2 = jnp.broadcast_to(
                jnp.asarray(obstacle_wh, jnp.float32), c1.shape
            )
            th2 = jnp.zeros_like(th1)
            if resolve_impl(impl, c1) == "pallas":
                from collide2d_tpu.ops.sat_pallas import obb_collide_pallas

                return obb_collide_pallas(c1, ext1, th1, c2, ext2, th2)
            from collide2d_tpu.ops.sat import obb_collide

            return obb_collide(c1, ext1, th1, c2, ext2, th2)

        robot = rects_from_params(
            position, jnp.broadcast_to(self.robot_wh, position.shape), pose_theta
        )
        obstacle = rects_from_params(
            jnp.zeros_like(position), obstacle_wh, jnp.zeros_like(pose_theta)
        )
        if resolve_impl(impl, robot) == "pallas":
            from collide2d_tpu.ops.sat_pallas import sat_rects_pallas

            return sat_rects_pallas(robot, obstacle, precision=precision)
        if precision == "bf16":
            robot = robot.astype(jnp.bfloat16).astype(jnp.float32)
            obstacle = obstacle.astype(jnp.bfloat16).astype(jnp.float32)
        return sat_rects(robot, obstacle)

    def distance(self, position: Array, pose_theta: Array,
                 obstacle_wh: Array, *, impl: str = "jnp") -> Array:
        """Signed distance for the same scene as `collide`: robot at
        (position, pose_theta) vs an axis-aligned obstacle at the origin.
        float32 (C,): positive = clearance, negative = -(penetration
        depth), zero = touching (`ops.distance.polygon_signed_distance`).
        Differentiable — `jax.grad` through position gives the contact
        normal, the quantity gradient-based planners consume. Beyond the
        reference's boolean `convex_collide` (utils.cu:159-184).

        ``impl``: 'jnp' (default — differentiable XLA path), 'pallas'
        (the fused `ops.distance_pallas` kernel, ~25x the throughput on
        TPU; values agree to f32 rounding, sign agrees bitwise with
        `collide(method='obb')`), or 'auto' (pallas on TPU data)."""
        from collide2d_tpu.mc.estimator import resolve_impl
        from collide2d_tpu.ops.distance import rect_signed_distance

        position = jnp.asarray(position, jnp.float32)
        pose_theta = jnp.broadcast_to(
            jnp.asarray(pose_theta, jnp.float32), position.shape[:-1]
        )
        if resolve_impl(impl, position) == "pallas":
            from collide2d_tpu.ops.distance_pallas import rect_distance_pallas

            return rect_distance_pallas(
                position, jnp.broadcast_to(self.robot_wh, position.shape),
                pose_theta, jnp.zeros_like(position),
                jnp.broadcast_to(jnp.asarray(obstacle_wh, jnp.float32),
                                 position.shape),
                jnp.zeros_like(pose_theta),
            )
        return rect_signed_distance(
            position, jnp.broadcast_to(self.robot_wh, position.shape),
            pose_theta, jnp.zeros_like(position),
            jnp.broadcast_to(jnp.asarray(obstacle_wh, jnp.float32),
                             position.shape),
            jnp.zeros_like(pose_theta),
        )

    def closest_points(self, position: Array, pose_theta: Array,
                       obstacle_wh: Array):
        """Witness points + contact normal for the `distance` scene.

        Returns ``(dist, pa, pb, normal)`` — ``pa`` on the robot, ``pb``
        on the obstacle, ``pb - pa = dist * normal``; translating the
        obstacle by ``-dist * normal`` brings the pair into touching
        contact (`ops.distance.polygon_closest_points`). The witness
        gathers are piecewise-constant — differentiate `distance` for
        smooth normals."""
        from collide2d_tpu.ops.distance import rect_closest_points

        position = jnp.asarray(position, jnp.float32)
        pose_theta = jnp.broadcast_to(
            jnp.asarray(pose_theta, jnp.float32), position.shape[:-1]
        )
        return rect_closest_points(
            position, jnp.broadcast_to(self.robot_wh, position.shape),
            pose_theta, jnp.zeros_like(position),
            jnp.broadcast_to(jnp.asarray(obstacle_wh, jnp.float32),
                             position.shape),
            jnp.zeros_like(pose_theta),
        )

    def contact_manifold(self, position: Array, pose_theta: Array,
                         obstacle_wh: Array, *, margin: float = 0.0,
                         impl: str = "auto"):
        """Contact manifold for the `distance` scene: up to two contact
        points with per-point depths and a shared normal (robot =
        body 1, obstacle = body 2; reference/incident face clip —
        `ops.manifold.polygon_contact_manifold` contract). ``margin > 0``
        keeps speculative near-contacts.

        ``impl``: 'jnp' (XLA path), 'pallas' (the fused
        `ops.manifold_pallas` kernel — ~150x on TPU; values to f32
        rounding, face choice at exact separation ties may differ), or
        'auto' (pallas on TPU data)."""
        from collide2d_tpu.mc.estimator import resolve_impl
        from collide2d_tpu.ops.geometry import rects_from_params
        from collide2d_tpu.ops.manifold import rect_contact_manifold

        position = jnp.asarray(position, jnp.float32)
        pose_theta = jnp.broadcast_to(
            jnp.asarray(pose_theta, jnp.float32), position.shape[:-1]
        )
        if resolve_impl(impl, position) == "pallas":
            from collide2d_tpu.ops.manifold_pallas import (
                polygon_manifold_pallas,
            )

            r1 = rects_from_params(
                position, jnp.broadcast_to(self.robot_wh, position.shape),
                pose_theta,
            )
            r2 = rects_from_params(
                jnp.zeros_like(position),
                jnp.broadcast_to(jnp.abs(jnp.asarray(obstacle_wh,
                                                     jnp.float32)),
                                 position.shape),
                jnp.zeros_like(pose_theta),
            )
            return polygon_manifold_pallas(r1, r2, margin=margin)
        return rect_contact_manifold(
            position, jnp.broadcast_to(self.robot_wh, position.shape),
            pose_theta, jnp.zeros_like(position),
            jnp.broadcast_to(jnp.asarray(obstacle_wh, jnp.float32),
                             position.shape),
            jnp.zeros_like(pose_theta), margin=margin,
        )

    def time_of_impact(self, position: Array, pose_theta: Array,
                       obstacle_wh: Array, velocity: Array, omega=0.0,
                       *, t_max: float = 1.0, iters: int = 64,
                       tol: float = 1e-4, impl: str = "jnp") -> Array:
        """Earliest time the moving robot hits the static obstacle at
        the origin: robot starts at (position, pose_theta) and moves
        rigidly with ``velocity`` (B+(2,)) and angular rate ``omega``
        about its center. Returns t in [0, t_max] (certified impact,
        d(t) <= tol) or +inf (`ops.toi.rect_time_of_impact` contract —
        conservative advancement over the signed distance).

        ``impl``: 'jnp' (default), 'pallas' (the fused
        `ops.toi_pallas.rect_toi_pallas` advancement kernel), or 'auto'
        (pallas on TPU data)."""
        from collide2d_tpu.mc.estimator import resolve_impl

        position = jnp.asarray(position, jnp.float32)
        pose_theta = jnp.broadcast_to(
            jnp.asarray(pose_theta, jnp.float32), position.shape[:-1]
        )
        args = (
            position, jnp.broadcast_to(self.robot_wh, position.shape),
            pose_theta, velocity, omega,
            jnp.zeros_like(position),
            jnp.broadcast_to(jnp.asarray(obstacle_wh, jnp.float32),
                             position.shape),
            jnp.zeros_like(pose_theta), jnp.zeros_like(position), 0.0,
        )
        if resolve_impl(impl, position) == "pallas":
            from collide2d_tpu.ops.toi_pallas import rect_toi_pallas

            return rect_toi_pallas(*args, t_max=t_max, iters=iters, tol=tol)
        from collide2d_tpu.ops.toi import rect_time_of_impact

        return rect_time_of_impact(*args, t_max=t_max, iters=iters, tol=tol)

    def collide_polygons(
        self, p1, p2, mask1=None, mask2=None, *, broad_phase=False,
        precision: str = "f32",
    ):
        """Convex k-gon pairs (BASELINE.json config #4). int32 (C,).

        ``broad_phase``:
          - False (default): plain narrow-phase SAT on every pair.
          - "prune": the compaction path — AABB broad phase gathers
            candidates into a power-of-two bucket, narrow phase runs on
            the bucket only, labels scatter back (ops.broad_phase.
            collide_polygons_pruned; bit-identical output, wall-clock win
            at sparse candidate density, one host sync). Not jittable as
            a whole — call from host orchestration code.
          - True: ANDs in the candidate mask — an independent
            necessary-condition cross-check, not a speedup (the narrow
            phase still runs on every pair under fixed shapes).

        ``precision='bf16'`` (plain narrow phase only) rounds vertex
        coordinates to bfloat16 before the float32 test — the coarse-
        labeling contract of `CollisionProbabilityModel.collide`.
        """
        if precision not in ("f32", "bf16"):
            raise ValueError(f"precision must be 'f32' or 'bf16', got "
                             f"{precision!r}")
        if precision == "bf16":
            if broad_phase:
                raise ValueError(
                    "precision='bf16' composes only with the plain narrow "
                    "phase (broad_phase=False)"
                )
            p1 = jnp.asarray(p1).astype(jnp.bfloat16).astype(jnp.float32)
            p2 = jnp.asarray(p2).astype(jnp.bfloat16).astype(jnp.float32)
        if broad_phase == "prune":
            return collide_polygons_pruned(p1, p2, mask1, mask2)
        narrow = sat_polygons(p1, p2, mask1, mask2)
        if not broad_phase:
            return narrow
        return jnp.where(candidate_mask(p1, p2, mask1, mask2), narrow, 0)

    # ---- Monte Carlo -----------------------------------------------------
    def forward(self, key: Array, configs: Configs, n_samples: int) -> Array:
        """Fixed-budget MC collision probabilities; jittable. f32 (C,)."""
        return collision_probability(key, configs, self.robot_wh, n_samples)

    def forward_pruned(
        self, key: Array, configs: Configs, n_samples: int, *,
        sigma_margin: float = 6.0, impl: str = "auto",
    ):
        """Fixed-budget MC with noise-aware broad-phase pruning: configs
        that cannot touch within sigma_margin std-devs are labeled 0
        without sampling (host-orchestrated; ~1/density wall-clock win on
        sparse scenes — see mc.estimator.collision_probability_pruned)."""
        return collision_probability_pruned(
            key, configs, self.robot_wh, n_samples,
            sigma_margin=sigma_margin, impl=impl,
        )

    def label(self, key: Array, configs: Configs, cfg: AdaptiveConfig = AdaptiveConfig()):
        """Adaptive labeling to per-bin CI accuracy (host loop around the
        jitted round step). Returns (cp, n_samples, converged) numpy.

        Accepts `Configs` (static labels) and `MovingConfigs` batches
        (trajectory labels, mc.moving) — the adaptive machinery and its
        CI guarantees are predicate-agnostic."""
        return adaptive_collision_probabilities(key, configs, self.robot_wh, cfg)

    def trajectory_probability(
        self, key: Array, configs, n_samples: int, *,
        ca_iters: int = 48, tol: float = 1e-4,
    ) -> Array:
        """Fixed-budget P(the motion collides) for a `MovingConfigs`
        batch (mc.moving): the robot starts at each row's (position,
        pose_theta) and moves with (velocity, omega) for t_max. Same
        noise model and threefry streams as `forward` — at zero motion
        and ``tol=0`` the estimates are bitwise `forward`'s (keep the
        positive default for actual motion: certification of a
        transversal hit needs the tolerance band, mc.moving.CA_TOL)."""
        from collide2d_tpu.mc.moving import trajectory_collision_probability

        return trajectory_collision_probability(
            key, configs, self.robot_wh, n_samples,
            ca_iters=ca_iters, tol=tol,
        )


class PolygonCollisionProbabilityModel:
    """Collision labels + probabilities for a convex-k-gon robot — the
    extension the reference names (README.md:3) but never builds.

    ``robot_verts``: (K2, 2) CCW convex vertices in the robot frame.
    Accepts `PolygonConfigs` batches; same adaptive machinery, CI
    guarantees, pruning, and sharding semantics as the rectangle model
    (jnp path: uid-keyed streams, bitwise config-DP)."""

    def __init__(self, robot_verts):
        self.robot_verts = jnp.asarray(robot_verts, jnp.float32)

    def collide(self, configs: PolygonConfigs) -> Array:
        """Deterministic true-normal SAT label at zero noise. int32 (C,)."""
        robot = transform_vertices(
            self.robot_verts[None],
            configs.position[:, 0], configs.position[:, 1],
            configs.pose_theta,
        )
        return sat_polygons(robot, configs.obstacle_verts)

    def distance(self, configs: PolygonConfigs, *, impl: str = "jnp") -> Array:
        """Signed distance at zero noise for each configuration. f32 (C,):
        positive = clearance, negative = -(penetration depth); sign agrees
        with `collide` away from touching. Differentiable (see
        `ops.distance.polygon_signed_distance`).

        ``impl``: 'jnp' (default, differentiable), 'pallas' (fused
        `ops.distance_pallas.polygon_distance_pallas` kernel — values to
        f32 rounding, sign bitwise vs `collide`), or 'auto'."""
        from collide2d_tpu.mc.estimator import resolve_impl
        from collide2d_tpu.ops.distance import polygon_signed_distance

        robot = transform_vertices(
            self.robot_verts[None],
            configs.position[:, 0], configs.position[:, 1],
            configs.pose_theta,
        )
        if resolve_impl(impl, robot) == "pallas":
            from collide2d_tpu.ops.distance_pallas import (
                polygon_distance_pallas,
            )

            return polygon_distance_pallas(robot, configs.obstacle_verts)
        return polygon_signed_distance(robot, configs.obstacle_verts)

    def closest_points(self, configs: PolygonConfigs):
        """Witness points + contact normal per configuration: ``(dist,
        pa, pb, normal)`` with ``pa`` on the (placed) robot, ``pb`` on
        the obstacle, ``pb - pa = dist * normal``
        (`ops.distance.polygon_closest_points`)."""
        from collide2d_tpu.ops.distance import polygon_closest_points

        robot = transform_vertices(
            self.robot_verts[None],
            configs.position[:, 0], configs.position[:, 1],
            configs.pose_theta,
        )
        return polygon_closest_points(robot, configs.obstacle_verts)

    def contact_manifold(self, configs: PolygonConfigs, *,
                         margin: float = 0.0, impl: str = "auto"):
        """Contact manifold per configuration: ``(count, points, depths,
        normal)`` with the placed robot as body 1 and the obstacle as
        body 2 (`ops.manifold.polygon_contact_manifold` contract).

        ``impl``: 'jnp', 'pallas' (fused `ops.manifold_pallas` kernel),
        or 'auto' (pallas on TPU data)."""
        from collide2d_tpu.mc.estimator import resolve_impl
        from collide2d_tpu.ops.manifold import polygon_contact_manifold

        robot = transform_vertices(
            self.robot_verts[None],
            configs.position[:, 0], configs.position[:, 1],
            configs.pose_theta,
        )
        if resolve_impl(impl, robot) == "pallas":
            from collide2d_tpu.ops.manifold_pallas import (
                polygon_manifold_pallas,
            )

            return polygon_manifold_pallas(
                robot, configs.obstacle_verts, margin=margin
            )
        return polygon_contact_manifold(
            robot, configs.obstacle_verts, margin=margin
        )

    def forward(self, key: Array, configs: PolygonConfigs, n_samples: int) -> Array:
        """Fixed-budget MC collision probabilities; jittable. f32 (C,)."""
        return collision_probability(
            key, configs, self.robot_verts, n_samples
        )

    def forward_pruned(
        self, key: Array, configs: PolygonConfigs, n_samples: int, *,
        sigma_margin: float = 6.0,
    ):
        """Fixed-budget MC with noise-aware pruning (circumscribed-circle
        reach test on the vertex norms)."""
        return collision_probability_pruned(
            key, configs, self.robot_verts, n_samples,
            sigma_margin=sigma_margin, impl="jnp",
        )

    def label(
        self, key: Array, configs,
        cfg: AdaptiveConfig = AdaptiveConfig(),
    ):
        """Adaptive labeling to per-bin CI accuracy. Returns (cp,
        n_samples, converged) numpy arrays. Accepts `PolygonConfigs`
        (static labels) and `MovingPolygonConfigs` (trajectory labels)."""
        return adaptive_collision_probabilities(
            key, configs, self.robot_verts, cfg
        )

    def trajectory_probability(
        self, key: Array, configs, n_samples: int, *,
        ca_iters: int = 48, tol: float = 1e-4,
    ) -> Array:
        """Fixed-budget P(the motion collides) for a
        `MovingPolygonConfigs` batch (mc.moving): the robot k-gon starts
        at each row's (position, pose_theta) and moves with (velocity,
        omega) for t_max. Same noise model and threefry streams as
        `forward` — at zero motion the per-sample decisions are bitwise
        `forward`'s (non-rotating samples resolve through the exact
        translation window, which degenerates to the static SAT test)."""
        from collide2d_tpu.mc.moving import trajectory_collision_probability

        return trajectory_collision_probability(
            key, configs, self.robot_verts, n_samples,
            ca_iters=ca_iters, tol=tol,
        )


def example_polygon_configs(
    n: int = 8, k: int = 6, seed: int = 0
) -> PolygonConfigs:
    """Small deterministic PolygonConfigs batch (convex by construction:
    vertices on per-config ellipses at sorted angles)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ang = jnp.sort(
        jax.random.uniform(k1, (n, k), jnp.float32, 0.0, 2.0 * jnp.pi), axis=-1
    )
    ab = jax.random.uniform(k2, (n, 1, 2), jnp.float32, 0.5, 3.0)
    verts = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1) * ab
    return PolygonConfigs(
        position=jax.random.uniform(k3, (n, 2), jnp.float32, -6.0, 6.0),
        pose_theta=jax.random.uniform(k4, (n,), jnp.float32, 0.0, 2.0 * jnp.pi),
        obstacle_verts=verts,
        std_dev=jax.random.uniform(k5, (n, 3), jnp.float32, 0.0, 0.55),
    )


def example_configs(n: int = 8, seed: int = 0) -> Configs:
    """Small deterministic Configs batch for smoke tests / compile checks."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return Configs(
        position=jax.random.uniform(k1, (n, 2), jnp.float32, -6.0, 6.0),
        pose_theta=jax.random.uniform(k2, (n,), jnp.float32, 0.0, 2.0 * jnp.pi),
        obstacle_wh=jax.random.uniform(k3, (n, 2), jnp.float32, 0.1, 5.0),
        std_dev=jax.random.uniform(k4, (n, 5), jnp.float32, 0.0, 0.55)
        .at[:, 3:]
        .set(0.0),
    )
