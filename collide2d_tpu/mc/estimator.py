"""Monte Carlo collision-probability estimator with adaptive stopping.

TPU-native re-design of the reference's device kernel + host driver pair
(`monte_carlo_sample_collision_dataset_uniform`, generate_dataset.cu:
175-253, and the while-loop at generate_dataset.cu:425-468):

- One CUDA thread per configuration becomes a vmapped configuration axis
  (P1 in SURVEY.md §2), shardable across chips.
- The per-thread scalar sample loop becomes a lane-parallel sample axis
  reduced on-chip inside `lax.fori_loop` (P2), so only (C,)-shaped
  accumulators ever live in HBM.
- thrust count/sort_by_key stream compaction becomes masked accumulation
  plus HALVING-BUCKET recompaction: the active set is repacked into a
  buffer of half the size whenever it can be, so XLA sees only
  O(log C) distinct shapes (each compiled once) instead of dynamic ones.
- The noisy-obstacle SAT test uses the closed-form oriented-box test
  (`ops.sat.obb_collide`) — boolean-equivalent to the reference's
  vertex-buffer SAT, ~40 flops + 4 transcendentals per sample, with a
  vertex-path implementation available for cross-checking.

Statistical contract: labels match the reference's within Monte Carlo
noise (curand != threefry), and each converged label satisfies the same
Wald/rule-of-three CI criterion (`mc.stats`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.mc import stats
from collide2d_tpu.mc.noise import sampled_obstacle_vertices, NoiseParams
from collide2d_tpu.ops.sat import obb_collide, sat_rects
from collide2d_tpu.ops.geometry import rects_from_params, transform_vertices


class Configs(NamedTuple):
    """A batch of C dataset configurations (the per-thread state of the
    reference kernel, generate_dataset.cu:199-227, as arrays).

    position:    (C, 2) robot center in the obstacle frame
    pose_theta:  (C,)   robot orientation
    obstacle_wh: (C, 2) obstacle width/height (obstacle sits at origin)
    std_dev:     (C, 5) noise sigmas (x, y, theta, width, height)
    """

    position: Array
    pose_theta: Array
    obstacle_wh: Array
    std_dev: Array

    @property
    def num(self) -> int:
        return self.position.shape[0]


class PolygonConfigs(NamedTuple):
    """A batch of C convex-k-gon configurations — BEYOND the reference.

    The reference names arbitrary convex polygons as SAT's extension path
    (README.md:3) but its Monte-Carlo machinery is rectangle-only; here
    the same adaptive driver (`adaptive_collision_probabilities`,
    `collision_probability`) accepts either type. Noise is POSE noise
    (x, y, theta) on the obstacle — the rectangle model's additive
    width/height noise has no k-gon analogue, so std_dev has 3 columns,
    not 5.

    position:       (C, 2)    robot center in the obstacle frame
    pose_theta:     (C,)      robot orientation
    obstacle_verts: (C, K, 2) CCW convex vertices in the obstacle frame
                              (rotated about the ORIGIN by the theta
                              noise, like the reference's rectangles,
                              utils.cu:144-157). Fixed-K contract: pad
                              short polygons by REPEATING a real vertex
                              (see ops.sat.sat_polygons), or build via
                              `from_padded` with a mask.
    std_dev:        (C, 3)    noise sigmas (x, y, theta)

    The robot is passed where rectangle calls pass ``robot_wh``: a
    (K2, 2) vertex array in the robot frame (around its own origin).
    impl='pallas' (and 'auto' on TPU) dispatches to the fused polygon
    kernel (ops.mc_polygon_pallas, ~2x the XLA path); impl='jnp' keeps
    every rectangle-path guarantee — uid-keyed streams, compaction
    invariance, bitwise config-DP.
    """

    position: Array
    pose_theta: Array
    obstacle_verts: Array
    std_dev: Array

    @property
    def num(self) -> int:
        return self.position.shape[0]

    @classmethod
    def from_padded(
        cls, position, pose_theta, obstacle_verts, std_dev, mask=None
    ) -> "PolygonConfigs":
        """Build configs from arbitrarily padded fixed-K vertices: with a
        ``mask`` ((C, K) bool, True = real vertex), padded slots are
        rewritten to the last real vertex (the repeat-padding the SAT
        contract requires)."""
        from collide2d_tpu.ops.sat import _normalize_padding

        position = jnp.asarray(position, jnp.float32)
        pose_theta = jnp.asarray(pose_theta, jnp.float32)
        obstacle_verts = jnp.asarray(obstacle_verts, jnp.float32)
        std_dev = jnp.asarray(std_dev, jnp.float32)
        c = position.shape[0] if position.ndim else -1
        ok = (
            position.ndim == 2 and position.shape == (c, 2)
            and pose_theta.shape == (c,)
            and obstacle_verts.ndim == 3
            and obstacle_verts.shape[0] == c
            and obstacle_verts.shape[2] == 2
            and std_dev.shape == (c, 3)
            and (mask is None or jnp.shape(mask) == obstacle_verts.shape[:2])
        )
        if not ok:
            raise ValueError(
                "PolygonConfigs.from_padded: expected position (C, 2), "
                "pose_theta (C,), obstacle_verts (C, K, 2), std_dev (C, 3) "
                "[pose-noise sigmas x/y/theta], optional mask (C, K); got "
                f"position {position.shape}, pose_theta {pose_theta.shape}, "
                f"obstacle_verts {obstacle_verts.shape}, std_dev "
                f"{std_dev.shape}"
                + ("" if mask is None else f", mask {jnp.shape(mask)}")
            )
        return cls(
            position=position,
            pose_theta=pose_theta,
            obstacle_verts=_normalize_padding(
                obstacle_verts,
                None if mask is None else jnp.asarray(mask, bool),
            ),
            std_dev=std_dev,
        )


def _per_config_keys(key: Array, uids: Array) -> Array:
    """Stable per-configuration keys: fold the config uid into the base
    key so results are invariant under compaction/re-ordering."""
    return jax.vmap(lambda u: jax.random.fold_in(key, u))(uids)


def _pick_sub_pallas(nb: int) -> int:
    """The fused kernel's sub-tile for an ``nb``-sample round (lazy import:
    ops.mc_pallas imports Configs from this module)."""
    from collide2d_tpu.ops.mc_pallas import _pick_sub

    return _pick_sub(nb)


def _largest_divisor_leq(n: int, cap: int) -> int:
    for s in range(min(cap, n), 0, -1):
        if n % s == 0:
            return s
    return 1


@functools.lru_cache(maxsize=None)
def _canonical_step(nb: int) -> int:
    """The auto step for an ``nb``-sample round: the largest divisor
    <= 512 whose step COUNT is a multiple of 8, falling back to the
    plain largest divisor. Making the step-count 8-divisible keeps the
    choice IDENTICAL for unsharded runs and any sample axis in
    {1, 2, 4, 8} — the per-step fold_in tags (and hence every label) are
    then value-level invariants of the mesh."""
    fallback = 1
    for s in range(min(512, nb), 0, -1):
        if nb % s:
            continue
        if fallback == 1:
            fallback = s
        if (nb // s) % 8 == 0:
            return s
    return fallback


def _plan_round(cfg, sim_n: int, n_sample: int, impl: str) -> tuple[int, int]:
    """(n_batch, step_samples) for the round starting at ``sim_n`` samples.

    n_batch is rounded UP (never down) only as far as the execution path
    requires: to a multiple of 64 for the Pallas kernel (so EVERY round
    runs the largest, fastest 64-sample sub-tile and one compilation per
    buffer shape serves the whole schedule — measured +4% over the
    16-sample tile the ragged batches otherwise fall to), of the
    sample-axis device count, and — when the configured batch has no
    divisor >= 64 under the 512-lane cap — of the step itself, so a prime
    ``--n_batch`` can never degrade to a 1-lane fori loop (~500x slower).
    A single-device jnp run keeps the exact configured batch.
    Extra samples are counted in n_samples, so the CI criterion is
    evaluated at the true draw count (documented divergence: the
    reference draws exactly n_batch).
    """
    import math

    nb = cfg.batch_for(sim_n)
    # Rounding granules are deliberately n_sample-INDEPENDENT: the plan
    # for a sharded run must equal the unsharded plan or the advertised
    # bitwise sample-axis contract breaks silently (review r2 finding).
    if impl == "pallas":
        nb = -(-nb // 64) * 64  # the kernel's largest sub-tile granule
    if cfg.step_samples:
        step = cfg.step_samples
        if impl == "pallas":
            # The kernel draws its own sub-tiles; step is tag-only, but
            # the round tag must still ADVANCE (nb // step >= 1) or
            # consecutive rounds would redraw identical noise.
            return nb, min(step, nb)
        if nb % (step * n_sample):
            raise ValueError(
                f"step_samples={step} x sample axis {n_sample} must divide "
                f"n_batch={nb}"
            )
        return nb, step
    if impl == "pallas":
        # The kernel draws 64-sample sub-tiles itself; step only advances
        # the round tag. Skipping the canonical-step search matters: it
        # was designed for the jnp path's lane divisibility, and for e.g.
        # nb=100032 (= 2^6 * 3 * 521) it would bump the batch to 102400 —
        # 2.4% pure extra work on the schedule's bulk rounds.
        return nb, 64
    step = _canonical_step(nb)
    if step < 64 and nb >= 4096:
        # No decent divisor (prime-ish batch): bump to a multiple of
        # 4096 = 512 lanes x 8 steps — the same plan at EVERY sample
        # axis in {1,2,4,8}.
        nb = -(-nb // 4096) * 4096
        step = 512
    if (nb // step) % n_sample:
        # The shard-invariant plan cannot serve this axis (e.g. a 16-way
        # sample mesh with an 8-step batch): fall back to a valid
        # shard-SPECIFIC plan, loudly — labels will differ from an
        # unsharded run (pin step_samples to restore comparability).
        import warnings

        g = math.lcm(64 if impl == "pallas" else 1, n_sample)
        nb2 = -(-nb // g) * g
        step2 = _largest_divisor_leq(nb2 // n_sample, 512)
        if step2 < 64 and nb2 >= 512 * n_sample:
            g2 = math.lcm(512 * n_sample, g)
            nb2 = -(-nb2 // g2) * g2
            step2 = 512
        warnings.warn(
            f"sample axis {n_sample} is incompatible with the canonical "
            f"(shard-invariant) plan for n_batch={nb}; using a shard-"
            f"specific plan ({nb2}, {step2}) — labels will NOT be bitwise-"
            "equal to an unsharded run. Pin step_samples (and an n_batch "
            f"divisible by step x {n_sample}) to restore comparability.",
            stacklevel=3,
        )
        return nb2, step2
    return nb, step


def _counts_chunk_polygons(
    keys: Array, configs: "PolygonConfigs", robot_verts: Array, n_lanes: int
) -> Array:
    """Polygon analogue of `_counts_chunk`: the obstacle k-gon is rotated
    about the origin by the theta draw and translated by the (x, y) draw
    (the k-gon generalization of sample_rectangle, utils.cu:144-157,
    minus the rectangle-only shape noise), then tested against the fixed
    robot k-gon with true-normal SAT."""
    from collide2d_tpu.ops.sat import sat_polygons

    z = jax.vmap(lambda k: jax.random.normal(k, (n_lanes, 3), jnp.float32))(keys)
    d = z * configs.std_dev[:, None, :]  # (C, S, 3)
    # Robot: fixed per configuration; obstacle: per-sample rigid motion.
    # Both use the shared reference-parity rotate-then-translate
    # (ops.geometry.transform_vertices, utils.cu:132-142).
    robot = transform_vertices(
        jnp.asarray(robot_verts)[None],
        configs.position[:, 0], configs.position[:, 1], configs.pose_theta,
    )[:, None]  # (C, 1, K2, 2)
    obstacle = transform_vertices(
        configs.obstacle_verts[:, None], d[..., 0], d[..., 1], d[..., 2]
    )  # (C, S, K, 2)
    s = obstacle.shape[1]
    hit = sat_polygons(
        jnp.broadcast_to(robot, robot.shape[:1] + (s,) + robot.shape[2:]),
        obstacle,
    )
    return jnp.sum(hit, axis=-1, dtype=jnp.int32)


def _counts_chunk(
    keys: Array, configs: Configs, robot_wh: Array, n_lanes: int,
    use_vertices: bool, ca_iters: int = 48, ca_tol: float = 1e-4,
    ca_screen: bool = True,
) -> Array:
    """Collision count over ``n_lanes`` samples for each configuration.

    ``ca_iters``/``ca_tol``/``ca_screen`` apply only to trajectory
    batches (the conservative-advancement budget of the per-sample TOI
    predicate, and the certified screening cascade in front of it)."""
    from collide2d_tpu.mc.moving import (
        MovingConfigs,
        MovingPolygonConfigs,
        counts_chunk_moving,
        counts_chunk_moving_polygons,
    )

    if isinstance(configs, MovingConfigs):
        return counts_chunk_moving(
            keys, configs, robot_wh, n_lanes, ca_iters=ca_iters, tol=ca_tol,
            ca_screen=ca_screen,
        )
    if isinstance(configs, MovingPolygonConfigs):
        return counts_chunk_moving_polygons(
            keys, configs, robot_wh, n_lanes, ca_iters=ca_iters, tol=ca_tol,
            ca_screen=ca_screen,
        )
    if isinstance(configs, PolygonConfigs):
        return _counts_chunk_polygons(keys, configs, robot_wh, n_lanes)
    z = jax.vmap(lambda k: jax.random.normal(k, (n_lanes, 5), jnp.float32))(keys)
    d = z * configs.std_dev[:, None, :]  # (C, S, 5)
    if use_vertices:
        # Bit-faithful vertex path: mirrors sample_rectangle +
        # convex_collide (utils.cu:144-184) through rect algebra.
        noise = NoiseParams(d[..., 0], d[..., 1], d[..., 2], d[..., 3], d[..., 4])
        obstacle = sampled_obstacle_vertices(configs.obstacle_wh[:, None, :], noise)
        robot = rects_from_params(
            configs.position,
            jnp.broadcast_to(robot_wh, configs.position.shape),
            configs.pose_theta,
        )  # (C, 4, 2)
        hit = sat_rects(jnp.broadcast_to(robot[:, None], obstacle.shape), obstacle)
    else:
        # Closed-form OBB path (fast): the sampled obstacle is an oriented
        # box with center (dx,dy), extents wh+(dw,dh), angle dtheta.
        hit = obb_collide(
            configs.position[:, None, :],
            jnp.broadcast_to(robot_wh, (1, 1, 2)),
            configs.pose_theta[:, None],
            d[..., 0:2],
            configs.obstacle_wh[:, None, :] + d[..., 3:5],
            d[..., 2],
        )
    return jnp.sum(hit, axis=-1, dtype=jnp.int32)


def resolve_impl(impl: str, example: Array | None = None) -> str:
    """'auto' -> the fused Pallas kernel on TPU, threefry-jnp elsewhere.

    Resolution uses the platform the DATA actually lives on when an
    example array is given — `jax.default_backend()` alone is unreliable
    in environments where a TPU plugin registers itself as the default
    while computation is pinned to CPU (e.g. the test harness).
    """
    if impl != "auto":
        return impl
    platform = None
    if example is not None and hasattr(example, "devices"):
        try:
            platform = next(iter(example.devices())).platform
        except Exception:
            platform = None  # e.g. a Tracer under an outer jit
    if platform is None:
        # Tracer (or no example): an explicitly pinned default device
        # outranks default_backend() — on this image the TPU plugin
        # registers itself as the default backend even when the user
        # pinned jax_default_device to CPU, and resolving 'pallas' there
        # would dispatch a Mosaic kernel through the (possibly wedged)
        # tunnel from inside a CPU-pinned program.
        default_dev = getattr(jax.config, "jax_default_device", None)
        platform = getattr(default_dev, "platform", None)
    if platform is None:
        platform = jax.default_backend()
    return "pallas" if platform in ("tpu", "axon") else "jnp"


def mc_round(
    key: Array,
    uids: Array,
    configs: Configs,
    robot_wh: Array,
    chunk_offset: Array,
    *,
    n_batch: int,
    step_samples: int = 0,
    use_vertices: bool = False,
    impl: str = "jnp",
    ca_iters: int = 48,
    ca_tol: float = 1e-4,
) -> Array:
    """One adaptive round: ``n_batch`` Monte Carlo samples per config.

    The TPU equivalent of one launch of the reference kernel's hot loop
    (generate_dataset.cu:238-242). Returns int32 (C,) collision counts.

    impl='jnp' (default): threefry path — per-uid key streams, bitwise
    reproducible under compaction/resharding, runs anywhere.
    impl='pallas': the fused TPU kernel (ops.mc_pallas) — ~1.5-2x faster,
    streams tied to (round, block) instead of uid (each round reseeds, so
    samples stay i.i.d., but results are not compaction-invariant).
    impl='auto': pallas on TPU, jnp elsewhere.

    `PolygonConfigs` batches dispatch to the fused polygon kernel
    (ops.mc_polygon_pallas) on the pallas path; `MovingConfigs` batches
    (the trajectory predicate, mc.moving) to the fused advancement
    kernel (ops.mc_toi_pallas) — same stream semantics as the rectangle
    kernel in both cases. `MovingPolygonConfigs` batches (trajectory
    k-gons): 'auto' resolves to jnp; explicit 'pallas' dispatches the
    fused translation-window kernel (ops.mc_moving_polygon_pallas) and
    requires ``ca_iters=0`` — the caller asserts the batch is
    translation-only, exactly as the jnp path's ``ca_iters=0`` contract.
    """
    from collide2d_tpu.mc.moving import MovingConfigs, MovingPolygonConfigs

    if isinstance(configs, MovingPolygonConfigs):
        if impl == "pallas":
            if ca_iters > 0:
                raise ValueError(
                    "impl='pallas' supports only TRANSLATION-ONLY "
                    "MovingPolygonConfigs batches (pass ca_iters=0 after "
                    "verifying omega == 0 everywhere, as the adaptive "
                    "driver does; rotating trajectory k-gons run the jnp "
                    "CA path — use 'jnp' or 'auto')"
                )
        else:
            impl = "jnp"  # 'auto' stays on the threefry path
    else:
        impl = resolve_impl(impl, configs.position)
    if impl == "pallas" and isinstance(configs, MovingPolygonConfigs):
        from collide2d_tpu.ops.mc_moving_polygon_pallas import (
            mc_round_moving_polygons_pallas,
        )

        return mc_round_moving_polygons_pallas(
            key, configs, robot_wh, chunk_offset, n_batch=n_batch
        )
    if impl == "pallas" and isinstance(configs, MovingConfigs):
        from collide2d_tpu.ops.mc_toi_pallas import mc_round_moving_pallas

        return mc_round_moving_pallas(
            key, configs, robot_wh, chunk_offset, n_batch=n_batch,
            ca_iters=ca_iters, tol=ca_tol,
        )
    if impl == "pallas" and isinstance(configs, PolygonConfigs):
        from collide2d_tpu.ops.mc_polygon_pallas import mc_round_polygons_pallas

        return mc_round_polygons_pallas(
            key, configs, robot_wh, chunk_offset, n_batch=n_batch
        )
    if impl == "pallas":
        from collide2d_tpu.ops.mc_pallas import mc_round_pallas

        return mc_round_pallas(key, configs, robot_wh, chunk_offset, n_batch=n_batch)
    if step_samples <= 0:
        step_samples = _largest_divisor_leq(n_batch, 512)
    assert n_batch % step_samples == 0, (n_batch, step_samples)
    # n_steps rides in as a TRACED scalar: one compilation per buffer
    # shape serves every n_batch in the adaptive schedule (remote TPU
    # compiles cost minutes; see utils/benchmarks.py methodology note).
    return _mc_round_jnp(
        key,
        uids,
        configs,
        robot_wh,
        chunk_offset,
        jnp.int32(n_batch // step_samples),
        step_samples=step_samples,
        use_vertices=use_vertices,
        ca_iters=ca_iters,
        ca_tol=ca_tol,
    )


@functools.partial(
    jax.jit, static_argnames=("step_samples", "use_vertices", "ca_iters",
                              "ca_tol", "ca_screen")
)
def _mc_round_jnp(
    key: Array,
    uids: Array,
    configs: Configs,
    robot_wh: Array,
    chunk_offset: Array,
    n_steps: Array,
    *,
    step_samples: int,
    use_vertices: bool = False,
    ca_iters: int = 48,
    ca_tol: float = 1e-4,
    ca_screen: bool = True,
) -> Array:
    """threefry round step: ``step_samples`` lanes at a time inside a
    ``fori_loop`` (traced bound) so intermediates stay fused on-chip;
    ``chunk_offset`` keeps the per-config random stream continuous across
    rounds regardless of compaction."""
    base_keys = _per_config_keys(key, uids)
    robot_wh = jnp.asarray(robot_wh, jnp.float32)

    def body(i, counts):
        step_keys = jax.vmap(jax.random.fold_in, (0, None))(
            base_keys, chunk_offset + i
        )
        return counts + _counts_chunk(
            step_keys, configs, robot_wh, step_samples, use_vertices,
            ca_iters, ca_tol, ca_screen,
        )

    counts0 = jnp.zeros((configs.num,), jnp.int32)
    return jax.lax.fori_loop(0, n_steps, body, counts0)


def _mesh_axis(mesh, name: str) -> int:
    return dict(mesh.shape).get(name, 1)


def _sample_sharded_counts(
    key: Array,
    uids: Array,
    configs: Configs,
    robot_wh: Array,
    chunk_offset: Array,
    n_steps: Array,
    *,
    step_samples: int,
    use_vertices: bool,
    mesh,
    ca_iters: int = 48,
    ca_tol: float = 1e-4,
) -> Array:
    """Round counts with STEPS round-robined over the ``sample`` mesh axis.

    Device ``s`` of the sample axis computes exactly the steps
    ``i = s + j * n_sample`` of the single-chip stream — using the SAME
    per-config threefry fold_in tags ``chunk_offset + i`` that
    `_mc_round_jnp` uses — so the psum of partial counts is BITWISE equal
    to the unsharded sum (int32 addition is exact and order-free). The
    sample axis is therefore a value-level no-op, like the config axis.

    Requires ``n_steps % n_sample == 0`` (callers pick ``step_samples``
    so that ``step_samples * n_sample`` divides ``n_batch``); a remainder
    would silently drop trailing steps.
    """
    from jax.sharding import PartitionSpec as P

    n_sample = _mesh_axis(mesh, "sample")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("config"), P("config"), P(), P(), P()),
        out_specs=P("config"),
    )
    def body(key, uids, cfgs, robot_wh, chunk_offset, n_steps):
        sidx = jax.lax.axis_index("sample")
        base_keys = _per_config_keys(key, uids)
        local_steps = n_steps // n_sample

        def step(j, counts):
            tag = chunk_offset + sidx + j * n_sample
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(base_keys, tag)
            return counts + _counts_chunk(
                step_keys, cfgs, robot_wh, step_samples, use_vertices,
                ca_iters, ca_tol,
            )

        counts0 = jax.lax.pcast(
            jnp.zeros((cfgs.num,), jnp.int32), ("config", "sample"), to="varying"
        )
        local = jax.lax.fori_loop(0, local_steps, step, counts0)
        return jax.lax.psum(local, "sample")

    return body(key, uids, configs, robot_wh, chunk_offset, n_steps)


def _pallas_sharded_counts(
    key: Array,
    configs: Configs,
    robot_wh: Array,
    chunk_offset: Array,
    n_steps: Array,
    *,
    sub: int,
    mesh,
    shape_noise: bool = True,
    poly_a_keep: tuple | None = None,
    interpret: bool = False,
    ca_iters: int = 48,
    ca_tol: float = 1e-4,
) -> Array:
    """The fused Pallas MC kernel under a (config, sample) mesh.

    `shard_map` runs one kernel instance per device on its local config
    shard; each shard folds its axis index into the round key so block
    streams never repeat across shards. A ``sample`` axis > 1 splits the
    STEP budget: sample shard ``s`` runs ``n_steps // S`` steps (+1 for
    the first ``n_steps % S`` shards, so the psum'd total is EXACTLY
    ``n_steps * sub`` samples per config at any ``n_steps``) with the
    sample index folded into its key. Kernel streams are block-position-
    tied (never bitwise-comparable across layouts — see ops/mc_pallas.py
    header), so unlike `_sample_sharded_counts` this offers the i.i.d.
    statistical contract only, which is all the pallas path ever has.
    ``n_steps`` is TRACED (samples per config = n_steps * sub) so one
    compilation serves every round size. ``interpret`` runs the kernel in
    interpreter mode (CPU-mesh smoke tests of the shard_map wiring; pair
    with the PRNG stub hook). `PolygonConfigs` shards dispatch to the
    fused polygon kernel with the same per-shard stream semantics
    (``robot_wh`` = the (K2, 2) robot polygon there).
    """
    from jax.sharding import PartitionSpec as P

    from collide2d_tpu.mc.moving import MovingConfigs, MovingPolygonConfigs

    if isinstance(configs, MovingConfigs):
        from collide2d_tpu.ops.mc_toi_pallas import (
            mc_round_moving_pallas as _round_fn,
        )

        kw = {"shape_noise": shape_noise, "ca_iters": ca_iters,
              "tol": ca_tol}
    elif isinstance(configs, MovingPolygonConfigs):
        from collide2d_tpu.ops.mc_moving_polygon_pallas import (
            mc_round_moving_polygons_pallas as _round_fn,
        )

        kw = {"a_keep": poly_a_keep}
    elif isinstance(configs, PolygonConfigs):
        from collide2d_tpu.ops.mc_polygon_pallas import (
            mc_round_polygons_pallas as _round_fn,
        )

        kw = {"a_keep": poly_a_keep}
    else:
        from collide2d_tpu.ops.mc_pallas import mc_round_pallas as _round_fn

        kw = {"shape_noise": shape_noise}

    n_sample = _mesh_axis(mesh, "sample")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("config"), P(), P(), P()),
        out_specs=P("config"),
        # pallas_call emits ShapeDtypeStructs without varying-mesh-axes
        # annotations; skip the vma type check for this wrapper (the
        # output is config-varying by construction: per-shard key + data).
        check_vma=False,
    )
    def body(key, cfgs, robot_wh, chunk_offset, n_steps):
        cidx = jax.lax.axis_index("config")
        k = jax.random.fold_in(key, cidx)
        if n_sample > 1:
            sidx = jax.lax.axis_index("sample")
            k = jax.random.fold_in(k, sidx)
            n_steps = n_steps // n_sample + (
                sidx < jnp.remainder(n_steps, n_sample)
            ).astype(jnp.int32)
        counts = _round_fn(
            k, cfgs, robot_wh, chunk_offset,
            n_steps=n_steps, sub=sub, interpret=interpret, **kw,
        )
        if n_sample > 1:
            counts = jax.lax.psum(counts, "sample")
        return counts

    return body(key, configs, robot_wh, chunk_offset, jnp.asarray(n_steps, jnp.int32))


def collision_probability(
    key: Array,
    configs: Configs,
    robot_wh,
    n_samples: int,
    *,
    step_samples: int = 0,
    use_vertices: bool = False,
    impl: str = "jnp",
    ca_iters: int = 48,
    ca_tol: float = 1e-4,
) -> Array:
    """Fixed-sample-count Monte Carlo collision probability.

    The single-pair/fixed-budget entry point (BASELINE.json config #3:
    "Monte Carlo collision probability for one rectangle pair, fixed +
    supplied variance (10k samples)"). Returns float32 (C,) estimates.
    """
    uids = jnp.arange(configs.num, dtype=jnp.int32)
    counts = mc_round(
        key,
        uids,
        configs,
        jnp.asarray(robot_wh, jnp.float32),
        jnp.int32(0),
        n_batch=int(n_samples),
        step_samples=step_samples,
        use_vertices=use_vertices,
        impl=impl,
        ca_iters=ca_iters,
        ca_tol=ca_tol,
    )
    return counts.astype(jnp.float32) / jnp.float32(n_samples)


def collision_probability_pruned(
    key: Array,
    configs: Configs,
    robot_wh,
    n_samples: int,
    *,
    sigma_margin: float = 6.0,
    step_samples: int = 0,
    use_vertices: bool = False,
    impl: str = "jnp",
) -> np.ndarray:
    """Fixed-budget MC probabilities with noise-aware broad-phase pruning.

    This is where broad-phase pruning actually pays on TPU (measured —
    see ops/broad_phase.py docstring): compaction costs one mask readback
    and one small gather, amortized over ``n_samples`` (thousands) of
    draws per candidate, so wall-clock scales with the candidate density
    (~1/density speedup on sparse scenes; bench_broad_phase).

    Non-candidates (impossible to touch within ``sigma_margin`` standard
    deviations, `ops.broad_phase.possible_collision_mask`) are labeled 0
    without sampling — an approximation with error below
    ~5*P(|z|>sigma_margin) (~1e-8 at the default 6), orders of magnitude
    under the reference's tightest 1e-4 accuracy bin. Candidate rows are
    BITWISE identical to the unpruned `collision_probability` on the jnp
    path: streams are keyed by the original row index, so compaction
    cannot change them (tested).

    Host-orchestrated (one device sync); returns a host numpy array.
    """
    from collide2d_tpu.ops.broad_phase import possible_collision_mask
    from collide2d_tpu.mc.driver import _round_up_bucket

    C = configs.num
    mask = np.asarray(
        jax.device_get(possible_collision_mask(configs, robot_wh, sigma_margin))
    )
    out = np.zeros((C,), np.float32)
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return out
    # Pad candidates to a power-of-two bucket (repeat row idx[0]) so XLA
    # compiles O(log C) shapes, same discipline as the adaptive repack.
    bucket = min(_round_up_bucket(idx.size, 256), C)
    padded = np.concatenate(
        [idx, np.full(bucket - idx.size, idx[0], dtype=idx.dtype)]
    )
    gather = jnp.asarray(padded, jnp.int32)
    sub = type(configs)(*(jnp.take(a, gather, axis=0) for a in configs))
    counts = mc_round(
        key,
        gather,  # original row ids as uids => streams match the unpruned run
        sub,
        jnp.asarray(robot_wh, jnp.float32),
        jnp.int32(0),
        n_batch=int(n_samples),
        step_samples=step_samples,
        use_vertices=use_vertices,
        impl=impl,
    )
    out[idx] = np.asarray(jax.device_get(counts), np.float32)[
        : idx.size
    ] / np.float32(n_samples)
    return out


@dataclass(frozen=True)
class AdaptiveConfig:
    """Adaptive-stop schedule + accuracy targets.

    Defaults mirror the reference exactly: accuracy bins {0, .01, .1, 1}
    with per-bin CI targets {1e-4, 1e-3, 1e-2} (generate_dataset.cu:58-59),
    sample schedule 1000/round until 20k then 100000/round
    (generate_dataset.cu:427-430), cap 4e6 (generate_dataset.cu:53).
    ``fixed_batch`` (ztest.cu:332 uses 10000) overrides the two-phase
    schedule when set.

    ``schedule``: optional explicit CUMULATIVE convergence checkpoints, or
    the string "tuned". The reference's schedule jumps straight from 20k
    to 120k samples, yet its single largest population — zero-probability
    configurations — satisfies the rule-of-three criterion at 36,889: they
    all wait for 120k. "tuned" adds exactly ONE checkpoint there
    (ln(1/alpha)/bin_accuracy[0], rounded up to the kernel granule) and
    then keeps the reference's later_batch cadence — measured 26% fewer
    samples/configuration and +32% configs/s end to end (at 65k-config
    batches; +12% at the 100k production batch), while every
    emitted label still satisfies the SAME per-bin CI criterion
    (checkpoints only decide WHERE convergence is tested, never the test).
    """

    accuracy_bins: Sequence[float] = (0.0, 0.01, 0.1, 1.0)
    bin_accuracy: Sequence[float] = (0.0001, 0.001, 0.01)
    max_samples: int = 4_000_000
    initial_batch: int = 1_000
    initial_phase_samples: int = 20_000
    later_batch: int = 100_000
    fixed_batch: int | None = None
    step_samples: int = 0
    min_active: int = 256  # smallest compaction bucket
    use_vertices: bool = False
    impl: str = "auto"  # 'jnp' | 'pallas' | 'auto' (see mc_round)
    schedule: Sequence[int] | str | None = None  # cumulative checkpoints | "tuned"
    # Repack bucket ladder: "eighth" (default) = all 2^k + i*2^(k-3)
    # rungs — finest spacing (padding <= 12.5%, avg ~5.6%); since the
    # scheduler repacks exactly when the bucket would shrink a rung, the
    # spacing also bounds how long converged rows ride, so the fine
    # ladder pays twice (measured +3-5% configs/s over "quarter" at 65k
    # configs; the extra compiled shapes are hidden by the warmup
    # threads). "quarter" = {2^k, 1.25x, 1.5x, 1.75x}; "half" =
    # {2^k, 3*2^(k-1)} for the minimal compile bill.
    ladder: str = "eighth"
    # Noise-aware broad phase (0 = off, reference parity): configurations
    # that cannot touch within this many std-devs are emitted as cp=0
    # WITHOUT sampling (ops.broad_phase.possible_collision_mask; label
    # error <= ~5*P(|z|>sigma) ~ 1e-8 at 6.0 — far below every accuracy
    # bin). The reference instead burns ~37k samples per zero-probability
    # configuration reaching the rule-of-three criterion.
    prune_sigma: float = 0.0
    # Conservative-advancement budget of the per-sample TOI predicate
    # for `MovingConfigs` (trajectory) batches — see mc.moving. Ignored
    # for the static Configs/PolygonConfigs types.
    ca_iters: int = 48
    ca_tol: float = 1e-4

    def __post_init__(self):
        if self.ladder not in ("half", "quarter", "eighth", "sixteenth"):
            raise ValueError(f"ladder must be 'half', 'quarter', 'eighth' "
                             f"or 'sixteenth', got {self.ladder!r}")
        # A length mismatch would otherwise be silent: jnp's clamping
        # gather in stats.is_converged reuses the last accuracy target for
        # out-of-range bins, yielding wrong convergence thresholds.
        if len(self.bin_accuracy) != len(self.accuracy_bins) - 1:
            raise ValueError(
                f"bin_accuracy must have len(accuracy_bins) - 1 = "
                f"{len(self.accuracy_bins) - 1} entries, got "
                f"{len(self.bin_accuracy)} (accuracy_bins="
                f"{tuple(self.accuracy_bins)}, bin_accuracy="
                f"{tuple(self.bin_accuracy)})"
            )

    def checkpoints(self) -> tuple[int, ...] | None:
        if self.schedule is None:
            return None
        if self.schedule == "tuned":
            from collide2d_tpu.mc import stats

            pts = [self.initial_batch * i
                   for i in range(1, self.initial_phase_samples // self.initial_batch + 1)]
            # One extra checkpoint just past the rule-of-three point
            # n3 = ln(1/alpha) / bin_accuracy[0] — the first sample count
            # where a ZERO-count configuration meets the tightest bin
            # target (stats.calc_slack's degenerate branch). The reference
            # jumps from 20k straight to 120k (generate_dataset.cu:
            # 427-430), so its largest population — zero-probability
            # configurations, ~61% of the annulus workload — burns 3.2x
            # the samples it needs; testing convergence here measured
            # +32% end-to-end labeling (65k-config batches). After this
            # point the plain
            # later_batch cadence continues to the cap (batch_for).
            acc0 = float(self.bin_accuracy[0])
            if acc0 > 0:
                n3 = -(-int(np.ceil(stats._LOG_INV_ALPHA / acc0)) // 64) * 64
                if (not pts or n3 > pts[-1]) and n3 < self.max_samples:
                    pts.append(n3)
            return tuple(pts)
        return tuple(int(x) for x in self.schedule)

    def batch_for(self, n_samples_so_far: int) -> int:
        if self.fixed_batch is not None:
            return self.fixed_batch
        pts = self.checkpoints()
        if pts is not None:
            for p in pts:
                if p > n_samples_so_far:
                    return p - n_samples_so_far
            return self.later_batch
        if n_samples_so_far < self.initial_phase_samples:
            return self.initial_batch
        return self.later_batch


@functools.partial(jax.jit, static_argnames=("accuracy_bins", "bin_accuracy"))
def _convergence(n_samples, n_true, accuracy_bins, bin_accuracy):
    done = stats.is_converged(
        n_samples, n_true, jnp.asarray(accuracy_bins), jnp.asarray(bin_accuracy)
    )
    return done, jnp.sum(done.astype(jnp.int32))


class _LoopState(NamedTuple):
    """Device-resident adaptive-loop state (one row per buffer slot)."""

    uids: Array      # original row id; -1 marks padding slots
    active: Configs
    n_true: Array    # running collision count
    done: Array      # has the stop criterion EVER held (bool)
    k_frozen: Array  # n_true at the FIRST round the criterion held
    n_frozen: Array  # n_samples at that round


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_samples", "sub", "use_vertices", "impl",
        "accuracy_bins", "bin_accuracy", "mesh", "shape_noise",
        "poly_a_keep", "ca_iters", "ca_tol",
    ),
)
def _fused_round(
    key: Array,
    state: _LoopState,
    robot_wh: Array,
    chunk_offset: Array,
    n_samples_after: Array,
    n_steps: Array,
    n_rounds: Array = 1,
    nb: Array = 0,
    chunk_step: Array = 0,
    *,
    step_samples: int,
    sub: int,
    use_vertices: bool,
    impl: str,
    accuracy_bins: tuple,
    bin_accuracy: tuple,
    mesh=None,
    shape_noise: bool = True,
    poly_a_keep: tuple | None = None,
    ca_iters: int = 48,
    ca_tol: float = 1e-4,
) -> tuple[_LoopState, Array]:
    """``n_rounds`` adaptive rounds + on-device convergence + label
    freezing, in ONE program.

    Labels freeze at the FIRST round the stop criterion holds — exactly
    the reference's semantics, where a converged configuration is
    compacted out the same round (generate_dataset.cu:455-464) — so the
    host may dispatch many rounds back-to-back and read only a single
    done-count scalar when it chooses to synchronize. Since round 3 the
    rounds themselves fuse: a same-plan RUN of rounds is one dispatch
    with an internal fori over rounds — round r draws with tag
    ``chunk_offset + r * chunk_step`` and tests convergence at
    ``n_samples_after + r * nb``, EXACTLY the tags/checkpoints of
    per-round dispatches, so labels are bitwise-identical while the
    per-round host dispatch overhead (measured ~7-8 ms/round through
    this image's tunnel, ~0.3 s of a 1.7 s batch) collapses to one.

    ``n_steps``/``n_rounds``/``nb``/``chunk_step`` are all TRACED; each
    round's sample count is n_steps * sub (pallas, ``step_samples`` must
    be 0) or n_steps * step_samples (jnp, ``sub`` must be 0) — so ONE
    compilation per buffer shape serves every round size in the schedule
    (remote compiles cost minutes each).
    """

    def counts_for(tag):
        if impl == "pallas":
            if mesh is not None:
                return _pallas_sharded_counts(
                    key, state.active, robot_wh, tag, n_steps,
                    sub=sub, mesh=mesh, shape_noise=shape_noise,
                    poly_a_keep=poly_a_keep,
                    ca_iters=ca_iters, ca_tol=ca_tol,
                )
            from collide2d_tpu.mc.moving import (
                MovingConfigs,
                MovingPolygonConfigs,
            )

            if isinstance(state.active, MovingConfigs):
                from collide2d_tpu.ops.mc_toi_pallas import (
                    mc_round_moving_pallas,
                )

                return mc_round_moving_pallas(
                    key, state.active, robot_wh, tag,
                    n_steps=n_steps, sub=sub, shape_noise=shape_noise,
                    ca_iters=ca_iters, tol=ca_tol,
                )
            if isinstance(state.active, MovingPolygonConfigs):
                from collide2d_tpu.ops.mc_moving_polygon_pallas import (
                    mc_round_moving_polygons_pallas,
                )

                return mc_round_moving_polygons_pallas(
                    key, state.active, robot_wh, tag,
                    n_steps=n_steps, sub=sub, a_keep=poly_a_keep,
                )
            if isinstance(state.active, PolygonConfigs):
                from collide2d_tpu.ops.mc_polygon_pallas import (
                    mc_round_polygons_pallas,
                )

                return mc_round_polygons_pallas(
                    key, state.active, robot_wh, tag,
                    n_steps=n_steps, sub=sub, a_keep=poly_a_keep,
                )
            from collide2d_tpu.ops.mc_pallas import mc_round_pallas

            return mc_round_pallas(
                key, state.active, robot_wh, tag,
                n_steps=n_steps, sub=sub, shape_noise=shape_noise,
            )
        if mesh is not None and _mesh_axis(mesh, "sample") > 1:
            return _sample_sharded_counts(
                key, state.uids, state.active, robot_wh, tag, n_steps,
                step_samples=step_samples, use_vertices=use_vertices,
                mesh=mesh, ca_iters=ca_iters, ca_tol=ca_tol,
            )
        # Config-only DP needs no shard_map: uid-keyed streams shard
        # transparently under GSPMD (bitwise-equal, test_sharding.py).
        return _mc_round_jnp(
            key, state.uids, state.active, robot_wh, tag, n_steps,
            step_samples=step_samples, use_vertices=use_vertices,
            ca_iters=ca_iters, ca_tol=ca_tol,
        )

    acc_b = jnp.asarray(accuracy_bins)
    bin_b = jnp.asarray(bin_accuracy)

    def one_round(r, carry):
        n_true, done, k_frozen, n_frozen = carry
        n_true = n_true + counts_for(chunk_offset + r * chunk_step)
        n_after = n_samples_after + r * nb
        conv = stats.is_converged(n_after, n_true, acc_b, bin_b)
        newly = jnp.logical_and(conv, jnp.logical_not(done))
        return (
            n_true,
            jnp.logical_or(done, conv),
            jnp.where(newly, n_true, k_frozen),
            jnp.where(newly, jnp.int32(n_after), n_frozen),
        )

    n_true, done, k_frozen, n_frozen = jax.lax.fori_loop(
        0, jnp.asarray(n_rounds, jnp.int32), one_round,
        (state.n_true, state.done, state.k_frozen, state.n_frozen),
    )
    new_state = _LoopState(
        uids=state.uids, active=state.active,
        n_true=n_true, done=done, k_frozen=k_frozen, n_frozen=n_frozen,
    )
    real = state.uids >= 0
    num_done = jnp.sum(jnp.logical_and(done, real).astype(jnp.int32))
    return new_state, num_done


# ---------------------------------------------------------------------------
# The host-side adaptive driver lives in collide2d_tpu.mc.driver (the
# scheduler + device-ops split, round-3 refactor). The names below remain
# importable from this module for backward compatibility.
# ---------------------------------------------------------------------------

_DRIVER_NAMES = (
    "adaptive_collision_probabilities",
    "AdaptiveRun",
    "AdaptiveScheduler",
    "_OutState",
    "_emit_to_out",
    "_flush_to_out",
    "_pack_active",
    "_ladder_buckets",
    "_round_up_bucket",
    "_warm_targets",
    "_warm_fused_round_compiles",
    "_save_checkpoint",
    "_load_checkpoint",
)


def __getattr__(name):  # PEP 562 lazy delegation (avoids a circular import)
    if name in _DRIVER_NAMES:
        from collide2d_tpu.mc import driver

        return getattr(driver, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
