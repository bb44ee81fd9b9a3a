"""Batched AABB broad phase — candidate pruning before narrow-phase SAT.

The reference has no broad phase (SAT runs on every pair,
generate_dataset.cu:238-242); BASELINE.json requires one for the k-gon
configs. Two TPU-native forms:

1. `candidate_mask` — a fixed-shape boolean mask (AABB overlap is a
   necessary condition for convex overlap, so pruning is exact: SAT with
   edge normals returns 0 for every AABB-disjoint pair anyway).
2. The COMPACTION path, `collide_polygons_pruned` — gather the candidate
   pairs into a power-of-two bucket (static shape per bucket size, so a
   handful of compilations serve any density), run narrow-phase SAT on
   the bucket only, and scatter labels back, bit-identical to the
   unpruned path.

Measured reality check (axon TPU, 1M k=8 pairs, 3% density): the FULL
narrow phase costs 3.3 ms (1.3 ms after the unrolled sat_polygons
rewrite), the AABB mask alone 0.15 ms — but XLA's element-level
compaction costs an order of magnitude more than it saves (flatnonzero
9.4 ms, 65k-row gather 4.9 ms, scatter-based compaction 16 ms). For a ~1e2-flop/pair narrow phase, DENSE MASKED EXECUTION IS THE
TPU-OPTIMAL STRATEGY; that is why the adaptive estimator compacts on the
HOST between rounds instead. Broad-phase pruning pays wall-clock where
the per-candidate work dwarfs one data pass — the Monte-Carlo
probability path (thousands of samples per pair), where
`mc.estimator.collision_probability_pruned` compacts once per call and
wins ~1/density (see `utils/benchmarks.py::bench_broad_phase`). Use
`collide_polygons_pruned` for its fixed-shape semantics (exactness
tests, label-subset extraction), not as a SAT speedup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.geometry import polygon_aabb
from collide2d_tpu.ops.sat import sat_polygons


def aabb_overlap(lo1: Array, hi1: Array, lo2: Array, hi2: Array) -> Array:
    """Elementwise AABB overlap test. ``lo/hi``: ``B + (2,)``. Bool ``B``.

    Touching boxes count as overlapping (``<=``), consistent with the
    narrow phase's touching-collides convention (utils.cu:178 strict <).
    """
    return jnp.all(jnp.logical_and(lo1 <= hi2, lo2 <= hi1), axis=-1)


def candidate_mask(
    p1: Array,
    p2: Array,
    mask1: Array | None = None,
    mask2: Array | None = None,
) -> Array:
    """Broad-phase candidate mask for batched polygon pairs.

    ``p1``/``p2``: ``B + (k, 2)`` vertices (optionally padded, with vertex
    masks). Returns bool ``B``: True where the pair's AABBs overlap and
    narrow-phase SAT must run. Guaranteed superset of true collisions.
    """
    lo1, hi1 = polygon_aabb(p1, mask1)
    lo2, hi2 = polygon_aabb(p2, mask2)
    return aabb_overlap(lo1, hi1, lo2, hi2)


def possible_collision_mask(configs, robot_wh, sigma_margin: float = 6.0):
    """Conservative noise-aware broad phase for MC configurations.

    True where the robot and the noisy obstacle COULD touch given every
    Gaussian draw stays within ``sigma_margin`` standard deviations:
    circumscribed-circle test with the obstacle radius inflated by the
    shape noise and the center reach by the position noise. False
    implies P(collide) <= ~5 * P(|z| > sigma_margin) (~1e-8 at 6 sigma)
    — far below any accuracy bin of the reference schedule
    (generate_dataset.cu:58-59), so pruned configurations may be labeled
    cp = 0 without sampling.

    ``configs``: an `mc.estimator.Configs` batch (``robot_wh`` = (2,)
    width/height) or an `mc.estimator.PolygonConfigs` batch (``robot_wh``
    = (K2, 2) robot vertices; the circumscribed radii come from the
    vertex norms — exact for rotation about the origin, which is how the
    noise model rotates both bodies). Returns bool (C,).
    """
    robot = jnp.asarray(robot_wh, jnp.float32)
    sd = configs.std_dev
    if hasattr(configs, "obstacle_verts"):
        r_rob = jnp.max(jnp.hypot(robot[..., 0], robot[..., 1]), axis=-1)
        v = configs.obstacle_verts
        r_obs = jnp.max(jnp.hypot(v[..., 0], v[..., 1]), axis=-1)
    else:
        r_rob = 0.5 * jnp.hypot(robot[..., 0], robot[..., 1])
        ow = jnp.abs(configs.obstacle_wh[:, 0]) + sigma_margin * sd[:, 3]
        oh = jnp.abs(configs.obstacle_wh[:, 1]) + sigma_margin * sd[:, 4]
        r_obs = 0.5 * jnp.hypot(ow, oh)
    reach = sigma_margin * jnp.hypot(sd[:, 0], sd[:, 1])
    if hasattr(configs, "velocity"):
        # MovingConfigs (mc.moving): the robot's center travels at most
        # |v| * t_max during the motion; rotation about its own center
        # never grows the circumscribed ball, so this is the full extra
        # reach and the prune stays conservative for trajectory labels.
        reach = reach + (
            jnp.hypot(configs.velocity[:, 0], configs.velocity[:, 1])
            * jnp.abs(configs.t_max)
        )
    dist = jnp.hypot(configs.position[:, 0], configs.position[:, 1])
    return dist <= r_rob + r_obs + reach


@functools.partial(jax.jit, static_argnames=("bucket",))
def collide_candidates(
    p1: Array,
    p2: Array,
    cand: Array,
    mask1: Array | None = None,
    mask2: Array | None = None,
    *,
    bucket: int,
) -> Array:
    """Narrow phase on a compacted candidate bucket, scattered back.

    Jittable static-shape core of the pruned path: gathers the first
    ``bucket`` candidate indices (callers guarantee the candidate count
    fits — see `collide_polygons_pruned`), runs `sat_polygons` on the
    bucket, and scatters labels into a zero-initialized (N,) output.
    Gathered pairs see bit-identical elementwise math to the full path,
    so labels equal the unpruned `sat_polygons` bit-for-bit.
    """
    n = cand.shape[0]
    idx = jnp.flatnonzero(cand, size=bucket, fill_value=0)
    slot_valid = jnp.arange(bucket) < jnp.sum(cand, dtype=jnp.int32)
    sub = sat_polygons(
        jnp.take(p1, idx, axis=0),
        jnp.take(p2, idx, axis=0),
        None if mask1 is None else jnp.take(mask1, idx, axis=0),
        None if mask2 is None else jnp.take(mask2, idx, axis=0),
    )
    sub = jnp.where(slot_valid, sub, 0)
    # Fill slots all point at row 0 with value 0; .max keeps row 0's real
    # label when it is a genuine candidate.
    return jnp.zeros((n,), jnp.int32).at[idx].max(sub)


def bucket_for(count: int, n: int, min_bucket: int = 1024) -> int:
    """Smallest power-of-two bucket >= count (>= min_bucket), capped at n.

    Power-of-two buckets keep the number of distinct compiled shapes
    logarithmic in N — the same halving/doubling discipline as the
    adaptive estimator's repack buckets (mc/estimator.py).
    """
    b = min_bucket
    while b < count:
        b *= 2
    return min(b, n)


def collide_polygons_pruned(
    p1: Array,
    p2: Array,
    mask1: Array | None = None,
    mask2: Array | None = None,
    *,
    min_bucket: int = 1024,
) -> Array:
    """AABB broad phase -> compacted narrow phase -> scattered labels.

    The batch-level pruning the reference lacks: SAT runs only on pairs
    whose AABBs overlap. Output is bit-identical to plain
    ``sat_polygons(p1, p2, mask1, mask2)`` (AABB-disjoint pairs are
    provably non-colliding, and candidates see identical arithmetic).
    Costs one host sync for the candidate count; when candidates exceed
    n/2 the full narrow phase is cheaper than gather+scatter and is used
    directly.
    """
    n = p1.shape[0]
    cand = candidate_mask(p1, p2, mask1, mask2)
    n_cand = int(jax.device_get(jnp.sum(cand, dtype=jnp.int32)))
    bucket = bucket_for(n_cand, n, min_bucket)
    if 2 * bucket >= n:
        return sat_polygons(p1, p2, mask1, mask2)
    return collide_candidates(p1, p2, cand, mask1, mask2, bucket=bucket)
