"""Broad phase: AABB pruning is exact (no false negatives) and effective."""

import numpy as np
import jax
import jax.numpy as jnp

from collide2d_tpu.ops.broad_phase import (
    aabb_overlap,
    bucket_for,
    candidate_mask,
    collide_candidates,
    collide_polygons_pruned,
)
from collide2d_tpu.ops.sat import sat_polygons, sat_rects
from tests.conftest import random_rect_params, oracle_vertices


def test_aabb_overlap_basics():
    lo1 = jnp.asarray([[0.0, 0.0]])
    hi1 = jnp.asarray([[2.0, 2.0]])
    # touching counts as overlap
    assert bool(aabb_overlap(lo1, hi1, jnp.asarray([[2.0, 0.0]]), jnp.asarray([[3.0, 1.0]]))[0])
    assert not bool(
        aabb_overlap(lo1, hi1, jnp.asarray([[2.1, 0.0]]), jnp.asarray([[3.0, 1.0]]))[0]
    )


def test_candidate_mask_superset_of_collisions(rng):
    n = 4000
    V1 = oracle_vertices(*random_rect_params(rng, n))
    V2 = oracle_vertices(*random_rect_params(rng, n))
    mask = np.array(candidate_mask(jnp.asarray(V1), jnp.asarray(V2)))
    hit = np.array(sat_rects(jnp.asarray(V1), jnp.asarray(V2))).astype(bool)
    # exactness: every true collision is a candidate
    assert not (hit & ~mask).any()
    # effectiveness: prunes a substantial fraction of non-candidates
    assert mask.mean() < 0.8


def _sparse_polygons(rng, n, k=6, area_side=18.0):
    """Random convex k-gons (scaled rotated regular k-gons), sparse."""
    centers = rng.uniform(0, area_side, (n, 1, 2)).astype(np.float32)
    radius = rng.uniform(0.5, 1.0, (n, 1, 1)).astype(np.float32)
    rot = rng.uniform(0, 2 * np.pi, (n, 1)).astype(np.float32)
    ang = rot + np.arange(k, dtype=np.float32) * (2 * np.pi / k)
    ring = np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)
    return jnp.asarray(centers + radius * ring)


def test_pruned_labels_bitwise_equal_full(rng):
    n = 4096
    p1 = _sparse_polygons(rng, n)
    p2 = _sparse_polygons(rng, n)
    full = np.array(sat_polygons(p1, p2))
    pruned = np.array(collide_polygons_pruned(p1, p2, min_bucket=64))
    assert np.array_equal(full, pruned)
    # the workload really is sparse (the case where pruning pays)
    density = float(np.array(candidate_mask(p1, p2)).mean())
    assert density < 0.25, density
    assert full.sum() > 0  # non-degenerate: some collisions exist


def test_pruned_labels_with_vertex_masks(rng):
    n = 1024
    k = 6
    p1 = _sparse_polygons(rng, n, k=k)
    p2 = _sparse_polygons(rng, n, k=k)
    # mask out the last vertex (pentagon in a 6-slot layout)
    m = jnp.asarray(np.arange(k) < k - 1).reshape(1, k).repeat(n, axis=0)
    full = np.array(sat_polygons(p1, p2, m, m))
    pruned = np.array(collide_polygons_pruned(p1, p2, m, m, min_bucket=64))
    assert np.array_equal(full, pruned)


def test_pruned_edge_cases(rng):
    n = 256
    # zero candidates: far-apart batches
    p1 = _sparse_polygons(rng, n, area_side=5.0)
    p2 = _sparse_polygons(rng, n, area_side=5.0) + 1000.0
    out = np.array(collide_polygons_pruned(p1, p2, min_bucket=8))
    assert out.shape == (n,) and not out.any()
    # all candidates: identical batches -> falls back to full narrow phase
    out2 = np.array(collide_polygons_pruned(p1, p1, min_bucket=8))
    assert out2.all()
    # row 0 a genuine candidate: scatter via .at[].max keeps its label
    cand = candidate_mask(p1, p1)
    assert bool(cand[0])
    lab = np.array(collide_candidates(p1, p1, cand, bucket=n))
    assert np.array_equal(lab, np.array(sat_polygons(p1, p1)))


def test_possible_collision_mask_conservative(rng):
    # every config with a nonzero MC estimate must be a candidate
    from collide2d_tpu.mc.estimator import collision_probability
    from collide2d_tpu.ops.broad_phase import possible_collision_mask
    from collide2d_tpu.utils.benchmarks import _sparse_scene_configs

    cfgs = _sparse_scene_configs(2048, box=20.0, seed=3)
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    mask = np.asarray(possible_collision_mask(cfgs, robot))
    cp = np.asarray(collision_probability(jax.random.PRNGKey(0), cfgs, robot, 512))
    assert not ((cp > 0) & ~mask).any()   # no false negatives
    assert 0.01 < mask.mean() < 0.5       # and genuinely sparse


def test_collision_probability_pruned_bitwise(rng):
    from collide2d_tpu.mc.estimator import (
        collision_probability,
        collision_probability_pruned,
    )
    from collide2d_tpu.ops.broad_phase import possible_collision_mask
    from collide2d_tpu.utils.benchmarks import _sparse_scene_configs

    cfgs = _sparse_scene_configs(1024, box=20.0, seed=4)
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    key = jax.random.PRNGKey(7)
    full = np.asarray(collision_probability(key, cfgs, robot, 1024))
    pruned = collision_probability_pruned(key, cfgs, robot, 1024)
    mask = np.asarray(possible_collision_mask(cfgs, robot))
    # candidates: uid-keyed streams make compaction a value-level no-op
    np.testing.assert_array_equal(pruned[mask], full[mask])
    # non-candidates: labeled 0 without sampling; the full run agrees
    # (P(6-sigma excursion) ~ 1e-9 per draw)
    assert (pruned[~mask] == 0).all()
    np.testing.assert_array_equal(full[~mask], 0)


def test_collision_probability_pruned_empty(rng):
    from collide2d_tpu.mc.estimator import Configs, collision_probability_pruned

    n = 64
    cfgs = Configs(
        position=jnp.full((n, 2), 1000.0),
        pose_theta=jnp.zeros((n,)),
        obstacle_wh=jnp.ones((n, 2)),
        std_dev=jnp.full((n, 5), 0.1),
    )
    out = collision_probability_pruned(
        jax.random.PRNGKey(0), cfgs, jnp.asarray([4.07, 1.74]), 256
    )
    assert out.shape == (n,) and not out.any()


def test_bucket_for():
    assert bucket_for(0, 1 << 20) == 1024
    assert bucket_for(1025, 1 << 20) == 2048
    assert bucket_for(10**9, 1 << 20) == 1 << 20
    assert bucket_for(3, 16, min_bucket=2) == 4
