"""Broad phase: AABB pruning is exact (no false negatives) and effective."""

import numpy as np
import jax.numpy as jnp

from collide2d_tpu.ops.broad_phase import aabb_overlap, candidate_mask
from collide2d_tpu.ops.sat import sat_rects
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
