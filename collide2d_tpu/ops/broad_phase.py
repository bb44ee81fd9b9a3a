"""Batched AABB broad phase — masked candidate pruning before SAT.

The reference has no broad phase (SAT runs on every pair); BASELINE.json
requires one for the k-gon configs. On TPU there is no compaction: the
broad phase emits a fixed-shape boolean candidate MASK, and callers either
skip narrow phase when the mask is statically empty-ish or feed the mask
into masked narrow-phase evaluation. AABB overlap is a necessary
condition for convex overlap, so pruning is exact (no false negatives).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.geometry import polygon_aabb


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
