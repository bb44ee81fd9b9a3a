"""Signed distance between convex shapes — fixed runtime, branch free.

Beyond the reference's boolean `convex_collide` (utils.cu:159-184):
planners consuming the generated datasets usually want *clearance*
(how far from collision) and *penetration depth* (how deep inside),
not just the label. For convex sets both are one number — the signed
distance

    d(A, B) = max_{|u|=1} ( min_{b in B} u.b  -  max_{a in A} u.a )

(the support-gap function): positive = separation distance, negative =
-(penetration depth), zero = touching. For convex polygons the maximizer
is known in closed form:

- overlapping (all gaps negative): the optimum direction is an edge
  normal of the Minkowski difference, i.e. an edge normal of A or B —
  exactly the SAT axis set (the minimum-translation-vector theorem);
- disjoint: the closest-feature pair is vertex-vertex or vertex-edge,
  so the distance is the minimum over all (vertex of one, edge segment
  of the other) point-segment distances.

Both sides are fixed-shape, O(k^2) elementwise work — VPU-friendly, no
data-dependent control flow, safe under jit/vmap/grad/shard_map. The
functions are differentiable everywhere the distance is smooth (the
min/max subgradients pick one active feature at ties), so `jax.grad`
gives the contact normal direction for gradient-based planners.

Padding follows `sat.sat_polygons`' repeat-last convention (or pass a
``mask``): a repeated vertex adds a zero-length edge, which contributes
a zero axis (masked out of the overlap side) and a degenerate segment
whose point-segment distance reduces to the duplicate vertex's — never
below the true minimum. Touching shapes return 0 up to f32 rounding of
the two formulations (the sign can land either side within ~1 ulp of
the support gap; both branches return ~0 there).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.geometry import edge_normals, rects_from_params
from collide2d_tpu.ops.sat import _normalize_padding, _project_all


def _support_gap_over_normals(p1: Array, p2: Array) -> Array:
    """max over +-(edge normals of both) of the normalized support gap.

    Negative value = -(penetration depth) exactly (MTV theorem);
    non-negative value = the polygons are disjoint (it is then only a
    LOWER bound on the separation distance — the vertex-vertex maximizer
    need not be an edge normal).  ``B+(k,2) x B+(k,2) -> B``.
    """
    axes = jnp.concatenate([edge_normals(p1), edge_normals(p2)], axis=-2)
    nrm = jnp.sqrt(jnp.sum(axes * axes, axis=-1))  # B+(a,)
    proj1 = _project_all(axes, p1)  # B+(a,k1)
    proj2 = _project_all(axes, p2)
    min1, max1 = jnp.min(proj1, -1), jnp.max(proj1, -1)
    min2, max2 = jnp.min(proj2, -1), jnp.max(proj2, -1)
    # gap along +u and -u; normalize with a zero-safe divide and drop
    # zero axes (padding edges) from the max — a zero axis separates
    # nothing and carries no direction.
    gap = jnp.maximum(min2 - max1, min1 - max2) / jnp.where(nrm > 0, nrm, 1.0)
    gap = jnp.where(nrm > 0, gap, -jnp.inf)
    return jnp.max(gap, axis=-1)


def _vertex_segment_min(p: Array, q: Array) -> Array:
    """min over (vertex of p, closed edge segment of q) distances.

    ``B+(k1,2) x B+(k2,2) -> B``. Degenerate (zero-length) segments fall
    back to the point distance via the clamped-parameter safe divide.
    """
    a = q  # segment starts           B+(k2,2)
    e = jnp.roll(q, shift=-1, axis=-2) - q  # segment vectors  B+(k2,2)
    # pairwise v - a: B+(k1,k2,2)
    d = p[..., :, None, :] - a[..., None, :, :]
    ee = jnp.sum(e * e, axis=-1)[..., None, :]  # B+(1,k2)
    t = jnp.sum(d * e[..., None, :, :], axis=-1) / jnp.where(ee > 0, ee, 1.0)
    t = jnp.clip(t, 0.0, 1.0) * (ee > 0)
    c = d - t[..., None] * e[..., None, :, :]
    dist2 = jnp.sum(c * c, axis=-1)  # B+(k1,k2)
    return jnp.sqrt(jnp.min(dist2, axis=(-2, -1)))


def polygon_signed_distance(
    p1: Array,
    p2: Array,
    mask1: Array | None = None,
    mask2: Array | None = None,
) -> Array:
    """Signed distance between convex k-gon pairs. float32 ``B``.

    Positive: separation distance (minimum distance between boundaries).
    Negative: -(penetration depth) — the norm of the minimum translation
    that separates the shapes. Zero: touching. Exact for convex input
    (same contract as `sat.sat_polygons`: CCW convex vertices,
    repeat-last padding or a ``mask``); sign agrees with
    `sat_polygons`' label away from the measure-zero touching set.
    """
    p1 = _normalize_padding(jnp.asarray(p1, jnp.float32), mask1)
    p2 = _normalize_padding(jnp.asarray(p2, jnp.float32), mask2)
    gap = _support_gap_over_normals(p1, p2)
    sep = jnp.minimum(
        _vertex_segment_min(p1, p2), _vertex_segment_min(p2, p1)
    )
    return jnp.where(gap < 0, gap, sep)


def rect_signed_distance(c1, ext1, th1, c2, ext2, th2) -> Array:
    """Signed distance between oriented boxes, param form. float32 ``B``.

    Parameters as `sat.obb_collide` (centers, FULL extents, angles);
    negative extents are rectified via abs() to match its inverted-
    rectangle behavior. Routes through the exact polygon path on the
    materialized k=4 vertices.
    """
    ext1 = jnp.abs(jnp.asarray(ext1, jnp.float32))
    ext2 = jnp.abs(jnp.asarray(ext2, jnp.float32))
    r1 = rects_from_params(jnp.asarray(c1, jnp.float32), ext1, th1)
    r2 = rects_from_params(jnp.asarray(c2, jnp.float32), ext2, th2)
    return polygon_signed_distance(r1, r2)
