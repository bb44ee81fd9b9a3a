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


def _vertex_segment_candidates(p: Array, q: Array) -> tuple[Array, Array]:
    """Per-(vertex of p, closed edge segment of q) squared distances and
    the closest point ON q's segment. ``B+(k1,2) x B+(k2,2) ->
    (B+(k1,k2), B+(k1,k2,2))``.

    The dist2 expression is op-for-op `_vertex_segment_min`'s (c = d - t*e,
    sum(c*c)) so reductions over it reproduce that function bitwise; the
    closest point is recovered as vertex - c.
    """
    a = q
    e = jnp.roll(q, shift=-1, axis=-2) - q
    d = p[..., :, None, :] - a[..., None, :, :]
    ee = jnp.sum(e * e, axis=-1)[..., None, :]
    t = jnp.sum(d * e[..., None, :, :], axis=-1) / jnp.where(ee > 0, ee, 1.0)
    t = jnp.clip(t, 0.0, 1.0) * (ee > 0)
    c = d - t[..., None] * e[..., None, :, :]
    dist2 = jnp.sum(c * c, axis=-1)
    closest_on_q = p[..., :, None, :] - c
    return dist2, closest_on_q


def _gather_rows(x: Array, idx: Array) -> Array:
    """Gather one row along axis -2: ``B+(n,2), B -> B+(2,)``."""
    return jnp.take_along_axis(x, idx[..., None, None], axis=-2)[..., 0, :]


def polygon_closest_points(
    p1: Array,
    p2: Array,
    mask1: Array | None = None,
    mask2: Array | None = None,
) -> tuple[Array, Array, Array, Array]:
    """Witness points and contact normal for convex k-gon pairs.

    Returns ``(dist, pa, pb, normal)``: ``dist`` is float32 ``B``
    (numerically identical to `polygon_signed_distance` — same formulas,
    same rounding), the others float32 ``B+(2,)``:

    - disjoint (dist > 0): ``pa``/``pb`` are the closest boundary points
      of A/B (a vertex of one, a point on an edge of the other), and
      ``pb - pa = dist * normal`` with ``normal`` the unit direction
      from A's witness toward B's.
    - overlapping (dist < 0): ``normal`` is the minimum-translation
      direction — translating B by ``-dist * normal`` resolves the
      penetration exactly (MTV theorem). ``pb`` is B's deepest vertex
      along ``-normal``; ``pa = pb - dist * normal`` is its image on A's
      supporting line along ``normal``, so the identity
      ``pb - pa = dist * normal`` holds in both regimes.
    - touching (dist == 0 up to rounding): the overlap-branch witness at
      ~zero depth (``pa ~= pb``).

    The unifying contract — pinned by tests — is that translating B by
    ``-dist * normal`` brings the pair into touching contact. The
    minimizer is not always unique (a vertex-vertex closest pair is a
    witness on both candidate sides with exactly equal distance), and at
    such ties WHICH witness is returned may vary with compilation
    (jit fusion reorders the tie-breaking comparison) — only ``dist``
    and the contract above are stable. Witness
    selection goes through argmin/argmax gathers (piecewise constant):
    differentiate `polygon_signed_distance` for smooth contact normals;
    use this for the discrete witness features themselves. Same padding
    contract as `sat.sat_polygons` (repeat-last or ``mask``). Beyond the
    reference's boolean `convex_collide` (utils.cu:159-184).
    """
    p1 = _normalize_padding(jnp.asarray(p1, jnp.float32), mask1)
    p2 = _normalize_padding(jnp.asarray(p2, jnp.float32), mask2)
    k1, k2 = p1.shape[-2], p2.shape[-2]

    # Scalar distance: the exact `polygon_signed_distance` computation,
    # with the candidate tables kept for the witness gathers below. The
    # per-orientation gap table `g` is built once (same expressions, same
    # op order as `_support_gap_over_normals`, so `gap` is bitwise that
    # function's value) and reused by the overlap-witness argmax.
    axes = jnp.concatenate([edge_normals(p1), edge_normals(p2)], axis=-2)
    nrm = jnp.sqrt(jnp.sum(axes * axes, axis=-1))
    proj1 = _project_all(axes, p1)
    proj2 = _project_all(axes, p2)
    g_pos = jnp.min(proj2, -1) - jnp.max(proj1, -1)  # gap along +axis
    g_neg = jnp.min(proj1, -1) - jnp.max(proj2, -1)  # gap along -axis
    g = jnp.maximum(g_pos, g_neg) / jnp.where(nrm > 0, nrm, 1.0)
    g = jnp.where(nrm > 0, g, -jnp.inf)
    gap = jnp.max(g, axis=-1)
    d2_12, on2 = _vertex_segment_candidates(p1, p2)  # A-vertex vs B-edge
    d2_21, on1 = _vertex_segment_candidates(p2, p1)  # B-vertex vs A-edge
    s12 = jnp.sqrt(jnp.min(d2_12, axis=(-2, -1)))
    s21 = jnp.sqrt(jnp.min(d2_21, axis=(-2, -1)))
    sep = jnp.minimum(s12, s21)
    dist = jnp.where(gap < 0, gap, sep)

    # Disjoint witness: argmin over both candidate sides.
    batch = d2_12.shape[:-2]
    i12 = jnp.argmin(d2_12.reshape(*batch, k1 * k2), axis=-1)
    i21 = jnp.argmin(d2_21.reshape(*batch, k2 * k1), axis=-1)
    pa_12 = _gather_rows(p1, i12 // k2)  # vertex of A
    pb_12 = _gather_rows(on2.reshape(*batch, k1 * k2, 2), i12)
    pb_21 = _gather_rows(p2, i21 // k1)  # vertex of B
    pa_21 = _gather_rows(on1.reshape(*batch, k2 * k1, 2), i21)
    use12 = (s12 <= s21)[..., None]
    pa_dis = jnp.where(use12, pa_12, pa_21)
    pb_dis = jnp.where(use12, pb_12, pb_21)
    n_dis = (pb_dis - pa_dis) / jnp.where(sep > 0, sep, 1.0)[..., None]

    # Overlap witness: the maximizing SAT axis (the MTV direction) and
    # B's support vertex along its negation, from the gap table above.
    ia = jnp.argmax(g, axis=-1)

    def at_ia(x):
        return jnp.take_along_axis(x, ia[..., None], axis=-1)[..., 0]

    sign = jnp.where(at_ia(g_pos) >= at_ia(g_neg), 1.0, -1.0)
    axis_w = _gather_rows(axes, ia)
    nrm_w = jnp.where(at_ia(nrm) > 0, at_ia(nrm), 1.0)
    u = sign[..., None] * axis_w / nrm_w[..., None]
    # B's support vertex along -u = argmin of the (signed) projection.
    proj2_w = jnp.take_along_axis(
        proj2, ia[..., None, None], axis=-2
    )[..., 0, :]
    jb = jnp.argmin(sign[..., None] * proj2_w, axis=-1)
    pb_ov = _gather_rows(p2, jb)
    pa_ov = pb_ov - gap[..., None] * u

    overlap = (gap < 0)[..., None]
    pa = jnp.where(overlap, pa_ov, pa_dis)
    pb = jnp.where(overlap, pb_ov, pb_dis)
    # At exact touch (gap == 0, sep ~ 0) the disjoint normal is 0/eps
    # garbage; the MTV axis is the meaningful contact normal there.
    normal = jnp.where((gap <= 0)[..., None], u, n_dis)
    return dist, pa, pb, normal


def rect_closest_points(
    c1, ext1, th1, c2, ext2, th2
) -> tuple[Array, Array, Array, Array]:
    """`polygon_closest_points` for oriented boxes in param form.

    Parameters as `sat.obb_collide` (centers, FULL extents, angles;
    negative extents rectified via abs()). Returns (dist, pa, pb,
    normal) with the identity ``pb - pa = dist * normal``.
    """
    ext1 = jnp.abs(jnp.asarray(ext1, jnp.float32))
    ext2 = jnp.abs(jnp.asarray(ext2, jnp.float32))
    r1 = rects_from_params(jnp.asarray(c1, jnp.float32), ext1, th1)
    r2 = rects_from_params(jnp.asarray(c2, jnp.float32), ext2, th2)
    return polygon_closest_points(r1, r2)


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
