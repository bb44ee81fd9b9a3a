"""Contact manifolds for convex pairs — reference/incident face clipping.

Beyond the reference's boolean `convex_collide` (utils.cu:159-184) and
this framework's witness-point queries (`ops.distance`): a physics or
contact-resolution consumer needs the full contact MANIFOLD — in 2D, up
to TWO contact points with per-point penetration depths plus a shared
contact normal (face-face contact between polygons is a line segment;
one point cannot represent the torque it transmits).

The construction is the classic reference/incident face clip (the same
one Box2D and every SAT-based 2D engine uses), recast branch-free for
the TPU's vector unit:

1. For every face of each body, the face SEPARATION is the gap between
   the face's supporting line and the other body's support point along
   the face normal. The minimum-penetration face (largest separation)
   over both bodies picks the contact axis — for overlapping convex
   polygons this is exactly the MTV axis of `ops.distance` (same
   theorem, per-face form).
2. The owner of that face is the REFERENCE body; the face on the other
   body whose outward normal is most anti-parallel to the reference
   normal is the INCIDENT face.
3. The incident edge segment is clipped against the two side planes of
   the reference face (Sutherland-Hodgman on one segment — two clips,
   each a lerp), then points above the reference face (separation >
   ``margin``) are discarded.

Everything is fixed-shape `argmax`/`where`/lerp arithmetic on the
``B+(k,2)`` vertex layout — no data-dependent control flow, safe under
jit/vmap/shard_map, O(k) per pair. Outputs are fixed-capacity (2 slots
+ a count), the TPU-native replacement for a dynamically-sized contact
list.

Padding follows `sat.sat_polygons`: repeat-last padded slots (or a
``mask``) add zero-length edges whose zero normals are excluded from
both the reference-face argmax and the incident-face argmin.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.distance import _gather_rows
from collide2d_tpu.ops.geometry import edge_normals, rects_from_params
from collide2d_tpu.ops.sat import _normalize_padding


def _unit_outward_normals(p: Array) -> tuple[Array, Array]:
    """Unit outward edge normals of a CCW polygon + validity mask.

    ``B+(k,2) -> (B+(k,2), B+(k,) bool)``; zero-length (padding) edges
    get a zero normal and ``valid=False``.
    """
    n = edge_normals(p)  # (ey, -ex): outward for CCW
    nrm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    valid = nrm[..., 0] > 0
    return n / jnp.where(nrm > 0, nrm, 1.0), valid


def _face_separations(p_ref: Array, p_inc: Array) -> tuple[Array, Array, Array]:
    """Per-face separation of ``p_inc`` from each face of ``p_ref``.

    Face i's supporting line passes through vertex i with unit outward
    normal n_i; the separation is ``min_j n_i . v_j - n_i . p_i`` over
    the other body's vertices (negative = the incident body crosses the
    face's line). Returns ``(sep B+(k,), normals B+(k,2), valid B+(k,))``
    with padded (zero-normal) faces forced to ``-inf`` separation so they
    never win the reference-face argmax.
    """
    n, valid = _unit_outward_normals(p_ref)
    off = jnp.sum(n * p_ref, axis=-1)  # B+(k,)
    # min over incident vertices of n_i . v_j : B+(k,)
    proj = (
        n[..., :, None, 0] * p_inc[..., None, :, 0]
        + n[..., :, None, 1] * p_inc[..., None, :, 1]
    )
    sep = jnp.min(proj, axis=-1) - off
    return jnp.where(valid, sep, -jnp.inf), n, valid


def _clip_segment(v1: Array, v2: Array, n: Array, off: Array):
    """Clip segment [v1, v2] to the half-plane ``n . x <= off``.

    All ``B+(2,)`` (``off``: ``B``). Returns the clipped ``(v1, v2)``;
    a segment entirely outside collapses to its less-violating endpoint
    (the caller's separation filter then discards it).
    """
    d1 = jnp.sum(n * v1, axis=-1) - off  # B
    d2 = jnp.sum(n * v2, axis=-1) - off
    denom = d1 - d2
    t = d1 / jnp.where(denom == 0, 1.0, denom)
    t = jnp.clip(t, 0.0, 1.0)
    crossing = (d1 > 0) != (d2 > 0)
    mid = v1 + t[..., None] * (v2 - v1)
    v1c = jnp.where(((d1 > 0) & crossing)[..., None], mid, v1)
    v2c = jnp.where(((d2 > 0) & crossing)[..., None], mid, v2)
    # Both endpoints outside: collapse to the closer one so the output
    # never contains fabricated interior points.
    both_out = (d1 > 0) & (d2 > 0)
    closer = jnp.where((d1 <= d2)[..., None], v1, v2)
    v1c = jnp.where(both_out[..., None], closer, v1c)
    v2c = jnp.where(both_out[..., None], closer, v2c)
    return v1c, v2c


def polygon_contact_manifold(
    p1: Array,
    p2: Array,
    mask1: Array | None = None,
    mask2: Array | None = None,
    *,
    margin: float = 0.0,
) -> tuple[Array, Array, Array, Array]:
    """Contact manifold of convex CCW k-gon pairs. Fixed-capacity output.

    Returns ``(count, points, depths, normal)``:

    - ``count``: int32 ``B`` — number of valid contact points (0..2).
      0 iff the minimum-penetration face separation exceeds ``margin``
      (disjoint beyond the margin) or clipping leaves no point within it.
    - ``points``: float32 ``B+(2,2)`` — contact points, slots past
      ``count`` hold the nearest clipped candidate (filter by count).
      Points lie on the INCIDENT face, clipped to the reference face's
      side planes (the standard convention: measured on the body being
      pushed out).
    - ``depths``: float32 ``B+(2,)`` — per-point penetration depth along
      ``normal`` (positive = penetrating, ``-margin`` at the margin
      boundary). For face-dominated (shallow) contacts
      ``max(depths[:count])`` equals the pair's penetration depth
      (== ``-polygon_signed_distance``) up to f32 rounding; deep
      diagonal penetrations can side-clip the deepest incident vertex
      away, leaving a strict lower bound (the same behavior as the
      classic Box2D clip).
    - ``normal``: float32 ``B+(2,)`` — unit contact normal pointing FROM
      body 1 INTO body 2 (the direction to translate body 2 by
      ``max depth`` to resolve penetration; matches the
      `distance.polygon_closest_points` overlap contract).

    ``margin > 0`` keeps speculative contacts: faces separated by up to
    ``margin`` still produce (negative-depth) manifold points, the usual
    input to a sequential-impulse solver's speculative phase.

    Same padding contract as `sat.sat_polygons` (repeat-last or
    ``mask``). Degenerate inputs: when BOTH bodies have no valid face
    (all zero-length edges) the manifold is empty (``count=0``); a
    degenerate point against a real polygon still contacts through the
    polygon's faces (the incident segment collapses to the point).
    """
    p1 = _normalize_padding(jnp.asarray(p1, jnp.float32), mask1)
    p2 = _normalize_padding(jnp.asarray(p2, jnp.float32), mask2)
    # The reference/incident selects below need a common k; repeat-pad
    # the smaller side (exactly the module's padding convention).
    k = max(p1.shape[-2], p2.shape[-2])

    def pad_to_k(p):
        short = k - p.shape[-2]
        if short == 0:
            return p
        tail = jnp.broadcast_to(
            p[..., -1:, :], p.shape[:-2] + (short, 2)
        )
        return jnp.concatenate([p, tail], axis=-2)

    p1, p2 = pad_to_k(p1), pad_to_k(p2)

    sep1, n1, _ = _face_separations(p1, p2)  # faces of 1 vs verts of 2
    sep2, n2, _ = _face_separations(p2, p1)
    i1 = jnp.argmax(sep1, axis=-1)  # best (least penetrating) face of 1
    i2 = jnp.argmax(sep2, axis=-1)
    s1 = jnp.take_along_axis(sep1, i1[..., None], axis=-1)[..., 0]
    s2 = jnp.take_along_axis(sep2, i2[..., None], axis=-1)[..., 0]
    # Reference = the body whose best face penetrates least. Small
    # relative bias toward body 1 keeps the choice stable when both
    # separations are equal (e.g. axis-aligned box stacks).
    ref_is_1 = s1 >= s2 - 1e-6 * jnp.maximum(jnp.abs(s2), 1.0)
    best_sep = jnp.where(ref_is_1, s1, s2)

    def pick(cond, a, b):
        return jnp.where(cond[..., None], a, b)

    i_ref = jnp.where(ref_is_1, i1, i2)
    n_ref = pick(ref_is_1, _gather_rows(n1, i1), _gather_rows(n2, i2))
    p_ref = jnp.where(ref_is_1[..., None, None], p1, p2)
    p_inc = jnp.where(ref_is_1[..., None, None], p2, p1)
    n_inc_all = jnp.where(ref_is_1[..., None, None], n2, n1)

    # Incident face: most anti-parallel VALID face of the other body.
    inc_valid = jnp.sum(n_inc_all * n_inc_all, axis=-1) > 0
    align = jnp.sum(n_inc_all * n_ref[..., None, :], axis=-1)
    align = jnp.where(inc_valid, align, jnp.inf)
    j = jnp.argmin(align, axis=-1)
    k_inc = p_inc.shape[-2]
    v1 = _gather_rows(p_inc, j)
    v2 = _gather_rows(p_inc, (j + 1) % k_inc)

    # Reference face endpoints and side planes. Side plane normals are
    # the face tangent +- t; a point is kept when it projects inside the
    # face's extent along t.
    k_ref = p_ref.shape[-2]
    r1 = _gather_rows(p_ref, i_ref)
    r2 = _gather_rows(p_ref, (i_ref + 1) % k_ref)
    t = jnp.stack([-n_ref[..., 1], n_ref[..., 0]], axis=-1)  # face tangent
    v1, v2 = _clip_segment(v1, v2, -t, -jnp.sum(t * r1, axis=-1))
    v1, v2 = _clip_segment(v1, v2, t, jnp.sum(t * r2, axis=-1))

    off = jnp.sum(n_ref * r1, axis=-1)
    d1 = off - jnp.sum(n_ref * v1, axis=-1)  # depth: + = below ref face
    d2 = off - jnp.sum(n_ref * v2, axis=-1)
    keep1 = d1 >= -margin
    keep2 = d2 >= -margin
    # The whole pair is disjoint beyond the margin -> empty manifold.
    # best_sep == -inf means NO valid face existed on either body (fully
    # degenerate all-zero-edge input): the documented contract is an
    # empty manifold, not count=2 along a zero normal.
    pair_ok = (best_sep <= margin) & jnp.isfinite(best_sep)
    keep1 &= pair_ok
    keep2 &= pair_ok
    # Pack valid points first (slot order is otherwise arbitrary).
    swap = (~keep1) & keep2
    pa = jnp.where(swap[..., None], v2, v1)
    pb = jnp.where(swap[..., None], v1, v2)
    da = jnp.where(swap, d2, d1)
    db = jnp.where(swap, d1, d2)
    count = keep1.astype(jnp.int32) + keep2.astype(jnp.int32)

    points = jnp.stack([pa, pb], axis=-2)
    depths = jnp.stack([da, db], axis=-1)
    # Normal from body 1 into body 2: the reference normal points out of
    # the reference body (into the incident one), so flip when the
    # reference body is body 2.
    normal = jnp.where(ref_is_1[..., None], n_ref, -n_ref)
    return count, points, depths, normal


def rect_contact_manifold(
    c1, ext1, th1, c2, ext2, th2, *, margin: float = 0.0
) -> tuple[Array, Array, Array, Array]:
    """`polygon_contact_manifold` for oriented boxes in param form.

    Parameters as `sat.obb_collide` (centers, FULL extents, angles;
    negative extents rectified via abs()).
    """
    ext1 = jnp.abs(jnp.asarray(ext1, jnp.float32))
    ext2 = jnp.abs(jnp.asarray(ext2, jnp.float32))
    r1 = rects_from_params(jnp.asarray(c1, jnp.float32), ext1, th1)
    r2 = rects_from_params(jnp.asarray(c2, jnp.float32), ext2, th2)
    return polygon_contact_manifold(r1, r2, margin=margin)
