"""Ray casting against convex polygons — half-plane clipping, exact.

The last core query of a collision engine's narrow phase (alongside the
boolean test, signed distance, manifolds, and TOI — all elsewhere in
`ops/`): where does a ray first hit a convex shape?

A convex polygon is the intersection of its face half-planes
``n_i . x <= o_i``; a ray ``x(t) = origin + t * direction`` is inside
face i's half-plane on a t-interval that is one linear inequality:

    n_i . origin + t (n_i . direction) <= o_i

so the hit set is the intersection of k half-lines — an (entry, exit)
window computed with one mul-add per face, no iteration (the same
window-intersection idea as `ops.toi`'s exact translation TOI, of which
a ray is the degenerate moving-point case; the two are cross-validated
in tests). Branch-free, O(k), jit/vmap/grad/shard-safe.

Conventions (Box2D-compatible where they overlap):
- returns ``(t, normal)``: ``t`` in ``[0, t_max]`` is the first-contact
  parameter, ``+inf`` = no hit within the horizon. ``normal`` is the
  UNIT outward normal of the entry face (the standard reflection/slide
  input); zero when there is no hit.
- a ray STARTING INSIDE the polygon returns ``t = 0`` with ``normal``
  = 0 (no well-defined entry face) — distinguishable from a boundary
  hit at t=0, whose normal is the face normal.
- padding follows `sat.sat_polygons` (repeat-last or ``mask``): a
  zero-length edge contributes the trivially-true constraint
  ``0 <= 0`` and never clips the window.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.geometry import edge_normals, rects_from_params
from collide2d_tpu.ops.sat import _normalize_padding


def polygon_raycast(
    origin: Array,
    direction: Array,
    polys: Array,
    mask: Array | None = None,
    *,
    t_max: float = jnp.inf,
) -> tuple[Array, Array]:
    """First hit of rays against convex CCW k-gons (elementwise pairs).

    ``origin``/``direction``: ``B + (2,)`` (direction need not be
    normalized — ``t`` is in units of ``|direction|``); ``polys``:
    ``B + (k, 2)``. Returns ``(t, normal)`` float32 ``B`` / ``B+(2,)``
    under the module conventions above.
    """
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    p = _normalize_padding(jnp.asarray(polys, jnp.float32), mask)

    n = edge_normals(p)  # B+(k,2), outward, unnormalized
    off = jnp.sum(n * p, axis=-1)  # B+(k,)
    no = (
        n[..., 0] * origin[..., None, 0] + n[..., 1] * origin[..., None, 1]
    )
    nd = (
        n[..., 0] * direction[..., None, 0]
        + n[..., 1] * direction[..., None, 1]
    )
    num = off - no  # constraint: t * nd <= num
    inf = jnp.float32(jnp.inf)

    entering = nd < 0
    leaving = nd > 0
    ratio = num / jnp.where(nd == 0, 1.0, nd)
    # Parallel faces (nd == 0): satisfied for all t when num >= 0,
    # violated for all t when num < 0 (encoded as an empty window). A
    # padding zero-normal face has num == 0 -> trivially satisfied.
    parallel_miss = (nd == 0) & (num < 0)
    lo_i = jnp.where(entering, ratio, jnp.where(parallel_miss, inf, -inf))
    hi_i = jnp.where(leaving, ratio, jnp.where(parallel_miss, -inf, inf))
    entry = jnp.max(lo_i, axis=-1)
    exit_ = jnp.min(hi_i, axis=-1)

    # A fully degenerate polygon (every face zero-length, e.g. a point)
    # constrains nothing — without this guard every ray would "hit" it
    # at t=0. No valid face -> no hit.
    any_face = jnp.any(jnp.sum(n * n, axis=-1) > 0, axis=-1)
    hit = (entry <= exit_) & (entry <= t_max) & (exit_ >= 0) & any_face
    inside = hit & (entry < 0)
    t = jnp.where(hit, jnp.maximum(entry, 0.0), inf)

    # Entry-face normal: the face whose lower bound IS the entry time
    # (argmax of lo_i; ties take the first, matching jnp.argmax). The
    # normals table broadcasts up to the ray batch (rays x shapes use
    # leading axes) before the gather.
    ia = jnp.argmax(lo_i, axis=-1)
    nb = jnp.broadcast_to(n, lo_i.shape + (2,))
    nw = jnp.take_along_axis(nb, ia[..., None, None], axis=-2)[..., 0, :]
    nn = jnp.sqrt(jnp.sum(nw * nw, axis=-1, keepdims=True))
    unit = nw / jnp.where(nn > 0, nn, 1.0)
    normal = jnp.where(
        (hit & ~inside)[..., None],
        unit,
        jnp.zeros_like(unit),
    )
    return t, normal


def rect_raycast(
    origin: Array, direction: Array, center, extents, angle,
    *, t_max: float = jnp.inf,
) -> tuple[Array, Array]:
    """`polygon_raycast` against oriented boxes in param form
    (`sat.obb_collide` parameterization; negative extents rectified)."""
    extents = jnp.abs(jnp.asarray(extents, jnp.float32))
    rect = rects_from_params(
        jnp.asarray(center, jnp.float32), extents,
        jnp.asarray(angle, jnp.float32),
    )
    return polygon_raycast(origin, direction, rect, t_max=t_max)


def scene_raycast(
    origin: Array,
    direction: Array,
    polys: Array,
    mask: Array | None = None,
    *,
    t_max: float = jnp.inf,
    impl: str = "jnp",
) -> tuple[Array, Array, Array]:
    """First hit of ONE ray (or a batch of rays) against a SET of
    shapes: broadcast `polygon_raycast` over the shape axis and argmin.

    ``origin``/``direction``: ``(2,)`` or ``(R, 2)``; ``polys``:
    ``(N, k, 2)``. Returns ``(t, index, normal)``: the earliest hit
    parameter (``+inf`` = nothing hit), the index of the hit shape
    (0 when nothing hit — check ``t``), and its entry normal. The
    raycast analogue of `scene.scene_collision_matrix`'s all-pairs
    broadcast; O(N k) per ray, dense and branch-free.

    ``impl``: 'jnp' (default — differentiable XLA path), 'pallas' (the
    fused `ops.raycast_pallas` kernel: scene tables VMEM-resident, rays
    streamed; values to f32 rounding of the same window math), or
    'auto' (pallas on TPU data). The fused kernel takes 1-D ray batches
    — other shapes fall back to the XLA path.
    """
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    if origin.ndim == 2 and direction.ndim == 2 and jnp.ndim(polys) == 3:
        from collide2d_tpu.mc.estimator import resolve_impl

        if resolve_impl(impl, origin) == "pallas":
            from collide2d_tpu.ops.raycast_pallas import (
                scene_raycast_pallas,
            )

            return scene_raycast_pallas(
                origin, direction, polys, mask, t_max=t_max
            )
    ts, normals = polygon_raycast(
        origin[..., None, :], direction[..., None, :], polys, mask,
        t_max=t_max,
    )  # (..., N), (..., N, 2)
    idx = jnp.argmin(ts, axis=-1)
    t = jnp.take_along_axis(ts, idx[..., None], axis=-1)[..., 0]
    normal = jnp.take_along_axis(
        normals, idx[..., None, None], axis=-2
    )[..., 0, :]
    return t, idx.astype(jnp.int32), normal
