"""Core 2D geometry primitives, vectorized for TPU.

Vertex layout contract (shared with the on-disk dataset semantics of the
reference, see ``utils.cu:119-130`` `create_rect`): a rectangle of width
``w`` and height ``h`` centered at the origin is the 4 counter-clockwise
vertices starting at the bottom-left corner::

    (-w/2, -h/2), (w/2, -h/2), (w/2, h/2), (-w/2, h/2)

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap-safe (static shapes, no Python control flow on traced values).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

# (4, 2) unit square corner signs, CCW from bottom-left — the vertex-layout
# contract of the reference's create_rect (utils.cu:119-130). Kept as a
# NumPy constant so importing this module never initializes a jax backend
# (a module-level jnp.array would, making jax_num_cpu_devices a no-op for
# anything imported after the package — see __graft_entry__.dryrun_multichip).
_CORNER_SIGNS = np.array(
    [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]], dtype=np.float32
)


def rect_vertices(width, height, dtype=jnp.float32) -> Array:
    """Axis-aligned rectangle centered at the origin as 4 CCW vertices.

    TPU-native equivalent of `create_rect` (utils.cu:119-130). Broadcasts:
    ``width``/``height`` may have any (mutually broadcastable) batch shape
    ``B``; returns ``B + (4, 2)``.

    Note `create_rect` is linear in (w, h): ``rect(w1+w2, h1+h2) ==
    rect(w1,h1) + rect(w2,h2)`` — the additive shape-noise model of
    `sample_rectangle` (utils.cu:144-157) relies on exactly this.
    """
    width = jnp.asarray(width, dtype)
    height = jnp.asarray(height, dtype)
    wh = jnp.stack(jnp.broadcast_arrays(width, height), axis=-1)  # B + (2,)
    signs = _CORNER_SIGNS.astype(dtype)
    return wh[..., None, :] * signs  # B + (4, 2)


def transform_vertices(vertices: Array, dx, dy, theta) -> Array:
    """Rotate vertices by ``theta`` about the origin, then translate.

    TPU-native equivalent of `rot_trans_rectangle` (utils.cu:132-142):
    rotate-THEN-translate, matching the reference's order exactly.
    ``vertices``: ``B + (k, 2)``; ``dx``/``dy``/``theta``: broadcastable to
    ``B``. Returns ``B + (k, 2)``.
    """
    dtype = vertices.dtype
    theta = jnp.asarray(theta, dtype)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    x = vertices[..., 0]
    y = vertices[..., 1]
    # Match the reference's scalar formulas (utils.cu:139-140):
    #   x' = c*x - s*y + dx ;  y' = s*x + c*y + dy
    xt = c[..., None] * x - s[..., None] * y + jnp.asarray(dx, dtype)[..., None]
    yt = s[..., None] * x + c[..., None] * y + jnp.asarray(dy, dtype)[..., None]
    return jnp.stack([xt, yt], axis=-1)


def rects_from_params(center: Array, extents: Array, angle) -> Array:
    """Rectangles from the (center, extents, angle) parametric API.

    This is the scene/state API required by BASELINE.json ("rectangles as
    (center, extents, angle)"); it lowers onto the vertex contract above.
    ``center``: ``B + (2,)``; ``extents``: ``B + (2,)`` = (width, height);
    ``angle``: ``B``. Returns vertices ``B + (4, 2)``.
    """
    base = rect_vertices(extents[..., 0], extents[..., 1])
    return transform_vertices(base, center[..., 0], center[..., 1], angle)


def polygon_aabb(vertices: Array, mask: Array | None = None) -> tuple[Array, Array]:
    """Axis-aligned bounding box of a (possibly padded) polygon.

    ``vertices``: ``B + (k, 2)``. ``mask``: optional ``B + (k,)`` bool —
    True for real vertices (padded fixed-k polygons use the mask so padding
    never widens the box). Returns ``(lo, hi)``, each ``B + (2,)``.
    """
    if mask is None:
        lo = jnp.min(vertices, axis=-2)
        hi = jnp.max(vertices, axis=-2)
    else:
        m = mask[..., None]
        big = jnp.asarray(jnp.inf, vertices.dtype)
        lo = jnp.min(jnp.where(m, vertices, big), axis=-2)
        hi = jnp.max(jnp.where(m, vertices, -big), axis=-2)
    return lo, hi


def polygon_edges(vertices: Array) -> Array:
    """Edge vectors v[i+1] - v[i] (cyclic) of a polygon. ``B+(k,2)`` → ``B+(k,2)``."""
    return jnp.roll(vertices, shift=-1, axis=-2) - vertices


def edge_normals(vertices: Array) -> Array:
    """True outward-ish perpendicular edge normals (unnormalized).

    For edge e = (ex, ey), the perpendicular is (ey, -ex). This is the
    CORRECT axis set for arbitrary convex k-gons. The reference's
    `convex_collide` (utils.cu:170-171) instead projects onto the edge
    vector itself — correct-by-accident for rectangles only (each edge
    direction equals the normal of the adjacent edge). See
    `sat.sat_rects_reference` for the bit-compatible rectangle path.
    """
    e = polygon_edges(vertices)
    return jnp.stack([e[..., 1], -e[..., 0]], axis=-1)


def convex_hull(points: Array, k_out: int | None = None,
                mask: Array | None = None) -> Array:
    """Batched convex hull — gift wrapping (Jarvis march), branch-free.

    ``points``: ``B + (n, 2)`` float32. Returns ``B + (k_out, 2)`` CCW
    hull vertices starting from the lowest point (ties toward smaller
    x), REPEAT-LAST padded when the hull has fewer than ``k_out``
    vertices — i.e. the exact polygon convention every query in this
    framework consumes (`sat.sat_polygons` padding contract), so
    ``sat_polygons(convex_hull(a), convex_hull(b))`` just works.
    ``k_out`` defaults to ``n`` (always enough); ``mask`` (``B+(n,)``
    bool) excludes padding points from the input set.

    Fixed shapes throughout: ``k_out`` steps of one angular argmin over
    n candidates (O(k_out * n) per element, jit/vmap/shard-safe, no
    data-dependent control flow). Contract notes: duplicate points are
    fine; exactly-collinear hull-edge points may appear as (harmless)
    collinear vertices — the polygon is still convex, CCW, and every
    input point lies inside it. If ``k_out`` is smaller than the true
    hull size the first ``k_out`` hull vertices are returned (a convex
    subset boundary, NOT a superset of the points).

    A TPU-native replacement for the usual stack-based monotone chain,
    whose data-dependent pops don't vectorize.
    """
    p = jnp.asarray(points, jnp.float32)
    n = p.shape[-2]
    if k_out is None:
        k_out = n
    valid_in = (
        jnp.ones(p.shape[:-1], bool) if mask is None
        else jnp.broadcast_to(mask, p.shape[:-1])
    )
    inf = jnp.float32(jnp.inf)
    x, y = p[..., 0], p[..., 1]

    # Start: lowest point, ties toward smaller x (guaranteed on hull).
    ymin = jnp.min(jnp.where(valid_in, y, inf), axis=-1, keepdims=True)
    xkey = jnp.where(valid_in & (y == ymin), x, inf)
    i0 = jnp.argmin(xkey, axis=-1)  # B

    def take(idx):
        return jnp.take_along_axis(p, idx[..., None, None], axis=-2)[
            ..., 0, :
        ]

    c0 = take(i0)
    two_pi = jnp.float32(2.0 * jnp.pi)

    def body(step, carry):
        out, c, dref, done = carry
        out = jax.lax.dynamic_update_index_in_dim(
            out, c, step, axis=out.ndim - 2
        )
        v = p - c[..., None, :]  # B+(n,2)
        vv = jnp.sum(v * v, axis=-1)
        cand = valid_in & (vv > 0)
        # CCW turn angle from the incoming edge direction, in [0, 2pi).
        ang = jnp.arctan2(
            dref[..., 0][..., None] * v[..., 1]
            - dref[..., 1][..., None] * v[..., 0],
            dref[..., 0][..., None] * v[..., 0]
            + dref[..., 1][..., None] * v[..., 1],
        )
        ang = jnp.where(ang < 0, ang + two_pi, ang)
        score = jnp.where(cand, ang, inf)
        j = jnp.argmin(score, axis=-1)
        nxt = take(j)
        # Wrap: back at the start, or no candidate left (all duplicates).
        done = done | (j == i0) | ~jnp.any(cand, axis=-1)
        keep = done[..., None]
        new_dref = jnp.where(keep, dref, nxt - c)
        c = jnp.where(keep, c, nxt)
        return out, c, new_dref, done

    out0 = jnp.zeros(p.shape[:-2] + (k_out, 2), jnp.float32)
    dref0 = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0], jnp.float32), c0.shape
    )
    done0 = jnp.zeros(p.shape[:-2], bool)
    out, _, _, _ = jax.lax.fori_loop(
        0, k_out, body, (out0, c0, dref0, done0)
    )
    return out
