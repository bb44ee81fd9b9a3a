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
