"""Separating-Axis-Theorem narrow phase — fixed runtime, branch free.

The reference's hot primitive is `convex_collide` (utils.cu:159-184): a
rectangle-rectangle SAT test that (quirks preserved here, documented in
SURVEY.md §2):

1. projects onto the EDGE VECTOR itself, not its perpendicular
   (utils.cu:170-171) — correct-by-accident for rectangles, where the edge
   direction set equals the normal set;
2. never exits early — all 8 axes are always evaluated (fixed runtime);
3. uses UNNORMALIZED axes and STRICT ``<`` interval comparisons
   (utils.cu:178), so exactly-touching rectangles count as colliding.

`sat_rects_reference` reproduces those semantics bit-for-bit (same axis
set, same comparison). `sat_polygons` is the general fixed-k convex
polygon test with TRUE perpendicular edge normals (fixing quirk 1, as the
reference README's extension path requires); fixed-k padding is handled
by vertex repetition (see its docstring).
`obb_collide` is the closed-form oriented-box test used by the fused
Monte-Carlo kernels — boolean-equivalent to the vertex formulation.

All functions are elementwise/VPU-friendly: no data-dependent control
flow, static shapes, safe under jit/vmap/shard_map.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.geometry import edge_normals, polygon_edges


def _project_all(axes: Array, verts: Array) -> Array:
    """Project vertices onto axes: ``B+(a,2) x B+(k,2) -> B+(a,k)``.

    Written as an explicit ``ax*x + ay*y`` (separately-rounded f32 mul and
    add on the VPU) rather than einsum/dot_general: contraction kernels
    may use FMA or reordered accumulation, which breaks the bit-for-bit
    parity with the reference's scalar projections (utils.cu:173-174)
    that `sat_rects_reference` guarantees (verified against SAT.py).
    """
    ax = axes[..., 0][..., None]  # B+(a,1)
    ay = axes[..., 1][..., None]
    x = verts[..., None, :, 0]  # B+(1,k)
    y = verts[..., None, :, 1]
    return ax * x + ay * y


def sat_rects_reference(r1: Array, r2: Array) -> Array:
    """Bit-compatible rectangle-rectangle SAT (reference semantics).

    Mirrors `convex_collide` (utils.cu:159-184) exactly: for each of the
    2x4 edges, use the edge vector (NOT its perpendicular) as the axis,
    project all 8 vertices, and declare separation when one interval is
    strictly to the left of the other (strict ``<``, utils.cu:178). No
    early exit. Touching rectangles therefore collide.

    ``r1``/``r2``: ``B + (4, 2)`` vertex arrays (layout per
    `geometry.rect_vertices`). Returns int32 ``B`` (1 = collide).
    """
    # Axis set: edge vectors of both rects — 8 axes, matching the
    # reference's j-loop over {r1, r2} and i-loop over 4 edges.
    axes = jnp.concatenate([polygon_edges(r1), polygon_edges(r2)], axis=-2)  # B+(8,2)
    p1 = _project_all(axes, r1)  # B+(8,4)
    p2 = _project_all(axes, r2)
    min1, max1 = jnp.min(p1, axis=-1), jnp.max(p1, axis=-1)
    min2, max2 = jnp.min(p2, axis=-1), jnp.max(p2, axis=-1)
    separated = jnp.logical_or(max1 < min2, max2 < min1)  # strict <, per axis
    return jnp.logical_not(jnp.any(separated, axis=-1)).astype(jnp.int32)


def sat_rects(r1: Array, r2: Array) -> Array:
    """Fast rectangle-rectangle SAT over 4 unique axes.

    A rectangle's edges 2,3 are negations of edges 0,1 in exact
    arithmetic, so half the reference's 8 axes suffice. In float32 the
    negation is exact only up to the rounding of the translated vertices,
    so a label can differ from `sat_rects_reference` when an interval
    boundary lands exactly between the two roundings — a measure-zero
    set (none observed in randomized testing; exactly-touching
    axis-aligned grids round identically and also agree). Use
    `sat_rects_reference` when strict bit-parity with the reference
    semantics is required.

    Fully unrolled over coordinate COLUMNS (same shape as the Pallas
    kernel's body): XLA fuses the whole test into one elementwise pass
    over (N,)-vectors with no (N, axes, verts) intermediate — 2.3x the
    stack-project-reduce formulation on TPU (bitwise-identical labels;
    min/max are exact so unroll order cannot matter).
    """
    x1 = [r1[..., k, 0] for k in range(4)]
    y1 = [r1[..., k, 1] for k in range(4)]
    x2 = [r2[..., k, 0] for k in range(4)]
    y2 = [r2[..., k, 1] for k in range(4)]
    axes = [
        (x1[1] - x1[0], y1[1] - y1[0]),
        (x1[2] - x1[1], y1[2] - y1[1]),
        (x2[1] - x2[0], y2[1] - y2[0]),
        (x2[2] - x2[1], y2[2] - y2[1]),
    ]
    separated = None
    for ax, ay in axes:
        mn1 = mx1 = ax * x1[0] + ay * y1[0]
        for k in range(1, 4):
            p = ax * x1[k] + ay * y1[k]
            mn1 = jnp.minimum(mn1, p)
            mx1 = jnp.maximum(mx1, p)
        mn2 = mx2 = ax * x2[0] + ay * y2[0]
        for k in range(1, 4):
            p = ax * x2[k] + ay * y2[k]
            mn2 = jnp.minimum(mn2, p)
            mx2 = jnp.maximum(mx2, p)
        sep = jnp.logical_or(mx1 < mn2, mx2 < mn1)
        separated = sep if separated is None else jnp.logical_or(separated, sep)
    return jnp.logical_not(separated).astype(jnp.int32)


def sat_polygons(
    p1: Array,
    p2: Array,
    mask1: Array | None = None,
    mask2: Array | None = None,
) -> Array:
    """Convex k-gon vs k-gon SAT with true perpendicular edge normals.

    The general-shape path the reference README names as the extension
    (README.md:3) but never implements; this fixes the edge-direction
    quirk of utils.cu:170-171 by projecting onto perpendiculars. For
    rectangle inputs the axis SET coincides with the reference's (each
    rect edge direction = adjacent edge's normal), so labels agree with
    `sat_rects_reference` on rectangles.

    Padded fixed-k polygons: pad by REPEATING a real vertex (any slot
    content works when you pass a ``mask``: padded slots are first
    rewritten to the last real vertex). With repeat-padding the test is
    correct WITHOUT masking axes or intervals:

    - a duplicated vertex never moves an interval's min/max;
    - the edge between duplicates is the zero vector, whose projections
      are identically zero on both polygons — a zero axis never
      separates;
    - the edge from the final padded slot back to vertex 0 IS the real
      closing edge, so the axis set stays complete. (Masking that edge
      out — an earlier revision did — loses the closing-edge normal and
      yields false-positive collisions.)

    ``p1``/``p2``: ``B + (k, 2)`` CCW convex vertices. Returns int32 ``B``.
    Touching polygons collide (strict ``<`` separation), matching the
    reference's convention.
    """
    p1 = _normalize_padding(p1, mask1)
    p2 = _normalize_padding(p2, mask2)

    k1 = p1.shape[-2]
    k2 = p2.shape[-2]
    if k1 + k2 > 32:
        # Large k: the unrolled form below traces O((k1+k2)^2) scalar
        # ops; keep the O(1)-trace vectorized formulation instead
        # (labels identical — same projections, exact min/max).
        axes = jnp.concatenate([edge_normals(p1), edge_normals(p2)], axis=-2)
        proj1 = _project_all(axes, p1)  # B+(a,k)
        proj2 = _project_all(axes, p2)
        min1, max1 = jnp.min(proj1, axis=-1), jnp.max(proj1, axis=-1)
        min2, max2 = jnp.min(proj2, axis=-1), jnp.max(proj2, axis=-1)
        separated = jnp.logical_or(max1 < min2, max2 < min1)
        return jnp.logical_not(jnp.any(separated, axis=-1)).astype(jnp.int32)

    # k <= 16 each (the framework's fixed-k contract is k <= 8): fully
    # unrolled over coordinate columns (like `sat_rects`) — XLA fuses the
    # whole test into one elementwise pass with no B+(axes, k)
    # intermediates, measured ~2-3x the stack-project-reduce formulation
    # on TPU, bitwise-identical labels (same separately-rounded
    # ax*x + ay*y projections; min/max are exact).
    x1 = [p1[..., i, 0] for i in range(k1)]
    y1 = [p1[..., i, 1] for i in range(k1)]
    x2 = [p2[..., i, 0] for i in range(k2)]
    y2 = [p2[..., i, 1] for i in range(k2)]
    # perpendicular edge normals, same formula as geometry.edge_normals:
    # edge e = (ex, ey) -> axis (ey, -ex)
    axes = [
        (y1[(i + 1) % k1] - y1[i], -(x1[(i + 1) % k1] - x1[i]))
        for i in range(k1)
    ] + [
        (y2[(i + 1) % k2] - y2[i], -(x2[(i + 1) % k2] - x2[i]))
        for i in range(k2)
    ]
    separated = None
    for ax, ay in axes:
        mn1 = mx1 = ax * x1[0] + ay * y1[0]
        for i in range(1, k1):
            p = ax * x1[i] + ay * y1[i]
            mn1 = jnp.minimum(mn1, p)
            mx1 = jnp.maximum(mx1, p)
        mn2 = mx2 = ax * x2[0] + ay * y2[0]
        for i in range(1, k2):
            p = ax * x2[i] + ay * y2[i]
            mn2 = jnp.minimum(mn2, p)
            mx2 = jnp.maximum(mx2, p)
        sep = jnp.logical_or(mx1 < mn2, mx2 < mn1)
        separated = sep if separated is None else jnp.logical_or(separated, sep)
    return jnp.logical_not(separated).astype(jnp.int32)


def _normalize_padding(p: Array, mask: Array | None) -> Array:
    """Rewrite masked-out (padded) slots to the last real vertex, making
    arbitrary padding equivalent to the safe repeat-last convention."""
    if mask is None:
        return p
    last_real = jnp.sum(mask.astype(jnp.int32), axis=-1, keepdims=True) - 1  # B+(1,)
    last_vertex = jnp.take_along_axis(p, last_real[..., None], axis=-2)  # B+(1,2)
    return jnp.where(mask[..., None], p, last_vertex)


def obb_collide(c1, ext1, th1, c2, ext2, th2) -> Array:
    """Closed-form oriented-box overlap test (boolean-equal to vertex SAT).

    Separation on the 4 unit axes of the two boxes; on axis u the boxes
    are separated iff |(c1-c2)·u| > h1·|u·a1| + ... (projected extents).
    Because the axes here are normalized and the arithmetic is refactored,
    the float rounding differs from the vertex path on measure-zero
    near-touching inputs — labels agree everywhere else (tested). This is
    the form the fused Monte-Carlo kernels use: ~40 flops + 4
    transcendentals per test, no vertex materialization.

    Negative extents (possible under the reference's additive shape noise,
    utils.cu:144-157, when dw < -w) are handled via abs(), which matches
    the vertex formulation's min/max behavior on inverted rectangles.

    ``c1``/``c2``: ``B + (2,)`` centers; ``ext1``/``ext2``: ``B + (2,)``
    FULL widths/heights; ``th1``/``th2``: ``B`` angles. Returns int32 ``B``.
    """
    hx1 = jnp.abs(ext1[..., 0]) * 0.5
    hy1 = jnp.abs(ext1[..., 1]) * 0.5
    hx2 = jnp.abs(ext2[..., 0]) * 0.5
    hy2 = jnp.abs(ext2[..., 1]) * 0.5
    dx = c1[..., 0] - c2[..., 0]
    dy = c1[..., 1] - c2[..., 1]
    c1_, s1_ = jnp.cos(th1), jnp.sin(th1)
    c2_, s2_ = jnp.cos(th2), jnp.sin(th2)
    # Relative rotation: |cos(th1-th2)|, |sin(th1-th2)| via angle addition.
    cd = jnp.abs(c1_ * c2_ + s1_ * s2_)
    sd = jnp.abs(s1_ * c2_ - c1_ * s2_)
    # Center offset projected on each box's axes.
    d_a1 = jnp.abs(dx * c1_ + dy * s1_)
    d_a2 = jnp.abs(-dx * s1_ + dy * c1_)
    d_b1 = jnp.abs(dx * c2_ + dy * s2_)
    d_b2 = jnp.abs(-dx * s2_ + dy * c2_)
    sep = (d_a1 > hx1 + hx2 * cd + hy2 * sd)
    sep |= d_a2 > hy1 + hx2 * sd + hy2 * cd
    sep |= d_b1 > hx2 + hx1 * cd + hy1 * sd
    sep |= d_b2 > hy2 + hx1 * sd + hy1 * cd
    return jnp.logical_not(sep).astype(jnp.int32)
