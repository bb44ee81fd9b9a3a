"""Geometry layer vs the reference vertex-layout contract (utils.cu:119-142)."""

import numpy as np
import jax
import jax.numpy as jnp

import SAT
from collide2d_tpu.ops.geometry import (
    rect_vertices,
    transform_vertices,
    rects_from_params,
    polygon_aabb,
    edge_normals,
)
from tests.conftest import random_rect_params


def test_rect_vertex_layout_contract():
    # CCW from bottom-left — the file-schema-level contract (utils.cu:119-130).
    v = np.array(rect_vertices(4.0, 2.0))
    expected = np.array([[-2, -1], [2, -1], [2, 1], [-2, 1]], np.float32)
    np.testing.assert_array_equal(v, expected)
    np.testing.assert_array_equal(v.ravel(), SAT.create_rect(4.0, 2.0))


def test_rect_vertices_linear_in_wh():
    # create_rect is linear in (w, h): the additive shape-noise identity
    # rect(w,h) + rect(dw,dh) == rect(w+dw, h+dh) (utils.cu:152-155).
    a = rect_vertices(1.3, 2.7) + rect_vertices(0.4, -0.9)
    b = rect_vertices(1.3 + 0.4, 2.7 - 0.9)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


def test_transform_bitwise_vs_oracle(rng):
    w, h, x, y, t = random_rect_params(rng, 256)
    ours = np.array(transform_vertices(rect_vertices(w, h), x, y, t))
    for i in range(256):
        ref = SAT.rot_trans_rectangle(SAT.create_rect(w[i], h[i]), x[i], y[i], t[i])
        # cos/sin may differ by <=1 ulp between XLA CPU and libm; the
        # positions are exact.
        np.testing.assert_allclose(ours[i].ravel(), ref, rtol=0, atol=4e-6)


def test_rects_from_params_matches_composition(rng):
    w, h, x, y, t = random_rect_params(rng, 64)
    center = np.stack([x, y], -1)
    extents = np.stack([w, h], -1)
    a = rects_from_params(jnp.asarray(center), jnp.asarray(extents), jnp.asarray(t))
    b = transform_vertices(rect_vertices(w, h), x, y, t)
    np.testing.assert_array_equal(np.array(a), np.array(b))


def test_aabb_and_mask():
    v = jnp.asarray(
        np.array([[[0, 0], [2, 0], [2, 3], [0, 3]]], np.float32)
    )
    lo, hi = polygon_aabb(v)
    np.testing.assert_array_equal(np.array(lo)[0], [0, 0])
    np.testing.assert_array_equal(np.array(hi)[0], [2, 3])
    # padded vertex must not widen the box when masked
    vp = jnp.asarray(np.array([[[0, 0], [2, 0], [2, 3], [99, 99]]], np.float32))
    mask = jnp.asarray(np.array([[True, True, True, False]]))
    lo, hi = polygon_aabb(vp, mask)
    np.testing.assert_array_equal(np.array(hi)[0], [2, 3])


def test_edge_normals_perpendicular():
    v = rect_vertices(2.0, 4.0)
    n = np.array(edge_normals(v))
    e = np.roll(np.array(v), -1, axis=-2) - np.array(v)
    dots = (n * e).sum(-1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-6)


def _hull_oracle(pts):
    """Andrew monotone chain (float64), CCW, no collinear vertices."""
    pts = sorted(map(tuple, np.asarray(pts, np.float64)))
    pts = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
    if len(pts) <= 2:
        return np.array(pts, np.float64)

    def half(seq):
        out = []
        for q in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (q[1] - oy) - (ay - oy) * (q[0] - ox) > 0:
                    break
                out.pop()
            out.append(q)
        return out

    lower = half(pts)
    upper = half(reversed(pts))
    return np.array(lower[:-1] + upper[:-1], np.float64)


def test_convex_hull_matches_oracle_and_feeds_queries():
    from collide2d_tpu.ops.geometry import convex_hull
    from collide2d_tpu.ops.sat import sat_polygons

    rng = np.random.default_rng(11)
    B, n = 48, 24
    pts = rng.uniform(-3, 3, (B, n, 2)).astype(np.float32)
    hull = np.array(convex_hull(jnp.asarray(pts)))
    assert hull.shape == (B, n, 2)
    for b in range(B):
        want = _hull_oracle(pts[b])
        # Unique vertices of ours == the oracle's vertex set (random
        # floats: no exact collinearity, so the sets coincide).
        got = np.unique(hull[b], axis=0)
        np.testing.assert_allclose(
            got, np.unique(want.astype(np.float32), axis=0), atol=0
        )
        # CCW order: positive signed area.
        x, y = hull[b, :, 0], hull[b, :, 1]
        area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert area2 > 0
        # Repeat-last padding: after the wrap, rows repeat the last
        # hull vertex.
        h = len(want)
        assert (hull[b, h:] == hull[b, h - 1]).all()
    # The output feeds the query layer directly: every source point
    # (as a degenerate repeat-padded point polygon) collides with —
    # i.e. lies inside — its own hull.
    hulls_rep = np.repeat(hull, n, axis=0)  # (B*n, n, 2)
    point_polys = np.repeat(
        pts.reshape(B * n, 1, 2), 4, axis=1
    )  # (B*n, 4, 2)
    lab = np.array(
        sat_polygons(jnp.asarray(hulls_rep), jnp.asarray(point_polys))
    )
    assert (lab == 1).all()


def test_convex_hull_edge_cases():
    from collide2d_tpu.ops.geometry import convex_hull

    # All points identical -> that point repeated.
    pt = np.full((6, 2), 1.5, np.float32)
    h = np.array(convex_hull(jnp.asarray(pt)))
    assert (h == 1.5).all()
    # Mask excludes outliers.
    pts = np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1], [9, 9]], np.float32
    )
    m = jnp.asarray([True, True, True, True, False])
    h = np.array(convex_hull(jnp.asarray(pts), mask=m))
    assert h.max() <= 1.0
    # k_out smaller than n still returns hull vertices only.
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (32, 2)).astype(np.float32)
    h8 = np.array(convex_hull(jnp.asarray(pts), k_out=8))
    want = _hull_oracle(pts).astype(np.float32)
    for row in h8:
        assert any((row == w).all() for w in want)
    # jit/vmap compose.
    batch = jnp.asarray(rng.uniform(-1, 1, (4, 16, 2)).astype(np.float32))
    a = np.array(jax.jit(convex_hull)(batch))
    b = np.array(jax.vmap(lambda q: convex_hull(q))(batch))
    np.testing.assert_array_equal(a, b)
