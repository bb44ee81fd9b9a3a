"""Geometry layer vs the reference vertex-layout contract (utils.cu:119-142)."""

import numpy as np
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
