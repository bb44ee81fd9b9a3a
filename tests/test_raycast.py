"""Raycast tests: closed forms, boundary membership, TOI
cross-validation, inside/miss/degenerate conventions, scene argmin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collide2d_tpu.ops.raycast import (
    polygon_raycast,
    rect_raycast,
    scene_raycast,
)
from collide2d_tpu.ops.toi import polygon_time_of_impact
from tests.test_distance import _point_to_boundary
from tests.test_sat import _regular_polygon


@pytest.fixture
def rng():
    return np.random.default_rng(20260821)


def _sq(cx, cy, half):
    return np.array(
        [[cx - half, cy - half], [cx + half, cy - half],
         [cx + half, cy + half], [cx - half, cy + half]], np.float32)


def test_axis_aligned_closed_forms():
    sq = jnp.asarray(_sq(5.0, 0.0, 1.0))  # x in [4, 6], y in [-1, 1]
    # Straight-on hit from the left: t = 4, normal = -x.
    t, n = polygon_raycast(
        jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 0.0]), sq)
    np.testing.assert_allclose(float(t), 4.0, atol=1e-6)
    np.testing.assert_allclose(np.array(n), [-1.0, 0.0], atol=1e-6)
    # Unnormalized direction: t scales by 1/|d|.
    t2, _ = polygon_raycast(
        jnp.asarray([0.0, 0.0]), jnp.asarray([2.0, 0.0]), sq)
    np.testing.assert_allclose(float(t2), 2.0, atol=1e-6)
    # Miss above the box.
    t3, n3 = polygon_raycast(
        jnp.asarray([0.0, 2.0]), jnp.asarray([1.0, 0.0]), sq)
    assert np.isinf(float(t3)) and (np.array(n3) == 0).all()
    # Parallel ray on the miss side.
    t4, _ = polygon_raycast(
        jnp.asarray([0.0, 5.0]), jnp.asarray([1.0, 0.0]), sq)
    assert np.isinf(float(t4))
    # t_max cuts a would-be hit.
    t5, _ = polygon_raycast(
        jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 0.0]), sq, t_max=3.0)
    assert np.isinf(float(t5))
    # Ray pointing away.
    t6, _ = polygon_raycast(
        jnp.asarray([0.0, 0.0]), jnp.asarray([-1.0, 0.0]), sq)
    assert np.isinf(float(t6))
    # Origin inside: t = 0, normal = 0.
    t7, n7 = polygon_raycast(
        jnp.asarray([5.0, 0.0]), jnp.asarray([1.0, 0.0]), sq)
    assert float(t7) == 0.0 and (np.array(n7) == 0).all()


def test_hit_points_on_boundary_and_normals_outward(rng):
    hits = 0
    for trial in range(64):
        k = int(rng.integers(3, 9))
        poly = _regular_polygon(
            k, rng.uniform(0.5, 2.0), rng.uniform(-2, 2),
            rng.uniform(-2, 2), rng.uniform(0, 7))
        o = rng.uniform(-8, 8, 2).astype(np.float32)
        d = rng.uniform(-1, 1, 2).astype(np.float32)
        t, n = map(np.array, polygon_raycast(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(poly)))
        if not np.isfinite(t) or t == 0.0:
            continue
        hits += 1
        x = o + float(t) * d
        assert _point_to_boundary(x, poly) < 1e-4
        assert abs(np.linalg.norm(n) - 1.0) < 1e-5
        assert float(n @ d) <= 1e-6  # entering: normal opposes the ray
    assert hits >= 6


def test_cross_validates_exact_translation_toi(rng):
    # A ray is a translating point: polygon_time_of_impact with a
    # degenerate point polygon must give the same t (shape 2 moves by
    # t*v_rel toward the static polygon = the polygon seen from a ray).
    for trial in range(32):
        k = int(rng.integers(3, 9))
        poly = _regular_polygon(
            k, rng.uniform(0.5, 2.0), rng.uniform(-2, 2),
            rng.uniform(-2, 2), rng.uniform(0, 7))
        o = rng.uniform(-6, 6, 2).astype(np.float32)
        d = rng.uniform(-1, 1, 2).astype(np.float32)
        t_ray, _ = polygon_raycast(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(poly), t_max=50.0)
        point = jnp.asarray(np.tile(o[None], (4, 1)))
        t_toi = polygon_time_of_impact(
            jnp.asarray(poly), point, jnp.asarray(d), t_max=50.0)
        a, b = float(t_ray), float(t_toi)
        if np.isinf(a) or np.isinf(b):
            assert np.isinf(a) == np.isinf(b), (a, b)
        else:
            np.testing.assert_allclose(a, b, atol=1e-4)


def test_padding_mask_and_degenerate(rng):
    poly = _regular_polygon(5, 1.0, 0.0, 0.0, 0.4)
    pad = np.concatenate([poly, np.repeat(poly[-1:], 3, 0)])
    arb = np.concatenate([poly, np.full((3, 2), 9.0, np.float32)])
    m = jnp.asarray([True] * 5 + [False] * 3)
    o = jnp.asarray([-4.0, 0.1])
    d = jnp.asarray([1.0, 0.0])
    t0, n0 = polygon_raycast(o, d, jnp.asarray(poly))
    t1, n1 = polygon_raycast(o, d, jnp.asarray(pad))
    t2, n2 = polygon_raycast(o, d, jnp.asarray(arb), mask=m)
    for t, n in ((t1, n1), (t2, n2)):
        np.testing.assert_allclose(float(t), float(t0), atol=1e-6)
        np.testing.assert_allclose(np.array(n), np.array(n0), atol=1e-6)
    # Degenerate point polygon: never hit.
    pt = jnp.asarray(np.tile(np.array([[0.0, 0.1]], np.float32), (4, 1)))
    t3, _ = polygon_raycast(o, d, pt)
    assert np.isinf(float(t3))


def test_rect_param_form_and_batching(rng):
    n = 128
    o = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    d = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    c = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    e = rng.uniform(0.5, 3, (n, 2)).astype(np.float32)
    th = rng.uniform(0, 7, n).astype(np.float32)
    t, nrm = rect_raycast(o, d, c, e, th)
    from collide2d_tpu.ops.geometry import rects_from_params

    t2, n2 = polygon_raycast(
        jnp.asarray(o), jnp.asarray(d),
        rects_from_params(jnp.asarray(c), jnp.asarray(e), jnp.asarray(th)))
    # rect_raycast inserts an abs() the direct path lacks -> different
    # XLA programs, so values agree to rounding, not bitwise.
    np.testing.assert_allclose(np.array(t), np.array(t2), rtol=1e-6)
    np.testing.assert_allclose(np.array(nrm), np.array(n2), atol=1e-6)
    # jit composes and matches.
    t3, n3 = jax.jit(polygon_raycast)(
        jnp.asarray(o), jnp.asarray(d),
        rects_from_params(jnp.asarray(c), jnp.asarray(e), jnp.asarray(th)))
    np.testing.assert_allclose(np.array(t), np.array(t3), rtol=1e-6)


def test_scene_raycast_argmin(rng):
    # Three squares along +x: the nearest is hit first; a ray that
    # misses everything returns +inf with index ignored.
    scene = jnp.asarray(np.stack([
        _sq(4.0, 0.0, 1.0), _sq(8.0, 0.0, 1.0), _sq(2.0, 5.0, 1.0)]))
    t, idx, n = scene_raycast(
        jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 0.0]), scene)
    assert float(t) == pytest.approx(3.0, abs=1e-6)
    assert int(idx) == 0
    np.testing.assert_allclose(np.array(n), [-1.0, 0.0], atol=1e-6)
    tm, _, _ = scene_raycast(
        jnp.asarray([0.0, -9.0]), jnp.asarray([1.0, 0.0]), scene)
    assert np.isinf(float(tm))
    # Ray batch broadcasts: (R, 2) origins.
    o = jnp.asarray([[0.0, 0.0], [2.0, 0.0], [0.0, -9.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]], jnp.float32)
    tb, ib, nb = scene_raycast(o, d, scene)
    assert tb.shape == (3,) and ib.shape == (3,) and nb.shape == (3, 2)
    np.testing.assert_allclose(np.array(tb)[:2], [3.0, 1.0], atol=1e-6)
    assert np.isinf(np.array(tb)[2])


def test_scene_raycast_pallas_matches_xla(rng):
    # the fused scene kernel vs the XLA broadcast+argmin, interpret
    # mode: identical hit/miss and hit-shape decisions away from razor
    # ties, t/normal to f32 rounding (the kernel pre-normalizes face
    # normals; ratios are scale-invariant). Exercises R/N padding
    # (67 rays, 11 shapes), mask padding, and t_max.
    from collide2d_tpu.ops.raycast_pallas import scene_raycast_pallas

    n, r, k = 11, 67, 7
    polys = np.stack([
        _regular_polygon(
            k, rng.uniform(0.3, 1.2), rng.uniform(-6, 6),
            rng.uniform(-6, 6), rng.uniform(0, 7))
        for _ in range(n)
    ]).astype(np.float32)
    # Repeat-pad two shapes down to pentagons through the mask path.
    mask = np.ones((n, k), bool)
    mask[0, 5:] = False
    mask[1, 6:] = False
    o = rng.uniform(-8, 8, (r, 2)).astype(np.float32)
    d = rng.uniform(-1, 1, (r, 2)).astype(np.float32)
    for t_max in (np.inf, 4.0):
        ref_t, ref_i, ref_n = scene_raycast(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(polys),
            jnp.asarray(mask), t_max=t_max)
        got_t, got_i, got_n = scene_raycast_pallas(
            o, d, polys, jnp.asarray(mask), t_max=t_max,
            block=16, interpret=True)
        ref_t, got_t = np.array(ref_t), np.array(got_t)
        assert np.array_equal(np.isinf(ref_t), np.isinf(got_t))
        assert np.isfinite(ref_t).any() and np.isinf(ref_t).any()
        m = np.isfinite(ref_t)
        np.testing.assert_allclose(got_t[m], ref_t[m], atol=1e-5)
        # Hit-shape agreement away from razor ties: exclude rays whose
        # two nearest per-shape hits are within the fp tolerance.
        from collide2d_tpu.ops.raycast import polygon_raycast as praycast

        ts_all = np.array(praycast(
            jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
            jnp.asarray(polys), jnp.asarray(mask), t_max=t_max)[0])
        two = np.sort(ts_all, axis=1)[:, :2]
        with np.errstate(invalid="ignore"):  # inf - inf on all-miss rays
            clear = m & (
                np.isinf(two[:, 1]) | (two[:, 1] - two[:, 0] > 1e-4)
            )
        assert clear.any()
        np.testing.assert_array_equal(
            np.array(got_i)[clear], np.array(ref_i)[clear])
        np.testing.assert_allclose(
            np.array(got_n)[clear], np.array(ref_n)[clear], atol=1e-5)


def test_scene_raycast_pallas_conventions():
    # inside-start (t=0, zero normal), miss (t=+inf, idx 0), degenerate
    # point shape never hit, first-wins tie on coincident shapes.
    from collide2d_tpu.ops.raycast_pallas import scene_raycast_pallas

    sq = _sq(4.0, 0.0, 1.0)
    pt = np.tile(np.array([[9.0, 9.0]], np.float32), (4, 1))
    scene = np.stack([pt, sq, sq])  # duplicate squares tie exactly
    o = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, -9.0]], np.float32)
    d = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]], np.float32)
    t, idx, nrm = scene_raycast_pallas(o, d, scene, block=8,
                                       interpret=True)
    t, idx, nrm = np.array(t), np.array(idx), np.array(nrm)
    np.testing.assert_allclose(t[0], 3.0, atol=1e-6)
    assert idx[0] == 1  # first of the tied duplicates, like argmin
    np.testing.assert_allclose(nrm[0], [-1.0, 0.0], atol=1e-6)
    assert t[1] == 0.0 and np.all(nrm[1] == 0.0)  # inside start
    assert np.isinf(t[2]) and idx[2] == 0 and np.all(nrm[2] == 0.0)
