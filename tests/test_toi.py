"""Time of impact (ops/toi.py): analytic cases, a dense-time oracle for
rotating motion, conservativeness, and transform composition."""

import jax
import jax.numpy as jnp
import numpy as np

from collide2d_tpu.ops.distance import rect_signed_distance
from collide2d_tpu.ops.toi import polygon_time_of_impact, rect_time_of_impact

from tests.test_sat import _regular_polygon


def _sq(n):
    return jnp.full((n, 2), 2.0, jnp.float32)  # full extents 2 => half 1


def test_rect_analytic_cases():
    # one batched call covering: head-on, overlap at t=0, receding,
    # clean miss (parallel pass with lateral gap)
    z = jnp.zeros((4, 2), jnp.float32)
    zt = jnp.zeros(4, jnp.float32)
    c2 = jnp.asarray([[5.0, 0.0], [0.5, 0.0], [5.0, 0.0], [5.0, 4.0]])
    v2 = jnp.asarray([[-1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [-1.0, 0.0]])
    toi = np.array(rect_time_of_impact(
        z, _sq(4), zt, jnp.zeros((4, 2)), zt,
        c2, _sq(4), zt, v2, zt, t_max=10.0,
    ))
    # head-on: gap = 5 - 1 - 1 = 3 at speed 1
    np.testing.assert_allclose(toi[0], 3.0, atol=1e-3)
    assert toi[1] == 0.0
    assert np.isinf(toi[2])
    assert np.isinf(toi[3])  # lateral gap 2 never closes


def test_rect_conservative_and_converged():
    # diagonal approach with rotation on both bodies: check against a
    # dense time grid of the same distance function.
    n = 32
    rng = np.random.default_rng(11)
    c1 = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    c2 = jnp.asarray((rng.uniform(3, 5, (n, 2)) * rng.choice([-1, 1], (n, 2)))
                     .astype(np.float32))
    e1 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    v1 = jnp.zeros((n, 2), jnp.float32)
    # unit speed toward the origin, except every 4th body recedes so the
    # batch provably mixes hits and misses
    approach = -np.array(c2) / np.linalg.norm(c2, axis=1, keepdims=True)
    approach[3::4] *= -1.0
    v2 = jnp.asarray(approach.astype(np.float32))
    w1 = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    t_max = 12.0
    toi = np.array(rect_time_of_impact(
        c1, e1, t1, v1, w1, c2, e2, t2, v2, w2,
        t_max=t_max, iters=256, tol=1e-4,
    ))

    def d_of(t):  # t: (..., n) -> distances (..., n), one batched call
        t = jnp.asarray(t, jnp.float32)
        te = t[..., None]
        return np.array(rect_signed_distance(
            c1 + te * v1, e1, t1 + t * w1, c2 + te * v2, e2, t2 + t * w2))

    grid = np.linspace(0, t_max, 4001, dtype=np.float32)
    dg = d_of(np.broadcast_to(grid[:, None], (grid.size, n)))  # (T, n)
    first = np.where((dg <= 0).any(0), grid[np.argmax(dg <= 0, 0)], np.inf)
    d_at_toi = d_of(np.where(np.isfinite(toi), toi, 0.0))
    for i in range(n):
        if np.isfinite(toi[i]):
            # every reported impact is certified and conservative
            assert d_at_toi[i] <= 1.5e-4
            assert toi[i] <= first[i] + 1e-3
            # ... and not needlessly early vs the grid crossing
            assert first[i] - toi[i] <= grid[1] + 0.05
        else:
            # no reported impact => the grid found none either (away
            # from grazing, which the contract routes to inf)
            assert np.isinf(first[i]) or dg[:, i].min() > -1e-3
    assert np.isfinite(toi).any() and np.isinf(toi).any()


def test_polygon_toi_matches_rect_case():
    # hexagon pair under pure translation vs the dense grid
    a = jnp.asarray(np.stack([_regular_polygon(6, 1.0, 0.0, 0.0)] * 8))
    b0 = np.stack([_regular_polygon(6, 1.0, 4.0, 0.2 * i) for i in range(8)])
    v = jnp.asarray([[-1.0, 0.0]] * 8)
    toi = np.array(polygon_time_of_impact(a, jnp.asarray(b0), v,
                                          t_max=6.0, iters=128))
    from collide2d_tpu.ops.distance import polygon_signed_distance

    grid = np.linspace(0, 6.0, 6001, dtype=np.float32)
    # one batched oracle call: (T, 8) pairs with B shifted along the grid
    shift = grid[:, None, None, None] * np.array(
        [-1.0, 0.0], np.float32)  # (T,1,1,2)
    dg = np.array(polygon_signed_distance(
        jnp.broadcast_to(a, (grid.size, 8, 6, 2)),
        jnp.asarray(b0[None] + shift),
    ))  # (T, 8)
    for i in range(8):
        dvals = dg[:, i]
        cross = grid[np.argmax(dvals <= 0)] if (dvals <= 0).any() else np.inf
        if np.isfinite(toi[i]):
            assert toi[i] <= cross + 1e-3
            assert cross - toi[i] <= 0.01
        else:
            assert np.isinf(cross) or dvals.min() > -1e-3


def test_rect_toi_pallas_matches_xla():
    # the fused advancement kernel vs the XLA CA loop, interpret mode:
    # identical hit/miss decisions, times equal to f32 rounding of the
    # equivalent distance formulation; exercises the padding path
    # (n=100 not a multiple of 8*block) and scalar th/w broadcasting.
    from collide2d_tpu.ops.toi_pallas import rect_toi_pallas

    n = 100
    rng = np.random.default_rng(7)
    c1 = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    c2 = jnp.asarray((rng.uniform(3, 5, (n, 2))
                      * rng.choice([-1, 1], (n, 2))).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    approach = -np.array(c2) / np.linalg.norm(c2, axis=1, keepdims=True)
    approach[3::4] *= -1.0
    v2 = jnp.asarray(approach.astype(np.float32))
    v1 = jnp.zeros((n, 2), jnp.float32)
    w2 = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    kw = dict(t_max=8.0, iters=128, tol=1e-4)
    ref = np.array(rect_time_of_impact(
        c1, e1, t1, v1, 0.25, c2, e2, 0.0, v2, w2, **kw))
    got = np.array(rect_toi_pallas(
        c1, e1, t1, v1, 0.25, c2, e2, 0.0, v2, w2,
        block=8, interpret=True, **kw))
    assert np.array_equal(np.isfinite(ref), np.isfinite(got))
    assert np.isfinite(ref).any() and np.isinf(ref).any()
    m = np.isfinite(ref)
    np.testing.assert_allclose(got[m], ref[m], atol=1e-5)


def test_toi_jit_and_model_surfaces():
    from collide2d_tpu.models.collision_model import (
        CollisionProbabilityModel,
    )

    model = CollisionProbabilityModel()  # robot 4.07 x 1.74
    pos = jnp.asarray([[6.0, 0.0], [0.0, 0.0]])
    th = jnp.zeros(2, jnp.float32)
    vel = jnp.asarray([[-1.0, 0.0], [1.0, 0.0]])
    toi = np.array(model.time_of_impact(
        pos, th, jnp.asarray([2.0, 1.0]), vel, t_max=10.0))
    # head-on gap: 6 - 4.07/2 - 2/2 = 2.965; overlapping starts at 0
    np.testing.assert_allclose(toi[0], 6.0 - 4.07 / 2 - 1.0, atol=1e-3)
    assert toi[1] == 0.0

    jitted = jax.jit(
        lambda p, t, v: model.time_of_impact(
            p, t, jnp.asarray([2.0, 1.0]), v, t_max=10.0)
    )
    np.testing.assert_allclose(np.array(jitted(pos, th, vel)), toi, atol=1e-6)


def test_rect_translation_toi_exact():
    from collide2d_tpu.ops.toi import rect_translation_toi

    # analytic: head-on, initial overlap, receding, lateral miss, and a
    # GRAZING pass (corner just touches) — the case CA cannot certify
    z2 = jnp.zeros((5, 2), jnp.float32)
    zt = jnp.zeros(5, jnp.float32)
    c2 = jnp.asarray([[5.0, 0.0], [0.5, 0.0], [5.0, 0.0], [5.0, 4.0],
                      [5.0, 1.999]])
    v = jnp.asarray([[-1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [-1.0, 0.0],
                     [-1.0, 0.0]])
    toi = np.array(rect_translation_toi(
        z2, _sq(5), zt, c2, _sq(5), zt, v, t_max=10.0))
    np.testing.assert_allclose(toi[0], 3.0, rtol=1e-6)
    assert toi[1] == 0.0
    assert np.isinf(toi[2]) and np.isinf(toi[3])
    np.testing.assert_allclose(toi[4], 3.0, rtol=1e-5)  # graze resolves

    # randomized: exact times agree with a dense grid of the static
    # label to grid resolution, with NO iteration budget involved
    rng = np.random.default_rng(3)
    n = 64
    c1 = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    c2 = jnp.asarray((rng.uniform(3, 5, (n, 2))
                      * rng.choice([-1, 1], (n, 2))).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(0.5, 3, (n, 2)).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    ap = -np.array(c2) / np.linalg.norm(c2, axis=1, keepdims=True)
    ap[3::4] *= -1.0
    v = jnp.asarray(ap.astype(np.float32))
    t_max = 12.0
    toi = np.array(rect_translation_toi(c1, e1, t1, c2, e2, t2, v,
                                        t_max=t_max))
    from collide2d_tpu.ops.sat import obb_collide

    grid = np.linspace(0, t_max, 4001, dtype=np.float32)
    shift = grid[:, None, None] * np.array(v)[None]  # (T, n, 2)
    lab = np.array(obb_collide(
        jnp.broadcast_to(c1, (grid.size, n, 2)), e1,
        jnp.broadcast_to(t1, (grid.size, n)),
        jnp.asarray(np.array(c2)[None] + shift), e2,
        jnp.broadcast_to(t2, (grid.size, n))))  # (T, n)
    first = np.where(lab.any(0), grid[np.argmax(lab > 0, 0)], np.inf)
    m = np.isfinite(toi)
    np.testing.assert_array_equal(m, np.isfinite(first))
    np.testing.assert_allclose(toi[m], first[m], atol=grid[1] + 1e-5)
    assert m.any() and (~m).any()

    # v = 0 degenerates bitwise to the static obb label
    static = np.array(obb_collide(c1, e1, t1, c2, e2, t2))
    toi0 = np.array(rect_translation_toi(c1, e1, t1, c2, e2, t2,
                                         jnp.zeros((n, 2))))
    np.testing.assert_array_equal(np.isfinite(toi0), static.astype(bool))
    assert (toi0[np.isfinite(toi0)] == 0).all()


def test_rect_time_of_impact_translation_lanes_exact():
    # w == 0 lanes of the general entry point ride the exact window:
    # a grazing translation that CA-at-64-iters misses resolves finite.
    from collide2d_tpu.ops.toi import rect_translation_toi

    c2 = jnp.asarray([[5.0, 1.9999]])
    v = jnp.asarray([[-1.0, 0.0]])
    args = (jnp.zeros((1, 2)), _sq(1), jnp.zeros(1), jnp.zeros((1, 2)),
            jnp.zeros(1), c2, _sq(1), jnp.zeros(1), v, jnp.zeros(1))
    got = np.array(rect_time_of_impact(*args, t_max=10.0, iters=64))
    want = np.array(rect_translation_toi(
        jnp.zeros((1, 2)), _sq(1), jnp.zeros(1), c2, _sq(1), jnp.zeros(1),
        v, t_max=10.0))
    np.testing.assert_array_equal(got, want)
    assert np.isfinite(got[0])
