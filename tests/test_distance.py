"""Signed distance (ops/distance.py) vs an independent dense-direction
support-gap oracle, closed forms, padding, the param-form rect surface,
and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from collide2d_tpu.ops.distance import (
    polygon_signed_distance,
    rect_signed_distance,
)
from collide2d_tpu.ops.sat import sat_polygons

from tests.test_sat import _regular_polygon


def _oracle_signed_distance(p1, p2, n_dirs=200_000):
    """max_u (support gap) over a dense unit-direction grid — an
    independent (direction-sampling, float64) formulation of the same
    definition; exact up to the grid's angular resolution."""
    th = np.linspace(0, 2 * np.pi, n_dirs, endpoint=False)
    u = np.stack([np.cos(th), np.sin(th)], -1)  # (D, 2)
    pr1 = np.asarray(p1, np.float64) @ u.T  # (k, D)
    pr2 = np.asarray(p2, np.float64) @ u.T
    return float((pr2.min(0) - pr1.max(0)).max())


def test_matches_dense_direction_oracle(rng):
    pairs, want = [], []
    for i in range(64):
        k1 = int(rng.integers(3, 9))
        k2 = int(rng.integers(3, 9))
        p1 = _regular_polygon(
            k1, rng.uniform(0.3, 2.0), rng.uniform(-4, 4),
            rng.uniform(-4, 4), rng.uniform(0, 2 * np.pi),
        )
        p2 = _regular_polygon(
            k2, rng.uniform(0.3, 2.0), rng.uniform(-4, 4),
            rng.uniform(-4, 4), rng.uniform(0, 2 * np.pi),
        )
        # repeat-pad to the fixed k=8 contract
        p1 = np.concatenate([p1, np.repeat(p1[-1:], 8 - k1, 0)])
        p2 = np.concatenate([p2, np.repeat(p2[-1:], 8 - k2, 0)])
        pairs.append((p1, p2))
        want.append(_oracle_signed_distance(p1, p2))
    P1 = jnp.asarray(np.stack([a for a, _ in pairs]))
    P2 = jnp.asarray(np.stack([b for _, b in pairs]))
    got = np.array(polygon_signed_distance(P1, P2))
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert (np.asarray(want) > 0).any() and (np.asarray(want) < 0).any()


def test_closed_forms():
    def square(cx, cy, half):
        return np.array(
            [[cx - half, cy - half], [cx + half, cy - half],
             [cx + half, cy + half], [cx - half, cy + half]], np.float32
        )

    a = square(0, 0, 1.0)
    cases = [
        (square(3.5, 0, 1.0), 1.5),        # face-face gap
        (square(1.5, 0, 1.0), -0.5),       # overlap along x -> -depth
        # corner-corner: closest corners (1,1) and (2,3) -> hypot(1,2)
        (square(3.0, 4.0, 1.0), float(np.hypot(1.0, 2.0))),
        # containment: cheapest escape is +x, push = 1 + 0.25 - 0.2
        (square(0.2, 0.1, 0.25), -1.05),
        (square(2.0, 0, 1.0), 0.0),        # exactly touching
    ]
    got = np.array(polygon_signed_distance(
        jnp.asarray(np.stack([a] * len(cases))),
        jnp.asarray(np.stack([c for c, _ in cases])),
    ))
    for g, (_, w) in zip(got, cases):
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_sign_agrees_with_sat(rng):
    n = 512
    p1 = np.stack([
        _regular_polygon(6, rng.uniform(0.3, 2.0), rng.uniform(-3, 3),
                         rng.uniform(-3, 3), rng.uniform(0, 7))
        for _ in range(n)
    ])
    p2 = np.stack([
        _regular_polygon(6, rng.uniform(0.3, 2.0), rng.uniform(-3, 3),
                         rng.uniform(-3, 3), rng.uniform(0, 7))
        for _ in range(n)
    ])
    d = np.array(polygon_signed_distance(jnp.asarray(p1), jnp.asarray(p2)))
    hit = np.array(sat_polygons(jnp.asarray(p1), jnp.asarray(p2)))
    clear = np.abs(d) > 1e-5  # away from the touching boundary
    np.testing.assert_array_equal((d < 0)[clear], (hit == 1)[clear])


def test_padding_and_mask_invariance(rng):
    hexes1 = np.stack([
        _regular_polygon(6, 1.0, rng.uniform(-3, 3), rng.uniform(-3, 3))
        for _ in range(32)
    ])
    hexes2 = np.stack([
        _regular_polygon(6, 1.0, rng.uniform(-3, 3), rng.uniform(-3, 3))
        for _ in range(32)
    ])
    base = np.array(polygon_signed_distance(
        jnp.asarray(hexes1), jnp.asarray(hexes2)))
    # repeat-last padding to k=8
    pad1 = np.concatenate([hexes1, np.repeat(hexes1[:, -1:], 2, 1)], 1)
    pad2 = np.concatenate([hexes2, np.repeat(hexes2[:, -1:], 2, 1)], 1)
    np.testing.assert_array_equal(
        np.array(polygon_signed_distance(jnp.asarray(pad1), jnp.asarray(pad2))),
        base,
    )
    # garbage padding + mask
    junk1, junk2 = pad1.copy(), pad2.copy()
    junk1[:, 6:] = 99.0
    junk2[:, 6:] = -77.0
    mask = np.arange(8) < 6
    m = jnp.asarray(np.broadcast_to(mask, (32, 8)))
    np.testing.assert_array_equal(
        np.array(polygon_signed_distance(
            jnp.asarray(junk1), jnp.asarray(junk2), mask1=m, mask2=m)),
        base,
    )


def test_rect_param_form(rng):
    n = 256
    c1 = jnp.asarray(rng.uniform(-4, 4, (n, 2)).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(-4, 4, (n, 2)).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(0.2, 3, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(0.2, 3, (n, 2)).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    d = np.array(rect_signed_distance(c1, e1, t1, c2, e2, t2))
    # sign must agree with the closed-form obb test away from touching
    from collide2d_tpu.ops.sat import obb_collide

    hit = np.array(obb_collide(c1, e1, t1, c2, e2, t2))
    clear = np.abs(d) > 1e-5
    np.testing.assert_array_equal((d < 0)[clear], (hit == 1)[clear])
    # and negative extents rectify like obb_collide
    np.testing.assert_array_equal(
        np.array(rect_signed_distance(c1, -e1, t1, c2, e2, t2)), d
    )


def test_translation_property():
    a = jnp.asarray(_regular_polygon(5, 1.0, 0.0, 0.0))[None]
    b0 = _regular_polygon(5, 1.0, 4.0, 0.0)
    for t in (0.0, 1.25, 3.5):
        b = jnp.asarray(b0 + np.array([t, 0.0], np.float32))[None]
        d0 = float(polygon_signed_distance(a, jnp.asarray(b0)[None])[0])
        d = float(polygon_signed_distance(a, b)[0])
        np.testing.assert_allclose(d, d0 + t, atol=1e-5)


def test_grad_is_contact_direction():
    # disjoint smooth configuration: gradient of d wrt p2's translation
    # is the unit vector from A's closest point toward B's.
    a = jnp.asarray(_regular_polygon(6, 1.0, 0.0, 0.0))
    b = jnp.asarray(_regular_polygon(6, 1.0, 5.0, 0.0))

    def d_of_shift(s):
        return polygon_signed_distance(a[None], (b + s)[None])[0]

    g = jax.grad(d_of_shift)(jnp.zeros(2))
    np.testing.assert_allclose(np.array(g), [1.0, 0.0], atol=1e-6)
    # finite-difference agreement (float32 => loose step/tol)
    eps = 1e-2
    fd = (d_of_shift(jnp.asarray([eps, 0.0])) -
          d_of_shift(jnp.asarray([-eps, 0.0]))) / (2 * eps)
    np.testing.assert_allclose(float(fd), 1.0, atol=1e-3)


def test_jit_and_vmap_compose():
    a = jnp.asarray(
        np.stack([_regular_polygon(4, 1.0, 0.0, 0.0)] * 16))
    b = jnp.asarray(
        np.stack([_regular_polygon(4, 1.0, 3.0 + i * 0.1, 0.0)
                  for i in range(16)]))
    jitted = jax.jit(polygon_signed_distance)
    np.testing.assert_allclose(
        np.array(jitted(a, b)),
        np.array(jax.vmap(polygon_signed_distance)(a, b)),
        rtol=1e-6,
    )


def test_model_surfaces(rng):
    from collide2d_tpu.models.collision_model import (
        CollisionProbabilityModel,
        PolygonCollisionProbabilityModel,
        example_polygon_configs,
    )

    n = 128
    model = CollisionProbabilityModel()
    position = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    wh = jnp.asarray(rng.uniform(0.2, 5, (n, 2)).astype(np.float32))
    d = np.array(model.distance(position, theta, wh))
    hit = np.array(model.collide(position, theta, wh, impl="jnp"))
    clear = np.abs(d) > 1e-5
    np.testing.assert_array_equal((d < 0)[clear], (hit == 1)[clear])
    # broadcastable scalar theta / (2,) obstacle, like collide(method='obb')
    d2 = model.distance(position, jnp.float32(0.3), jnp.asarray([2.0, 1.0]))
    assert d2.shape == (n,)

    b = example_polygon_configs(64, k=6, seed=3)
    pmodel = PolygonCollisionProbabilityModel(
        jnp.asarray([[-1.0, -0.5], [1.0, -0.5], [1.0, 0.5], [-1.0, 0.5]])
    )
    dp = np.array(pmodel.distance(b))
    hp = np.array(pmodel.collide(b))
    clear = np.abs(dp) > 1e-5
    np.testing.assert_array_equal((dp < 0)[clear], (hp == 1)[clear])
