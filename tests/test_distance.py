"""Signed distance (ops/distance.py) vs an independent dense-direction
support-gap oracle, closed forms, padding, the param-form rect surface,
and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from collide2d_tpu.ops.distance import (
    polygon_closest_points,
    polygon_signed_distance,
    rect_closest_points,
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


def _random_pair_batch(rng, n=96, spread=4.0):
    """Mixed-k (repeat-padded to 8) random convex pairs spanning overlap,
    touching-ish, and disjoint regimes."""
    P1, P2 = [], []
    for _ in range(n):
        k1, k2 = int(rng.integers(3, 9)), int(rng.integers(3, 9))
        p1 = _regular_polygon(
            k1, rng.uniform(0.3, 2.0), rng.uniform(-spread, spread),
            rng.uniform(-spread, spread), rng.uniform(0, 7))
        p2 = _regular_polygon(
            k2, rng.uniform(0.3, 2.0), rng.uniform(-spread, spread),
            rng.uniform(-spread, spread), rng.uniform(0, 7))
        P1.append(np.concatenate([p1, np.repeat(p1[-1:], 8 - k1, 0)]))
        P2.append(np.concatenate([p2, np.repeat(p2[-1:], 8 - k2, 0)]))
    return jnp.asarray(np.stack(P1)), jnp.asarray(np.stack(P2))


def _point_to_boundary(x, q):
    """float64 distance from point x to the boundary of polygon q."""
    q = np.asarray(q, np.float64)
    a, b = q, np.roll(q, -1, 0)
    e = b - a
    ee = (e * e).sum(-1)
    t = np.clip(
        ((x - a) * e).sum(-1) / np.where(ee > 0, ee, 1.0), 0, 1
    ) * (ee > 0)
    c = a + t[:, None] * e
    return float(np.sqrt(((x - c) ** 2).sum(-1).min()))


def test_closest_points_identity_and_resolution(rng):
    p1, p2 = _random_pair_batch(rng)
    d, pa, pb, nrm = polygon_closest_points(p1, p2)
    d, pa, pb, nrm = map(np.array, (d, pa, pb, nrm))
    # dist is exactly polygon_signed_distance (shared formulas).
    np.testing.assert_array_equal(
        d, np.array(polygon_signed_distance(p1, p2)))
    assert (d > 0).any() and (d < 0).any()
    # unit normal, and the witness identity pb - pa = dist * normal.
    np.testing.assert_allclose(
        np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        pb - pa, d[:, None] * nrm, atol=2e-5)
    # translating B by -dist*normal resolves to touching contact.
    moved = np.array(p2) - (d[:, None] * nrm)[:, None, :]
    d_after = np.array(polygon_signed_distance(p1, jnp.asarray(moved)))
    np.testing.assert_allclose(d_after, 0.0, atol=2e-4)


def test_closest_points_on_boundaries(rng):
    p1, p2 = _random_pair_batch(rng)
    d, pa, pb, nrm = map(
        np.array, polygon_closest_points(p1, p2))
    p1n, p2n = np.array(p1), np.array(p2)
    for i in range(len(d)):
        if d[i] > 1e-4:  # disjoint: both witnesses on the boundaries
            assert _point_to_boundary(pa[i], p1n[i]) < 2e-5
            assert _point_to_boundary(pb[i], p2n[i]) < 2e-5
        elif d[i] < -1e-4:  # overlap: pb is a vertex of B, pa sits on
            # A's supporting line along the MTV axis.
            assert np.min(np.linalg.norm(p2n[i] - pb[i], axis=-1)) < 1e-6
            support_a = (p1n[i] @ nrm[i]).max()
            assert abs(pa[i] @ nrm[i] - support_a) < 2e-5


def test_closest_points_closed_forms():
    def square(cx, cy, half):
        return np.array(
            [[cx - half, cy - half], [cx + half, cy - half],
             [cx + half, cy + half], [cx - half, cy + half]], np.float32)

    a = jnp.asarray(square(0, 0, 1.0))[None]
    # corner-corner: unique witnesses (1,1) on A and (2,3) on B.
    b = jnp.asarray(square(3.0, 4.0, 1.0))[None]
    d, pa, pb, nrm = map(np.array, polygon_closest_points(a, b))
    np.testing.assert_allclose(d, [np.hypot(1.0, 2.0)], atol=1e-6)
    np.testing.assert_allclose(pa[0], [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(pb[0], [2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(nrm[0], np.array([1.0, 2.0]) / np.sqrt(5),
                               atol=1e-6)
    # overlap along x, depth 0.5: normal = +x (push B right), pb on B's
    # min-x face, pa its image on A's x=+1 face.
    b = jnp.asarray(square(1.5, 0, 1.0))[None]
    d, pa, pb, nrm = map(np.array, polygon_closest_points(a, b))
    np.testing.assert_allclose(d, [-0.5], atol=1e-6)
    np.testing.assert_allclose(nrm[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pb[0][0], 0.5, atol=1e-6)
    np.testing.assert_allclose(pa[0][0], 1.0, atol=1e-6)
    np.testing.assert_allclose(pa[0][1], pb[0][1], atol=1e-6)


def test_rect_closest_points_param_form(rng):
    n = 128
    c1 = jnp.asarray(rng.uniform(-4, 4, (n, 2)).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(-4, 4, (n, 2)).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(0.2, 3, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(0.2, 3, (n, 2)).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    d, pa, pb, nrm = map(np.array,
                         rect_closest_points(c1, e1, t1, c2, e2, t2))
    np.testing.assert_array_equal(
        d, np.array(rect_signed_distance(c1, e1, t1, c2, e2, t2)))
    np.testing.assert_allclose(
        pb - pa, d[:, None] * nrm, atol=2e-5)
    # negative extents rectify exactly like rect_signed_distance
    d2 = np.array(rect_closest_points(c1, -e1, t1, c2, e2, t2)[0])
    np.testing.assert_array_equal(d2, d)


def test_closest_points_jit_and_mask(rng):
    hexes1 = np.stack([
        _regular_polygon(6, 1.0, rng.uniform(-3, 3), rng.uniform(-3, 3))
        for _ in range(16)])
    hexes2 = np.stack([
        _regular_polygon(6, 1.0, rng.uniform(-3, 3), rng.uniform(-3, 3))
        for _ in range(16)])
    base = [np.array(x) for x in polygon_closest_points(
        jnp.asarray(hexes1), jnp.asarray(hexes2))]
    # jit agrees on the distance; witnesses may differ at exact ties
    # (vertex-vertex closest pairs appear in BOTH candidate argmins with
    # equal d2, and fusion can flip the tie) but must still satisfy the
    # documented contract: pb - pa = dist * normal with |pb-pa| = |dist|.
    jitted = jax.jit(polygon_closest_points)
    dj, paj, pbj, nj = (np.array(x) for x in
                        jitted(jnp.asarray(hexes1), jnp.asarray(hexes2)))
    np.testing.assert_allclose(dj, base[0], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pbj - paj, dj[:, None] * nj, atol=2e-6)
    np.testing.assert_allclose(
        np.linalg.norm(pbj - paj, axis=-1), np.abs(dj), atol=2e-6)
    # garbage padding + mask reproduces the unpadded result exactly
    junk1 = np.concatenate([hexes1, np.full((16, 2, 2), 55.0, np.float32)], 1)
    junk2 = np.concatenate([hexes2, np.full((16, 2, 2), -9.0, np.float32)], 1)
    m = jnp.asarray(np.broadcast_to(np.arange(8) < 6, (16, 8)))
    got = polygon_closest_points(
        jnp.asarray(junk1), jnp.asarray(junk2), mask1=m, mask2=m)
    for g, w in zip(got, base):
        np.testing.assert_array_equal(np.array(g), w)


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

    # closest_points surfaces: dist matches distance(), identity holds.
    dr, par, pbr, nr = model.closest_points(
        position, theta, jnp.asarray([2.0, 1.0]))
    np.testing.assert_array_equal(
        np.array(dr),
        np.array(model.distance(position, theta, jnp.asarray([2.0, 1.0]))))
    np.testing.assert_allclose(
        np.array(pbr - par), np.array(dr)[:, None] * np.array(nr),
        atol=2e-5)
    dq, paq, pbq, nq = pmodel.closest_points(b)
    np.testing.assert_array_equal(dq, pmodel.distance(b))
    np.testing.assert_allclose(
        np.array(pbq - paq), np.array(dq)[:, None] * np.array(nq),
        atol=2e-5)
