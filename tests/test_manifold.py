"""Contact-manifold tests: closed forms, penetration consistency,
boundary membership, padding/mask invariance, margin semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collide2d_tpu.ops.distance import polygon_signed_distance
from collide2d_tpu.ops.manifold import (
    polygon_contact_manifold,
    rect_contact_manifold,
)
from collide2d_tpu.ops.geometry import rects_from_params
from tests.test_distance import _point_to_boundary, _random_pair_batch


@pytest.fixture
def rng():
    return np.random.default_rng(20260819)


def _square(cx, cy, half):
    return np.array(
        [
            [cx - half, cy - half],
            [cx + half, cy - half],
            [cx + half, cy + half],
            [cx - half, cy + half],
        ],
        np.float32,
    )


def test_axis_aligned_face_contact_closed_form():
    # [0,4]x[0,2] vs [3,7]x[0,2]: x-overlap of 1, full y face contact.
    a = np.array([[0, 0], [4, 0], [4, 2], [0, 2]], np.float32)
    b = np.array([[3, 0], [7, 0], [7, 2], [3, 2]], np.float32)
    count, pts, dep, nrm = map(
        np.array, polygon_contact_manifold(jnp.asarray(a), jnp.asarray(b))
    )
    assert count == 2
    np.testing.assert_allclose(nrm, [1.0, 0.0], atol=1e-6)
    # Contact points: the incident (-x) face of b at x=3, clipped to
    # y in [0,2]; depths = 4 - 3 = 1 at both.
    got = pts[np.argsort(pts[:, 1])]
    np.testing.assert_allclose(got, [[3, 0], [3, 2]], atol=1e-6)
    np.testing.assert_allclose(dep, [1.0, 1.0], atol=1e-6)


def test_side_clipping_limits_face_extent():
    # Small box resting mid-face on a wide box, overlapping by 0.25:
    # clip must NOT extend past the small box's own face.
    big = _square(0.0, 0.0, 4.0)  # top face at y = 4
    # half=1 centered (1.0, 4.75): bottom face y = 3.75, overlapping
    # big's top face by 0.25, spanning x in [0, 2] (inside big's face).
    small = _square(1.0, 4.75, 1.0)
    count, pts, dep, nrm = map(
        np.array,
        polygon_contact_manifold(jnp.asarray(big), jnp.asarray(small)),
    )
    assert count == 2
    np.testing.assert_allclose(nrm, [0.0, 1.0], atol=1e-6)
    got = pts[np.argsort(pts[:, 0])]
    np.testing.assert_allclose(got, [[0.0, 3.75], [2.0, 3.75]], atol=1e-5)
    np.testing.assert_allclose(dep, [0.25, 0.25], atol=1e-6)


def test_disjoint_pairs_have_empty_manifolds(rng):
    p1, p2 = _random_pair_batch(rng)
    d = np.array(polygon_signed_distance(p1, p2))
    count, _, _, _ = map(np.array, polygon_contact_manifold(p1, p2))
    assert (count[d > 1e-4] == 0).all()
    assert (count[d < -1e-4] >= 1).all()


def test_resolution_and_boundary_properties(rng):
    p1, p2 = _random_pair_batch(rng, n=128)
    d = np.array(polygon_signed_distance(p1, p2))
    count, pts, dep, nrm = map(np.array, polygon_contact_manifold(p1, p2))
    p1n, p2n = np.array(p1), np.array(p2)
    checked = 0
    for i in range(len(d)):
        if d[i] >= -1e-4 or count[i] == 0:
            continue
        checked += 1
        assert abs(np.linalg.norm(nrm[i]) - 1.0) < 1e-5
        pen = -d[i]
        dmax = dep[i][: count[i]].max()
        # Clipped manifold depth never exceeds the true penetration and
        # reaches it for face-dominated contacts (checked in aggregate
        # below via the shallow subset).
        assert dmax <= pen + 1e-4
        # Every valid contact point lies on the incident body's boundary
        # (one of the two bodies).
        for p in pts[i][: count[i]]:
            b1 = _point_to_boundary(p, p1n[i])
            b2 = _point_to_boundary(p, p2n[i])
            assert min(b1, b2) < 1e-4
        # Translating body 2 by dmax * normal reduces the penetration to
        # (at most) the clipped-away remainder; for shallow contacts it
        # resolves to ~touching.
        if pen < 0.15:
            moved = p2n[i] + dmax * nrm[i]
            d_after = float(
                polygon_signed_distance(
                    jnp.asarray(p1n[i]), jnp.asarray(moved)
                )
            )
            assert d_after > -0.02
    assert checked >= 10  # the batch genuinely exercised overlaps


def test_shallow_face_contact_matches_penetration(rng):
    # Pairs constructed to touch face-on with small overlap: depth must
    # equal the signed-distance penetration tightly.
    for trial in range(16):
        w = float(rng.uniform(1.0, 3.0))
        overlap = float(rng.uniform(0.01, 0.2))
        th = float(rng.uniform(0, 2 * np.pi))
        c, s = np.cos(th), np.sin(th)
        rot = np.array([[c, -s], [s, c]], np.float32)
        a = _square(0, 0, 1.0) @ rot.T
        b = (_square(0, 0, w) + np.array([0, 1.0 + w - overlap])) @ rot.T
        d = float(polygon_signed_distance(jnp.asarray(a), jnp.asarray(b)))
        count, pts, dep, nrm = map(
            np.array,
            polygon_contact_manifold(jnp.asarray(a), jnp.asarray(b)),
        )
        assert count == 2
        np.testing.assert_allclose(dep[:count].max(), -d, atol=1e-5)
        # Normal maps to the rotated +y direction (from a into b).
        np.testing.assert_allclose(
            np.abs(nrm @ rot[:, 1]), 1.0, atol=1e-5
        )


def test_margin_keeps_speculative_contacts():
    a = _square(0, 0, 1.0)
    b = _square(0, 2.05, 1.0)  # gap of 0.05 along y
    count0, _, _, _ = map(
        np.array, polygon_contact_manifold(jnp.asarray(a), jnp.asarray(b))
    )
    assert count0 == 0
    count, pts, dep, nrm = map(
        np.array,
        polygon_contact_manifold(
            jnp.asarray(a), jnp.asarray(b), margin=0.1
        ),
    )
    assert count == 2
    np.testing.assert_allclose(dep, [-0.05, -0.05], atol=1e-6)
    np.testing.assert_allclose(nrm, [0.0, 1.0], atol=1e-6)


def test_padding_and_mask_invariance(rng):
    from tests.test_sat import _regular_polygon

    p1 = _regular_polygon(5, 1.2, 0.0, 0.0, 0.3)
    p2 = _regular_polygon(6, 1.0, 0.9, 0.4, 1.1)
    base = polygon_contact_manifold(jnp.asarray(p1), jnp.asarray(p2))
    pad1 = np.concatenate([p1, np.repeat(p1[-1:], 3, 0)])
    pad2 = np.concatenate([p2, np.repeat(p2[-1:], 2, 0)])
    padded = polygon_contact_manifold(jnp.asarray(pad1), jnp.asarray(pad2))
    arb1 = np.concatenate([p1, np.zeros((3, 2), np.float32)])
    arb2 = np.concatenate([p2, np.full((2, 2), 7.0, np.float32)])
    m1 = jnp.asarray([True] * 5 + [False] * 3)
    m2 = jnp.asarray([True] * 6 + [False] * 2)
    masked = polygon_contact_manifold(
        jnp.asarray(arb1), jnp.asarray(arb2), mask1=m1, mask2=m2
    )
    for other in (padded, masked):
        for x, y in zip(base, other):
            np.testing.assert_allclose(
                np.array(x), np.array(y), atol=1e-6
            )


def test_rect_param_form_matches_vertex_path(rng):
    n = 64
    c1 = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    c2 = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    e1 = rng.uniform(0.5, 3, (n, 2)).astype(np.float32)
    e2 = rng.uniform(0.5, 3, (n, 2)).astype(np.float32)
    t1 = rng.uniform(0, 7, n).astype(np.float32)
    t2 = rng.uniform(0, 7, n).astype(np.float32)
    got = rect_contact_manifold(c1, e1, t1, c2, e2, t2)
    want = polygon_contact_manifold(
        rects_from_params(jnp.asarray(c1), jnp.asarray(e1), jnp.asarray(t1)),
        rects_from_params(jnp.asarray(c2), jnp.asarray(e2), jnp.asarray(t2)),
    )
    for x, y in zip(got, want):
        np.testing.assert_array_equal(np.array(x), np.array(y))


def test_jit_vmap_grad_safety(rng):
    p1, p2 = _random_pair_batch(rng, n=16)
    eager = polygon_contact_manifold(p1, p2)
    jitted = jax.jit(polygon_contact_manifold)(p1, p2)
    vmapped = jax.vmap(polygon_contact_manifold)(p1, p2)
    for a, b, c in zip(eager, jitted, vmapped):
        np.testing.assert_allclose(
            np.array(a), np.array(b), atol=1e-6
        )
        np.testing.assert_allclose(
            np.array(a), np.array(c), atol=1e-6
        )


def test_model_facade_surfaces(rng):
    from collide2d_tpu.models.collision_model import (
        CollisionProbabilityModel,
        PolygonCollisionProbabilityModel,
        example_polygon_configs,
    )

    n = 96
    model = CollisionProbabilityModel()
    position = jnp.asarray(rng.uniform(-5, 5, (n, 2)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    wh = jnp.asarray([3.0, 2.0])
    count, pts, dep, nrm = map(
        np.array, model.contact_manifold(position, theta, wh)
    )
    d = np.array(model.distance(position, theta, wh))
    assert (count[d > 1e-4] == 0).all()
    assert (count[d < -1e-4] >= 1).all()
    for i in range(n):
        if d[i] < -1e-4:
            assert dep[i][: count[i]].max() <= -d[i] + 1e-4

    b = example_polygon_configs(48, k=6, seed=5)
    pmodel = PolygonCollisionProbabilityModel(
        jnp.asarray([[-1.0, -0.5], [1.0, -0.5], [1.0, 0.5], [-1.0, 0.5]])
    )
    pc, _, pdep, _ = map(np.array, pmodel.contact_manifold(b))
    pd = np.array(pmodel.distance(b))
    assert (pc[pd > 1e-4] == 0).all()
    assert (pc[pd < -1e-4] >= 1).all()


def test_degenerate_all_zero_edges_empty_manifold():
    # Regression (round-3 review): BOTH bodies fully degenerate (one
    # vertex repeated k times — every face invalid, best separation
    # -inf) must return the documented empty manifold, not count=2
    # along a zero normal.
    pt = np.tile(np.array([[0.5, 0.5]], np.float32), (4, 1))
    count, _, _, _ = map(
        np.array, polygon_contact_manifold(jnp.asarray(pt), jnp.asarray(pt))
    )
    assert count == 0

    # A degenerate point against a REAL polygon still has valid faces on
    # one side: the point inside the square is a legitimate contact
    # (reference face on the square, incident face collapses to the
    # point), with a unit normal and the point's true face depth.
    sq = _square(0.0, 0.0, 1.0)
    for a, b, sgn in ((pt, sq, -1.0), (sq, pt, 1.0)):
        count, pts, dep, nrm = map(
            np.array,
            polygon_contact_manifold(jnp.asarray(a), jnp.asarray(b)),
        )
        assert count >= 1
        np.testing.assert_allclose(np.linalg.norm(nrm), 1.0, atol=1e-6)
        for p in pts[:count]:
            np.testing.assert_allclose(p, [0.5, 0.5], atol=1e-6)
        # Depth = distance from the point to the square's nearest face.
        np.testing.assert_allclose(dep[:count], 0.5, atol=1e-6)


def test_pallas_kernel_matches_xla_interpret(rng):
    from collide2d_tpu.ops.manifold_pallas import polygon_manifold_pallas

    p1, p2 = _random_pair_batch(rng, n=160)
    want = [np.array(a) for a in polygon_contact_manifold(p1, p2)]
    got = [
        np.array(a) for a in polygon_manifold_pallas(p1, p2, interpret=True)
    ]
    np.testing.assert_array_equal(got[0], want[0])  # counts exact
    assert (want[0] > 0).sum() >= 8  # the batch has real contacts
    for i in range(len(want[0])):
        c = int(want[0][i])
        if c == 0:
            continue
        np.testing.assert_allclose(got[1][i][:c], want[1][i][:c], atol=2e-5)
        np.testing.assert_allclose(got[2][i][:c], want[2][i][:c], atol=2e-5)
        np.testing.assert_allclose(got[3][i], want[3][i], atol=2e-5)


def test_pallas_kernel_margin_and_degenerate(rng):
    from collide2d_tpu.ops.manifold_pallas import polygon_manifold_pallas

    # Speculative margin: mirror the XLA margin test through the kernel.
    a = np.broadcast_to(_square(0, 0, 1.0), (8, 4, 2)).copy()
    b = np.broadcast_to(_square(0, 2.05, 1.0), (8, 4, 2)).copy()
    count, pts, dep, nrm = map(
        np.array,
        polygon_manifold_pallas(
            jnp.asarray(a), jnp.asarray(b), margin=0.1, interpret=True
        ),
    )
    assert (count == 2).all()
    np.testing.assert_allclose(dep, -0.05, atol=1e-6)
    np.testing.assert_allclose(
        nrm, np.broadcast_to([0.0, 1.0], nrm.shape), atol=1e-6
    )

    # Both-degenerate rows -> empty manifold, same as the XLA fix.
    pt = np.tile(np.array([[0.5, 0.5]], np.float32), (8, 4, 1))
    count, _, _, _ = map(
        np.array,
        polygon_manifold_pallas(
            jnp.asarray(pt), jnp.asarray(pt), interpret=True
        ),
    )
    assert (count == 0).all()


def test_pallas_kernel_non_aligned_n_and_mixed_k(rng):
    from collide2d_tpu.ops.manifold_pallas import polygon_manifold_pallas

    # n not a multiple of 8*block exercises the pair padding; k1 != k2
    # exercises the in-kernel common-k incident loop.
    p1, p2 = _random_pair_batch(rng, n=96)
    p1 = p1[:41, :5]  # k=5 slice of repeat-padded 8-gons stays convex?
    # no: slicing vertices breaks convex closure — instead repeat-pad a
    # true pentagon batch.
    from tests.test_sat import _regular_polygon

    P1 = np.stack([
        _regular_polygon(5, 1.0 + 0.1 * i, 0.1 * i, -0.05 * i, 0.3 * i)
        for i in range(41)
    ])
    P2 = np.stack([
        np.concatenate([
            (g := _regular_polygon(7, 0.8 + 0.05 * i, 0.6, 0.2 * i - 2.0,
                                   0.1 * i)),
            np.repeat(g[-1:], 1, 0),
        ])
        for i in range(41)
    ])  # k=8 repeat-padded 7-gons
    want = [
        np.array(a)
        for a in polygon_contact_manifold(jnp.asarray(P1), jnp.asarray(P2))
    ]
    got = [
        np.array(a)
        for a in polygon_manifold_pallas(
            jnp.asarray(P1), jnp.asarray(P2), interpret=True, block=8
        )
    ]
    np.testing.assert_array_equal(got[0], want[0])
    for i in range(41):
        c = int(want[0][i])
        if c:
            np.testing.assert_allclose(
                got[1][i][:c], want[1][i][:c], atol=2e-5
            )
            np.testing.assert_allclose(
                got[3][i], want[3][i], atol=2e-5
            )


def test_fused_kernels_beyond_k8(rng):
    # The documented fixed-k contract is k <= 8, but the kernels are
    # generically unrolled: pin k = 12 so the wider-k capability (and
    # its parity with the XLA paths) doesn't silently regress.
    from collide2d_tpu.ops.distance import polygon_signed_distance
    from collide2d_tpu.ops.distance_pallas import polygon_distance_pallas
    from collide2d_tpu.ops.manifold_pallas import polygon_manifold_pallas
    from collide2d_tpu.ops.polygon_pallas import sat_polygons_pallas
    from collide2d_tpu.ops.sat import sat_polygons

    k, n = 12, 64
    ang = np.linspace(0, 2 * np.pi, k, endpoint=False)

    def batch(seed):
        r = np.random.default_rng(seed)
        a = ang[None] + r.uniform(0, 7, n)[:, None]
        rad = r.uniform(0.5, 2, n)[:, None]
        return jnp.asarray(np.stack([
            r.uniform(-3, 3, n)[:, None] + rad * np.cos(a),
            r.uniform(-3, 3, n)[:, None] + rad * np.sin(a),
        ], -1).astype(np.float32))

    p1, p2 = batch(0), batch(1)
    np.testing.assert_array_equal(
        np.array(sat_polygons_pallas(p1, p2, interpret=True, block=8)),
        np.array(sat_polygons(p1, p2)),
    )
    np.testing.assert_allclose(
        np.array(polygon_distance_pallas(p1, p2, interpret=True, block=8)),
        np.array(polygon_signed_distance(p1, p2)),
        atol=2e-5,
    )
    want = [np.array(a) for a in polygon_contact_manifold(p1, p2)]
    got = [
        np.array(a)
        for a in polygon_manifold_pallas(p1, p2, interpret=True, block=8)
    ]
    np.testing.assert_array_equal(got[0], want[0])
    assert (want[0] > 0).sum() >= 5
    for i in range(n):
        c = int(want[0][i])
        if c:
            np.testing.assert_allclose(
                got[1][i][:c], want[1][i][:c], atol=3e-5
            )
