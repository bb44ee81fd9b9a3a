"""SAT narrow phase vs the SAT.py oracle: bitwise parity + adversarial cases."""

import numpy as np
import jax.numpy as jnp
import pytest

import SAT
from collide2d_tpu.ops.sat import (
    sat_rects_reference,
    sat_rects,
    sat_polygons,
    obb_collide,
)
from collide2d_tpu.ops.geometry import rect_vertices, transform_vertices
from tests.conftest import random_rect_params, oracle_vertices


def _oracle_labels(V1, V2):
    return np.array(
        [SAT.convex_collide(V1[i].ravel(), V2[i].ravel()) for i in range(len(V1))]
    )


@pytest.fixture(scope="module")
def random_pairs(rng):
    n = 3000
    V1 = oracle_vertices(*random_rect_params(rng, n))
    V2 = oracle_vertices(*random_rect_params(rng, n))
    return V1, V2, _oracle_labels(V1, V2)


def test_reference_semantics_bitwise(random_pairs):
    V1, V2, labels = random_pairs
    got = np.array(sat_rects_reference(jnp.asarray(V1), jnp.asarray(V2)))
    assert labels.mean() > 0.05  # the sample actually exercises both classes
    np.testing.assert_array_equal(got, labels)


def test_fast_4axis_equals_reference(random_pairs):
    # Edges 2,3 of a rect negate edges 0,1 (exactly in real arithmetic,
    # to rounding in float32): labels agree except on a measure-zero
    # boundary set — this randomized check plus the exact-touch cases
    # below pin the equivalence.
    V1, V2, _ = random_pairs
    a = np.array(sat_rects_reference(jnp.asarray(V1), jnp.asarray(V2)))
    b = np.array(sat_rects(jnp.asarray(V1), jnp.asarray(V2)))
    np.testing.assert_array_equal(a, b)


def test_polygon_sat_agrees_on_rectangles(random_pairs):
    # For rectangles the true-normal axis set coincides with the
    # reference's edge-direction set, so labels agree.
    V1, V2, labels = random_pairs
    got = np.array(sat_polygons(jnp.asarray(V1), jnp.asarray(V2)))
    np.testing.assert_array_equal(got, labels)


def test_touching_rectangles_collide():
    # Strict < separation (utils.cu:178): shared-edge contact => collide.
    a = rect_vertices(2.0, 2.0)
    b = transform_vertices(rect_vertices(2.0, 2.0), 2.0, 0.0, 0.0)
    assert int(sat_rects_reference(a, b)) == 1
    assert int(sat_rects(a, b)) == 1
    # ...and an exact corner touch also collides
    c = transform_vertices(rect_vertices(2.0, 2.0), 2.0, 2.0, 0.0)
    assert int(sat_rects_reference(a, c)) == 1


def test_separated_contained_identical():
    a = rect_vertices(2.0, 2.0)
    far = transform_vertices(rect_vertices(1.0, 1.0), 10.0, 0.0, 0.5)
    inside = transform_vertices(rect_vertices(0.5, 0.5), 0.1, 0.1, 0.3)
    assert int(sat_rects(a, far)) == 0
    assert int(sat_rects(a, inside)) == 1  # containment: no separating axis
    assert int(sat_rects(a, a)) == 1


def test_near_touching_adversarial(rng):
    # Pairs straddling the contact boundary by +-eps along x.
    eps = np.float32(1e-6)
    a = rect_vertices(2.0, 2.0)
    overlapping = transform_vertices(rect_vertices(2.0, 2.0), 2.0 - eps, 0.0, 0.0)
    separated = transform_vertices(rect_vertices(2.0, 2.0), 2.0 + eps, 0.0, 0.0)
    assert int(sat_rects_reference(a, overlapping)) == 1
    assert int(sat_rects_reference(a, separated)) == 0


def test_negative_extent_rect_is_mirrored():
    # Shape noise can drive w+dw negative (utils.cu:144-157); the vertex
    # SAT handles the inverted rect via min/max, and obb_collide via abs.
    a = rect_vertices(2.0, 2.0)
    b = transform_vertices(rect_vertices(-1.0, 1.0), 1.2, 0.0, 0.0)
    b_pos = transform_vertices(rect_vertices(1.0, 1.0), 1.2, 0.0, 0.0)
    assert int(sat_rects_reference(a, b)) == int(sat_rects_reference(a, b_pos))


def _regular_polygon(k, radius, cx, cy, phase=0.0):
    ang = phase + 2 * np.pi * np.arange(k) / k
    return np.stack(
        [cx + radius * np.cos(ang), cy + radius * np.sin(ang)], -1
    ).astype(np.float32)


def test_polygon_sat_vs_polygon_oracle(rng):
    # k-gons (k in 3..8) vs the true-normal NumPy oracle.
    n = 400
    for k1 in (3, 5, 8):
        for k2 in (4, 6):
            got, want = [], []
            for _ in range(n // 8):
                p1 = _regular_polygon(
                    k1, rng.uniform(0.5, 2), rng.uniform(-3, 3), rng.uniform(-3, 3),
                    rng.uniform(0, 2 * np.pi),
                )
                p2 = _regular_polygon(
                    k2, rng.uniform(0.5, 2), rng.uniform(-3, 3), rng.uniform(-3, 3),
                    rng.uniform(0, 2 * np.pi),
                )
                want.append(SAT.convex_collide_polygons(p1, p2))
                got.append((p1, p2))
            P1 = jnp.asarray(np.stack([g[0] for g in got]))
            P2 = jnp.asarray(np.stack([g[1] for g in got]))
            res = np.array(sat_polygons(P1, P2))
            np.testing.assert_array_equal(res, np.array(want))


def test_polygon_padding_mask(rng):
    # A triangle padded to k=8 (repeat last vertex) with a mask must give
    # the same label as the unpadded triangle.
    for _ in range(50):
        p1 = _regular_polygon(3, rng.uniform(0.5, 2), rng.uniform(-2, 2), 0.0)
        p2 = _regular_polygon(4, rng.uniform(0.5, 2), rng.uniform(-2, 2), 0.0)
        want = SAT.convex_collide_polygons(p1, p2)
        pad = np.concatenate([p1, np.repeat(p1[-1:], 5, axis=0)])
        mask = np.array([True] * 3 + [False] * 5)
        got = int(
            sat_polygons(
                jnp.asarray(pad)[None], jnp.asarray(p2)[None], jnp.asarray(mask)[None]
            )[0]
        )
        assert got == want


def test_obb_closed_form_agrees(random_pairs, rng):
    # Closed-form OBB test vs vertex SAT on fresh random parameter sets
    # (allowing measure-zero boundary disagreements: none expected here).
    n = 3000
    w1, h1, x1, y1, t1 = random_rect_params(rng, n)
    w2, h2, x2, y2, t2 = random_rect_params(rng, n)
    V1 = oracle_vertices(w1, h1, x1, y1, t1)
    V2 = oracle_vertices(w2, h2, x2, y2, t2)
    want = np.array(sat_rects(jnp.asarray(V1), jnp.asarray(V2)))
    got = np.array(
        obb_collide(
            jnp.asarray(np.stack([x1, y1], -1)),
            jnp.asarray(np.stack([w1, h1], -1)),
            jnp.asarray(t1),
            jnp.asarray(np.stack([x2, y2], -1)),
            jnp.asarray(np.stack([w2, h2], -1)),
            jnp.asarray(t2),
        )
    )
    disagreement = (got != want).mean()
    assert disagreement <= 2e-4, disagreement


def test_polygon_mask_preserves_closing_edge_axis():
    # Regression: the separating axis here is ONLY the closing edge's
    # normal (last real vertex -> vertex 0). An earlier revision masked
    # that edge out for padded polygons and reported a false collision.
    p1 = np.array([[0, 0], [2, 0], [0, 2]], np.float32)
    p2 = p1 + np.array([-3.0, 1.5], np.float32)
    assert SAT.convex_collide_polygons(p1, p2) == 0
    pad1 = np.concatenate([p1, p1[-1:]])  # k=4, repeat-last padding
    pad2 = np.concatenate([p2, p2[-1:]])
    mask = np.array([True, True, True, False])
    got = int(
        sat_polygons(
            jnp.asarray(pad1)[None], jnp.asarray(pad2)[None],
            jnp.asarray(mask)[None], jnp.asarray(mask)[None],
        )[0]
    )
    assert got == 0
    # garbage padding + mask must give the same answer
    pad1g = np.concatenate([p1, np.full((1, 2), 99.0, np.float32)])
    got_g = int(
        sat_polygons(
            jnp.asarray(pad1g)[None], jnp.asarray(pad2)[None],
            jnp.asarray(mask)[None], jnp.asarray(mask)[None],
        )[0]
    )
    assert got_g == 0


def test_model_obb_method_surface(rng):
    # CollisionProbabilityModel.collide(method='obb') — the param-form
    # path (round-3): equals ops.sat.obb_collide exactly, agrees with the
    # vertex path except measure-zero boundary roundings, rejects bf16.
    import jax.numpy as jnp

    from collide2d_tpu.models.collision_model import CollisionProbabilityModel
    from collide2d_tpu.ops.sat import obb_collide

    n = 512
    model = CollisionProbabilityModel()
    position = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
    wh = jnp.asarray(rng.uniform(0.1, 5, (n, 2)).astype(np.float32))

    got = np.array(model.collide(position, theta, wh, method="obb",
                                 impl="jnp"))
    want = np.array(obb_collide(
        position, jnp.broadcast_to(model.robot_wh, position.shape), theta,
        jnp.zeros_like(position), wh, jnp.zeros_like(theta),
    ))
    np.testing.assert_array_equal(got, want)
    vertex = np.array(model.collide(position, theta, wh, impl="jnp"))
    assert (got != vertex).mean() < 0.01  # boundary roundings only
    with pytest.raises(ValueError, match="obb"):
        model.collide(position, theta, wh, method="obb", precision="bf16")
    with pytest.raises(ValueError, match="method"):
        model.collide(position, theta, wh, method="aabb")


def test_model_obb_broadcasts_on_both_impls(rng, monkeypatch):
    # A single (2,) obstacle_wh / scalar pose_theta must broadcast to the
    # batch on BOTH branches — the Pallas packer indexes exts[:, 0], so an
    # unbroadcast (2,) crashed the TPU path while the jnp path accepted it
    # (review r3 finding). Pallas branch driven in interpret mode.
    import functools

    import jax.numpy as jnp

    from collide2d_tpu.models.collision_model import CollisionProbabilityModel
    from collide2d_tpu.ops import sat_pallas
    from collide2d_tpu.ops.sat import obb_collide

    n = 64
    model = CollisionProbabilityModel()
    position = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    theta = jnp.float32(0.7)  # scalar: one pose for the whole batch
    wh = jnp.asarray([3.0, 2.0], jnp.float32)  # (2,): one obstacle size

    want = np.array(obb_collide(
        position, jnp.broadcast_to(model.robot_wh, position.shape),
        jnp.full((n,), theta),
        jnp.zeros_like(position), jnp.broadcast_to(wh, position.shape),
        jnp.zeros((n,), jnp.float32),
    ))
    got_jnp = np.array(
        model.collide(position, theta, wh, method="obb", impl="jnp")
    )
    np.testing.assert_array_equal(got_jnp, want)

    monkeypatch.setattr(
        sat_pallas, "obb_collide_pallas",
        functools.partial(sat_pallas.obb_collide_pallas, interpret=True),
    )
    got_pallas = np.array(
        model.collide(position, theta, wh, method="obb", impl="pallas")
    )
    np.testing.assert_array_equal(got_pallas, want)


def test_model_bf16_precision_surface(rng):
    # CollisionProbabilityModel.collide(precision='bf16') — the coarse-
    # labeling surface (round-3): labels equal the f32 SAT on explicitly
    # bf16-rounded vertices, on every platform (the TPU Pallas kernel
    # upcasts after the same rounding, so the contract is one set of
    # labels everywhere).
    import jax.numpy as jnp

    from collide2d_tpu.models.collision_model import CollisionProbabilityModel
    from collide2d_tpu.ops.geometry import rects_from_params
    from collide2d_tpu.ops.sat import sat_rects

    n = 256
    model = CollisionProbabilityModel()
    position = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
    wh = jnp.asarray(rng.uniform(0.1, 5, (n, 2)).astype(np.float32))

    robot = rects_from_params(
        position, jnp.broadcast_to(model.robot_wh, position.shape), theta
    ).astype(jnp.bfloat16).astype(jnp.float32)
    obstacle = rects_from_params(
        jnp.zeros_like(position), wh, jnp.zeros_like(theta)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    want = np.array(sat_rects(robot, obstacle))
    got = np.array(model.collide(position, theta, wh, precision="bf16",
                                 impl="jnp"))
    np.testing.assert_array_equal(got, want)
    # f32 default is unchanged and near-identical to coarse labels
    full = np.array(model.collide(position, theta, wh))
    assert (full != got).mean() < 0.02
    with pytest.raises(ValueError):
        model.collide(position, theta, wh, precision="fp8")
    # polygon surface carries the same contract
    from collide2d_tpu.ops.sat import sat_polygons

    tri = jnp.asarray(rng.uniform(-3, 3, (n, 3, 2)).astype(np.float32))
    hexa = jnp.asarray(rng.uniform(-3, 3, (n, 6, 2)).astype(np.float32))
    wantp = np.array(sat_polygons(
        tri.astype(jnp.bfloat16).astype(jnp.float32),
        hexa.astype(jnp.bfloat16).astype(jnp.float32),
    ))
    gotp = np.array(model.collide_polygons(tri, hexa, precision="bf16"))
    np.testing.assert_array_equal(gotp, wantp)
    with pytest.raises(ValueError):
        model.collide_polygons(tri, hexa, precision="bf16", broad_phase=True)
