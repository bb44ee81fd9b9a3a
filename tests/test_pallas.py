"""Pallas kernels vs the XLA paths.

The SAT kernels run in interpreter mode on CPU (bitwise checks); the MC
kernel needs the hardware PRNG, so its statistical test is gated to real
TPU (it also runs in the `bench.py`/pipeline flows on hardware).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from collide2d_tpu.ops.sat import sat_rects
from collide2d_tpu.ops.sat_pallas import (
    pack_rects,
    sat_count_pallas_t,
    sat_rects_pallas,
    sat_rects_pallas_t,
    unpack_labels,
)
from collide2d_tpu.utils.benchmarks import _random_pairs

BLOCK = 128  # small block for fast interpreter runs


@pytest.fixture(scope="module")
def pairs():
    r1, r2 = _random_pairs(8 * 4 * BLOCK, seed=7)
    return r1, r2


def test_pack_unpack_roundtrip(pairs):
    r1, _ = pairs
    t = pack_rects(r1)
    assert t.shape == (8, 8, r1.shape[0] // 8)
    # pair p lives at (s, l) = (p // M, p % M); coordinate rows are
    # x0..x3,y0..y3 of the (N, 4, 2) layout.
    p = 37
    m = r1.shape[0] // 8
    np.testing.assert_array_equal(
        np.array(t[:, p // m, p % m]),
        np.array(r1[p]).reshape(8)[[0, 2, 4, 6, 1, 3, 5, 7]],
    )


def test_label_kernel_bitwise(pairs):
    r1, r2 = pairs
    want = np.array(sat_rects(r1, r2))
    got = np.array(
        sat_rects_pallas_t(
            pack_rects(r1), pack_rects(r2), block=BLOCK, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def test_count_kernel_matches_sum(pairs):
    r1, r2 = pairs
    want = int(np.array(sat_rects(r1, r2)).sum())
    got = float(
        sat_count_pallas_t(pack_rects(r1), pack_rects(r2), block=BLOCK, interpret=True)
    )
    assert int(got) == want


def test_wrapper_pads_arbitrary_n():
    r1, r2 = _random_pairs(1000, seed=3)  # not a multiple of 8*BLOCK
    want = np.array(sat_rects(r1, r2))
    got = np.array(sat_rects_pallas(r1, r2, block=BLOCK, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_shift_scalar_moves_r2(pairs):
    # shift is a real geometric translation of r2 (both coords), used by
    # benchmarks to defeat hoisting; a huge shift separates every pair.
    r1, r2 = pairs
    got = np.array(
        sat_rects_pallas_t(
            pack_rects(r1), pack_rects(r2), shift=1e6, block=BLOCK, interpret=True
        )
    )
    assert got.sum() == 0


def test_bf16_input_path(pairs):
    from collide2d_tpu.ops.sat_pallas import pack_rects_bf16

    r1, r2 = pairs
    # lossless case: coordinates already bf16-representable -> labels
    # bitwise-equal to the f32 path (upcast is exact)
    r1q = jnp.asarray(r1, jnp.bfloat16).astype(jnp.float32)
    r2q = jnp.asarray(r2, jnp.bfloat16).astype(jnp.float32)
    want = np.array(
        sat_rects_pallas_t(pack_rects(r1q), pack_rects(r2q), block=BLOCK, interpret=True)
    )
    got = np.array(
        sat_rects_pallas_t(
            pack_rects_bf16(r1q), pack_rects_bf16(r2q), block=BLOCK, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)
    # lossy case: random f32 coords — labels agree except near-touching
    # pairs within the ~0.4% coordinate rounding
    full = np.array(sat_rects(r1, r2))
    coarse = np.array(
        sat_rects_pallas_t(
            pack_rects_bf16(r1), pack_rects_bf16(r2), block=BLOCK, interpret=True
        )
    )
    assert (full != coarse).mean() < 0.02


def _regular_polygon(rng, k, rmax=2.0):
    ang = rng.uniform(0, 2 * np.pi) + 2 * np.pi * np.arange(k) / k
    r = rng.uniform(0.5, rmax)
    cx, cy = rng.uniform(-3, 3, 2)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], -1).astype(
        np.float32
    )


def test_polygon_kernel_vs_jnp_and_oracle(rng):
    import SAT
    from collide2d_tpu.ops.polygon_pallas import pad_polygons, sat_polygons_pallas
    from collide2d_tpu.ops.sat import sat_polygons

    n = 200
    k1s = rng.integers(3, 9, n)
    k2s = rng.integers(3, 9, n)
    P1 = np.zeros((n, 8, 2), np.float32)
    P2 = np.zeros((n, 8, 2), np.float32)
    want = np.zeros(n, np.int32)
    for i in range(n):
        a = _regular_polygon(rng, int(k1s[i]))
        b = _regular_polygon(rng, int(k2s[i]))
        want[i] = SAT.convex_collide_polygons(a, b)
        P1[i] = np.asarray(pad_polygons(jnp.asarray(a)[None], 8))[0]
        P2[i] = np.asarray(pad_polygons(jnp.asarray(b)[None], 8))[0]

    # repeat-padding needs no masks: zero axes never separate, duplicate
    # vertices never move an interval bound
    got_jnp = np.array(sat_polygons(jnp.asarray(P1), jnp.asarray(P2)))
    np.testing.assert_array_equal(got_jnp, want)
    got_pal = np.array(
        sat_polygons_pallas(jnp.asarray(P1), jnp.asarray(P2), block=64, interpret=True)
    )
    np.testing.assert_array_equal(got_pal, want)


def test_polygon_bf16_input_path(rng):
    # bf16 polygon SAT (round-3: flag parity with the rect kernel's bf16
    # path): labels equal the f32 kernel on bf16-representable inputs,
    # and the precision='bf16' wrapper equals the XLA path on explicitly
    # rounded coordinates (upcast-on-load is exact).
    from collide2d_tpu.ops.polygon_pallas import (
        pack_polygons_bf16,
        sat_polygons_pallas,
        sat_polygons_pallas_t,
    )
    from collide2d_tpu.ops.sat import sat_polygons

    n, k = 128, 6
    P1 = np.stack([_regular_polygon(rng, k) for _ in range(n)])
    P2 = np.stack([_regular_polygon(rng, k) for _ in range(n)])
    P1q = np.asarray(jnp.asarray(P1, jnp.bfloat16).astype(jnp.float32))
    P2q = np.asarray(jnp.asarray(P2, jnp.bfloat16).astype(jnp.float32))
    want = np.array(sat_polygons(jnp.asarray(P1q), jnp.asarray(P2q)))
    got_t = np.array(
        sat_polygons_pallas_t(
            pack_polygons_bf16(jnp.asarray(P1q)),
            pack_polygons_bf16(jnp.asarray(P2q)),
            k1=k, k2=k, block=16, interpret=True,
        )
    )
    np.testing.assert_array_equal(got_t, want)
    got_w = np.array(
        sat_polygons_pallas(
            jnp.asarray(P1), jnp.asarray(P2), block=16, interpret=True,
            precision="bf16",
        )
    )
    np.testing.assert_array_equal(got_w, want)
    # lossy vs the unrounded path: only near-touching pairs may flip
    full = np.array(sat_polygons(jnp.asarray(P1), jnp.asarray(P2)))
    assert (full != got_w).mean() < 0.02


def test_polygon_kernel_mixed_k(rng):
    from collide2d_tpu.ops.polygon_pallas import sat_polygons_pallas
    from collide2d_tpu.ops.sat import sat_polygons

    # K1 != K2 without padding (triangles vs hexagons)
    n = 128
    P1 = np.stack([_regular_polygon(rng, 3) for _ in range(n)])
    P2 = np.stack([_regular_polygon(rng, 6) for _ in range(n)])
    want = np.array(sat_polygons(jnp.asarray(P1), jnp.asarray(P2)))
    got = np.array(
        sat_polygons_pallas(jnp.asarray(P1), jnp.asarray(P2), block=64, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("normal_method", ["box_muller", "erfinv"])
def test_mc_kernel_math_interpret(rng, monkeypatch, normal_method):
    """Off-TPU CI coverage of the fused MC kernel's OBB math (both
    normal-draw methods: erfinv is the production default, Box-Muller
    the A/B alternative).

    The hardware PRNG has no CPU lowering, so the uniform source is
    stubbed with a deterministic iota-hash. Two checks:

    1. WIRING, bit-for-bit: the same draws replayed through the module's
       own draw-pair fn and `_obb_separated` (the tile functions the
       kernel itself calls) must reproduce the kernel's counts exactly —
       pins packing, seeds-plumbing, the paired-draw order, and
       accumulation.
    2. SEMANTICS: the counts must equal `ops.sat.obb_collide` on the same
       noise. The kernel's relative-angle form rounds differently, so
       labels could in principle flip on exactly-touching inputs; the
       draws here are deterministic, and on them the agreement is exact.
    """
    import collide2d_tpu.ops.mc_pallas as mcp
    from collide2d_tpu.mc.estimator import Configs
    from collide2d_tpu.ops.sat import obb_collide
    from tests.conftest import deterministic_uniform_stub

    C = mcp.LANE_CONFIGS  # one grid block
    sub = 16  # two samples per row x 8 rows
    cfgs = Configs(
        position=jnp.asarray(rng.uniform(-6, 6, (C, 2)).astype(np.float32)),
        pose_theta=jnp.asarray(rng.uniform(0, 2 * np.pi, C).astype(np.float32)),
        obstacle_wh=jnp.asarray(rng.uniform(0.5, 5, (C, 2)).astype(np.float32)),
        std_dev=jnp.asarray(rng.uniform(0, 0.4, (C, 5)).astype(np.float32)),
    )
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    params = mcp.pack_mc_params(cfgs, robot)

    stub = deterministic_uniform_stub()
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", stub)
    counts = np.array(
        mcp.mc_counts_pallas(
            jnp.asarray([1, 2], jnp.int32), params, jnp.int32(1),
            sub=sub, interpret=True, normal_method=normal_method,
        )
    )

    # Replay the same ten draws through the module's own draw-pair fn
    # (the stub depends only on (shape, call index) — reset and repeat):
    # five pairs of shape (sub/2, C), halves a/b = two samples per row.
    replay = deterministic_uniform_stub()
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", replay)
    draw = (mcp._box_muller if normal_method == "box_muller"
            else mcp._erfinv_pair)
    shape = (sub // 2, C)
    za_dx, zb_dx = draw(shape)
    za_dy, zb_dy = draw(shape)
    za_th, zb_th = draw(shape)
    za_dw, zb_dw = draw(shape)
    za_dh, zb_dh = draw(shape)

    p = np.asarray(params)
    prow = lambda i: jnp.asarray(p[i])[None, :]  # (1, C), as in the kernel
    args = (
        prow(0), prow(1), prow(2), prow(3), prow(13), prow(4), prow(5),
        prow(6), prow(7), prow(8), prow(9), prow(10), prow(11), prow(12),
    )
    sep_a = mcp._obb_separated(*args, za_dx, za_dy, za_th, za_dw, za_dh)
    sep_b = mcp._obb_separated(*args, zb_dx, zb_dy, zb_th, zb_dw, zb_dh)
    hits = jnp.logical_not(sep_a).astype(jnp.int32) + jnp.logical_not(
        sep_b
    ).astype(jnp.int32)
    want_wiring = np.array(jnp.sum(hits, axis=0, dtype=jnp.int32))
    np.testing.assert_array_equal(counts, want_wiring)

    # Semantic check against the independent closed-form OBB test.
    sd = cfgs.std_dev
    want_sem = np.zeros((C,), np.int64)
    for z_dx, z_dy, z_th, z_dw, z_dh in (
        (za_dx, za_dy, za_th, za_dw, za_dh),
        (zb_dx, zb_dy, zb_th, zb_dw, zb_dh),
    ):
        rows = sub // 2
        offsets = jnp.stack(
            [z_dx * sd[None, :, 0], z_dy * sd[None, :, 1]], axis=-1
        )
        dwh = jnp.stack([z_dw * sd[None, :, 3], z_dh * sd[None, :, 4]], axis=-1)
        hit = obb_collide(
            jnp.broadcast_to(cfgs.position, (rows, C, 2)),
            jnp.broadcast_to(robot, (rows, C, 2)),
            jnp.broadcast_to(cfgs.pose_theta, (rows, C)),
            offsets,
            cfgs.obstacle_wh[None] + dwh,
            z_th * sd[None, :, 2],
        )
        want_sem += np.array(jnp.sum(hit, axis=0, dtype=jnp.int32))
    np.testing.assert_array_equal(counts, want_sem)


@pytest.mark.parametrize("normal_method", ["box_muller", "erfinv"])
def test_mc_kernel_no_shape_noise_interpret(rng, monkeypatch, normal_method):
    """shape_noise=False (the reference default: w/h sigmas zero) draws
    only THREE Box-Muller pairs per step. With zero w/h sigmas the
    5-draw and 3-draw kernels see different streams, so equality is
    checked against a replay: the same six draws through the module's
    own tile functions with z_dw = z_dh = None must reproduce the counts
    bit-for-bit, and must equal the closed-form `obb_collide` on the
    same noise with zero extent perturbation."""
    import collide2d_tpu.ops.mc_pallas as mcp
    from collide2d_tpu.mc.estimator import Configs
    from collide2d_tpu.ops.sat import obb_collide
    from tests.conftest import deterministic_uniform_stub

    C = mcp.LANE_CONFIGS
    sub = 16
    sd = rng.uniform(0, 0.4, (C, 5)).astype(np.float32)
    sd[:, 3:] = 0.0
    cfgs = Configs(
        position=jnp.asarray(rng.uniform(-6, 6, (C, 2)).astype(np.float32)),
        pose_theta=jnp.asarray(rng.uniform(0, 2 * np.pi, C).astype(np.float32)),
        obstacle_wh=jnp.asarray(rng.uniform(0.5, 5, (C, 2)).astype(np.float32)),
        std_dev=jnp.asarray(sd),
    )
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    params = mcp.pack_mc_params(cfgs, robot)

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    counts = np.array(
        mcp.mc_counts_pallas(
            jnp.asarray([1, 2], jnp.int32), params, jnp.int32(1),
            sub=sub, shape_noise=False, interpret=True,
            normal_method=normal_method,
        )
    )

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    draw = (mcp._box_muller if normal_method == "box_muller"
            else mcp._erfinv_pair)
    shape = (sub // 2, C)
    za_dx, zb_dx = draw(shape)
    za_dy, zb_dy = draw(shape)
    za_th, zb_th = draw(shape)

    p = np.asarray(params)
    prow = lambda i: jnp.asarray(p[i])[None, :]
    args = (
        prow(0), prow(1), prow(2), prow(3), prow(13), prow(4), prow(5),
        prow(6), prow(7), prow(8), prow(9), prow(10), prow(11), prow(12),
    )
    sep_a = mcp._obb_separated(*args, za_dx, za_dy, za_th, None, None)
    sep_b = mcp._obb_separated(*args, zb_dx, zb_dy, zb_th, None, None)
    hits = jnp.logical_not(sep_a).astype(jnp.int32) + jnp.logical_not(
        sep_b
    ).astype(jnp.int32)
    np.testing.assert_array_equal(
        counts, np.array(jnp.sum(hits, axis=0, dtype=jnp.int32))
    )

    sdj = cfgs.std_dev
    want_sem = np.zeros((C,), np.int64)
    rows = sub // 2
    for z_dx, z_dy, z_th in ((za_dx, za_dy, za_th), (zb_dx, zb_dy, zb_th)):
        offsets = jnp.stack(
            [z_dx * sdj[None, :, 0], z_dy * sdj[None, :, 1]], axis=-1
        )
        hit = obb_collide(
            jnp.broadcast_to(cfgs.position, (rows, C, 2)),
            jnp.broadcast_to(robot, (rows, C, 2)),
            jnp.broadcast_to(cfgs.pose_theta, (rows, C)),
            offsets,
            jnp.broadcast_to(cfgs.obstacle_wh[None], (rows, C, 2)),
            z_th * sdj[None, :, 2],
        )
        want_sem += np.array(jnp.sum(hit, axis=0, dtype=jnp.int32))
    np.testing.assert_array_equal(counts, want_sem)


def _on_tpu():
    # Where do fresh arrays actually land? (jax.devices() alone lies in
    # environments where a TPU plugin registers itself as default while
    # computation is pinned to CPU — exactly our conftest.)
    try:
        return next(iter(jnp.zeros(1).devices())).platform in ("tpu", "axon")
    except RuntimeError:
        return False


def test_obb_param_kernel_bitwise_vs_closed_form(rng):
    """Param-form OBB kernel == ops.sat.obb_collide bit-for-bit (same
    float op order), incl. negative extents (the reference's additive
    shape noise can invert rectangles, utils.cu:144-157) and the
    padding path."""
    from collide2d_tpu.ops.sat import obb_collide
    from collide2d_tpu.ops.sat_pallas import obb_collide_pallas

    n = 1000  # not a multiple of the 8*block alignment -> padding path
    c1 = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(-2, 5, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(-2, 5, (n, 2)).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
    want = np.array(obb_collide(c1, e1, t1, c2, e2, t2))
    got = np.array(
        obb_collide_pallas(c1, e1, t1, c2, e2, t2, block=64, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0 and want.sum() < n  # non-degenerate mix


def test_distance_kernel_vs_xla_and_sign(rng):
    """Fused OBB signed-distance kernel vs `rect_signed_distance` (an
    independent formulation — generic SAT-axis support gaps +
    vertex-segment minimization vs the kernel's local-frame closed
    form): values agree to f32 rounding, and sign(dist <= 0) equals the
    `obb_collide` label EXACTLY (same gap expressions; f32 subtraction
    preserves comparison sign). Includes negative extents and the
    padding path (n not aligned)."""
    from collide2d_tpu.ops.distance import rect_signed_distance
    from collide2d_tpu.ops.distance_pallas import rect_distance_pallas
    from collide2d_tpu.ops.sat import obb_collide

    n = 1000
    c1 = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(-2, 5, (n, 2)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(-2, 5, (n, 2)).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
    want = np.array(rect_signed_distance(c1, e1, t1, c2, e2, t2))
    got = np.array(
        rect_distance_pallas(c1, e1, t1, c2, e2, t2, block=64, interpret=True)
    )
    assert got.shape == (n,)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    assert (want > 0).any() and (want < 0).any()
    np.testing.assert_array_equal(
        (got <= 0).astype(np.int32),
        np.array(obb_collide(c1, e1, t1, c2, e2, t2)),
    )


def test_distance_kernel_closed_forms():
    """Axis-aligned cases with known exact distances (incl. exact touch,
    which must label as colliding: dist == 0 -> dist <= 0)."""
    from collide2d_tpu.ops.distance_pallas import rect_distance_pallas

    # unit squares (full extents 2) at varying center separations
    seps = np.array([5.0, 2.5, 2.0, 1.0, 0.0], np.float32)
    n = len(seps)
    z2 = jnp.zeros((n, 2), jnp.float32)
    e = jnp.full((n, 2), 2.0, jnp.float32)
    zt = jnp.zeros(n, jnp.float32)
    c2 = jnp.stack([jnp.asarray(seps), jnp.zeros(n)], axis=1)
    got = np.array(rect_distance_pallas(z2, e, zt, c2, e, zt,
                                        block=8, interpret=True))
    np.testing.assert_allclose(got, [3.0, 0.5, 0.0, -1.0, -2.0], atol=1e-6)
    # corner-corner diagonal case
    got2 = np.array(rect_distance_pallas(
        z2[:1], e[:1], zt[:1],
        jnp.asarray([[3.0, 4.0]]), e[:1], zt[:1], block=8, interpret=True))
    # closest corners (1,1) of A and (2,3) of B
    np.testing.assert_allclose(got2, [np.hypot(1.0, 2.0)], atol=1e-6)


def test_polygon_distance_kernel_vs_xla_and_sign(rng):
    """Fused k-gon signed-distance kernel vs `polygon_signed_distance`
    (values to f32 rounding) and `sat_polygons` (sign bitwise), over
    mixed-k repeat-padded pairs incl. the pair-padding path."""
    from collide2d_tpu.ops.distance import polygon_signed_distance
    from collide2d_tpu.ops.distance_pallas import polygon_distance_pallas
    from collide2d_tpu.ops.sat import sat_polygons
    from tests.test_sat import _regular_polygon

    n = 500  # not 8*block aligned
    P1, P2 = [], []
    for _ in range(n):
        k1, k2 = int(rng.integers(3, 9)), int(rng.integers(3, 9))
        p1 = _regular_polygon(
            k1, rng.uniform(0.3, 2.0), rng.uniform(-4, 4),
            rng.uniform(-4, 4), rng.uniform(0, 7))
        p2 = _regular_polygon(
            k2, rng.uniform(0.3, 2.0), rng.uniform(-4, 4),
            rng.uniform(-4, 4), rng.uniform(0, 7))
        P1.append(np.concatenate([p1, np.repeat(p1[-1:], 8 - k1, 0)]))
        P2.append(np.concatenate([p2, np.repeat(p2[-1:], 8 - k2, 0)]))
    p1 = jnp.asarray(np.stack(P1))
    p2 = jnp.asarray(np.stack(P2))
    want = np.array(polygon_signed_distance(p1, p2))
    got = np.array(polygon_distance_pallas(p1, p2, block=16, interpret=True))
    assert got.shape == (n,)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    assert (want > 0).any() and (want < 0).any()
    np.testing.assert_array_equal(
        (got <= 0).astype(np.int32), np.array(sat_polygons(p1, p2))
    )


def test_erfinv_pair_finite_at_code_extremes(monkeypatch):
    """Regression (review r3): at the top 24-bit code, a 24-bit-centered
    erfinv argument rounds to exactly 1.0 in float32 and erf_inv(1.0) =
    +inf — whose NaNs would be COUNTED AS COLLISIONS downstream. The
    23-bit-code construction must produce finite draws at both code
    extremes (and everywhere, by the exactness argument in its
    docstring)."""
    import collide2d_tpu.ops.mc_pallas as mcp

    shape = (8, 128)
    for const in (1.0, 1.0 / (1 << 24)):  # top and bottom codes
        monkeypatch.setattr(
            mcp, "_TEST_UNIFORM_FN",
            lambda s, c=const: jnp.full(s, c, jnp.float32),
        )
        z0, z1 = mcp._erfinv_pair(shape)
        for z in (z0, z1):
            z = np.asarray(z)
            assert np.isfinite(z).all(), f"non-finite draw at code {const}"
            assert (np.abs(z) < 6.0).all()  # ~5.33 sigma truncation


@pytest.mark.skipif(not _on_tpu(), reason="MC kernel needs the TPU hardware PRNG")
def test_mc_kernel_statistics_tpu():
    from collide2d_tpu.mc.estimator import Configs, mc_round
    from collide2d_tpu.ops.mc_pallas import mc_round_pallas

    rng = np.random.default_rng(0)
    C = 96
    cfgs = Configs(
        position=jnp.asarray(rng.uniform(-6, 6, (C, 2)).astype(np.float32)),
        pose_theta=jnp.asarray(rng.uniform(0, 2 * np.pi, C).astype(np.float32)),
        obstacle_wh=jnp.asarray(rng.uniform(0.5, 5, (C, 2)).astype(np.float32)),
        std_dev=jnp.asarray(rng.uniform(0, 0.4, (C, 5)).astype(np.float32)),
    )
    key = jax.random.PRNGKey(0)
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    n = 8000
    got = np.array(mc_round_pallas(key, cfgs, robot, 0, n_batch=n)) / n
    uids = jnp.arange(C, dtype=jnp.int32)
    want = np.array(
        mc_round(key, uids, cfgs, robot, jnp.int32(0), n_batch=n)
    ) / n
    tol = 3 * np.sqrt(2 * np.maximum(want * (1 - want), 1e-4) / n)
    assert (np.abs(got - want) <= tol).all()


@pytest.mark.skipif(not _on_tpu(), reason="MC kernel needs the TPU hardware PRNG")
def test_mc_polygon_kernel_statistics_tpu():
    from collide2d_tpu.mc.estimator import mc_round
    from collide2d_tpu.models.collision_model import example_polygon_configs
    from collide2d_tpu.ops.mc_polygon_pallas import mc_round_polygons_pallas

    C = 96
    cfgs = example_polygon_configs(C, k=6, seed=1)
    key = jax.random.PRNGKey(0)
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    n = 8000
    got = np.array(mc_round_polygons_pallas(key, cfgs, robot, 0, n_batch=n)) / n
    uids = jnp.arange(C, dtype=jnp.int32)
    want = np.array(
        mc_round(key, uids, cfgs, robot, jnp.int32(0), n_batch=n, impl="jnp")
    ) / n
    tol = 3 * np.sqrt(2 * np.maximum(want * (1 - want), 1e-4) / n)
    assert (np.abs(got - want) <= tol).all()


@pytest.mark.parametrize("normal_method", ["box_muller", "erfinv"])
def test_mc_polygon_kernel_math_interpret(rng, monkeypatch, normal_method):
    """Off-TPU CI coverage of the fused polygon MC kernel.

    1. WIRING, bit-for-bit: stubbed draws replayed through the module's
       own `_poly_separated` on the packed rows must reproduce the
       kernel's counts exactly — pins packing layout, offsets, the
       paired-draw order, and accumulation.
    2. SEMANTICS: the counts must equal true-normal `sat_polygons` on
       explicitly rigid-transformed obstacles with the same noise (the
       kernel's blended-table form rounds differently, so exact-boundary
       inputs could in principle flip; on these deterministic draws the
       agreement is exact).
    """
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    from collide2d_tpu.models.collision_model import example_polygon_configs
    from collide2d_tpu.ops.sat import sat_polygons
    from tests.conftest import deterministic_uniform_stub

    C = mpp.LANE_CONFIGS
    sub, K, K2 = 16, 6, 4
    cfgs = example_polygon_configs(C, k=K, seed=13)
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    params = mpp.pack_polygon_mc_params(cfgs, robot)

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    counts = np.array(
        mpp.mc_poly_counts_pallas(
            jnp.asarray([1, 2], jnp.int32), params, jnp.int32(1),
            sub=sub, k=K, k2=K2, interpret=True,
            normal_method=normal_method,
        )
    )

    # --- wiring replay through the module's own tile function
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    draw = (mcp._box_muller if normal_method == "box_muller"
            else mcp._erfinv_pair)
    shape = (sub // 2, C)
    za_dx, zb_dx = draw(shape)
    za_dy, zb_dy = draw(shape)
    za_th, zb_th = draw(shape)
    p = np.asarray(params)
    rows = lambda i: jnp.asarray(p[i])[None, :]
    sep_a = mpp._poly_separated(rows, K, K2, za_dx, za_dy, za_th)
    sep_b = mpp._poly_separated(rows, K, K2, zb_dx, zb_dy, zb_th)
    hits = jnp.logical_not(sep_a).astype(jnp.int32) + jnp.logical_not(
        sep_b
    ).astype(jnp.int32)
    np.testing.assert_array_equal(
        counts, np.array(jnp.sum(hits, axis=0, dtype=jnp.int32))
    )

    # --- semantic check against true-normal SAT on transformed vertices
    ca = jnp.cos(cfgs.pose_theta)[:, None]
    sa = jnp.sin(cfgs.pose_theta)[:, None]
    rx, ry = robot[..., 0], robot[..., 1]
    rob_world = jnp.stack(
        [
            ca * rx - sa * ry + cfgs.position[:, 0:1],
            sa * rx + ca * ry + cfgs.position[:, 1:2],
        ],
        axis=-1,
    )  # (C, K2, 2)
    sd = cfgs.std_dev
    want = np.zeros((C,), np.int64)
    rows_n = sub // 2
    for z_dx, z_dy, z_th in ((za_dx, za_dy, za_th), (zb_dx, zb_dy, zb_th)):
        dx = (z_dx * sd[None, :, 0])[..., None]   # (S, C, 1)
        dy = (z_dy * sd[None, :, 1])[..., None]
        th = z_th * sd[None, :, 2]
        ct, st = jnp.cos(th)[..., None], jnp.sin(th)[..., None]
        ox = cfgs.obstacle_verts[None, :, :, 0]   # (1, C, K)
        oy = cfgs.obstacle_verts[None, :, :, 1]
        obstacle = jnp.stack(
            [ct * ox - st * oy + dx, st * ox + ct * oy + dy], axis=-1
        )  # (S, C, K, 2)
        hit = sat_polygons(
            jnp.broadcast_to(rob_world, (rows_n,) + rob_world.shape), obstacle
        )
        want += np.array(jnp.sum(hit, axis=0, dtype=jnp.int32))
    np.testing.assert_array_equal(counts, want)


def test_mc_polygon_axis_dedup_interpret(rng, monkeypatch):
    """A centrally symmetric robot carries (anti-)parallel duplicate
    axes; `dedup_robot_axes` drops them and the kernel must produce
    BITWISE the counts of the full-axis pack on identical draws (the
    noise stream does not depend on the axis count)."""
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    from collide2d_tpu.models.collision_model import example_polygon_configs
    from tests.conftest import deterministic_uniform_stub

    C = mpp.LANE_CONFIGS
    sub, K = 16, 6
    cfgs = example_polygon_configs(C, k=K, seed=17)
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    keep = mpp.dedup_robot_axes(robot)
    assert keep == (0, 1)  # a rectangle needs only two of its four axes
    # an irregular robot keeps everything
    assert mpp.dedup_robot_axes(
        jnp.asarray([[0.0, 0.0], [2.0, 0.1], [1.1, 1.7]], jnp.float32)
    ) == (0, 1, 2)
    # A zero-length edge (user repeat-padding a vertex) yields a zero
    # normal: it must be DROPPED, not kept — a kept zero axis would
    # swallow every later real axis as its "duplicate" (cross with the
    # zero vector is always 0) and the kernel would overcount collisions.
    padded = jnp.asarray(
        [[0.0, 0.0], [0.0, 0.0], [2.0, 0.1], [1.1, 1.7]], jnp.float32
    )
    assert mpp.dedup_robot_axes(padded) == (1, 2, 3)
    # repeat-LAST-vertex padding (the sat_polygons contract): the zero
    # edge sits at index 2 and only it is dropped
    assert mpp.dedup_robot_axes(
        jnp.asarray([[0.0, 0.0], [2.0, 0.1], [1.1, 1.7], [1.1, 1.7]],
                    jnp.float32)
    ) == (0, 1, 3)

    counts = {}
    for label, a_keep in (("full", tuple(range(4))), ("dedup", keep)):
        params = mpp.pack_polygon_mc_params(cfgs, robot, a_keep)
        monkeypatch.setattr(
            mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub()
        )
        counts[label] = np.array(
            mpp.mc_poly_counts_pallas(
                jnp.asarray([1, 2], jnp.int32), params, jnp.int32(2),
                sub=sub, k=K, k2=4, k2_axes=len(a_keep), interpret=True,
            )
        )
    np.testing.assert_array_equal(counts["dedup"], counts["full"])


def test_mc_toi_kernel_math_interpret(rng, monkeypatch):
    """Off-TPU CI coverage of the fused trajectory kernel (mc_toi_pallas)
    on a MIXED batch (half translation-only, half rotating):

    1. WIRING: the same stubbed draws replayed through the module's own
       draw fn and `_toi_hits_tile` must reproduce the kernel's counts —
       bit-for-bit on the translation-only lanes (the exact window is a
       short algebraic chain, stable across compilations, like the
       static kernel's wiring contract); on rotating lanes within a
       SMALL FLAT allowance (<=2 per lane, <=6 total). The conservative-
       advancement loop converges to the contact tolerance
       asymptotically, so a grazing sample's final distance can land
       within an ulp of `tol` and legitimately decide differently
       between the one-program kernel and the op-by-op eager replay
       (XLA fuses/contracts differently); such samples resist exact
       prediction (certified hits ALWAYS end in [0, tol] by the
       conservative-step construction, so no final-state band separates
       stable hits from grazes). A flat allowance still pins the
       wiring: a real bug (wrong row, wrong draw order, wrong motion
       fold) flips samples wholesale, not one or two per batch.
    2. SEMANTICS: rotating-lane counts must match an independent
       advancement over `ops.toi._advance` on the same closed-form
       distance and noise, under the same allowance; translation-lane
       counts must equal the PUBLIC exact entry point
       `ops.toi.rect_translation_toi` on the same noise bit-for-bit
       (CA is not the oracle there — it legitimately under-counts
       grazing hits the exact window resolves).
    """
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_toi_pallas as mtp
    from collide2d_tpu.mc.moving import moving_configs
    from collide2d_tpu.ops.distance_pallas import obb_signed_distance_tile
    from collide2d_tpu.ops.toi import _advance, rect_translation_toi
    from tests.conftest import deterministic_uniform_stub

    C = mtp.LANE_CONFIGS
    sub = 16
    omega = rng.uniform(-0.5, 0.5, C).astype(np.float32)
    omega[: C // 2] = 0.0  # translation-only half: bitwise contract
    cfgs = moving_configs(
        rng.uniform(-6, 6, (C, 2)).astype(np.float32),
        rng.uniform(0, 2 * np.pi, C).astype(np.float32),
        rng.uniform(0.5, 5, (C, 2)).astype(np.float32),
        rng.uniform(0, 0.4, (C, 5)).astype(np.float32),
        rng.uniform(-2, 2, (C, 2)).astype(np.float32),
        omega,
        rng.uniform(0.5, 3, C).astype(np.float32),
    )
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    params = mtp.pack_mc_toi_params(cfgs, robot)
    ca_iters, tol = 64, 1e-4

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    counts = np.array(mtp.mc_toi_counts_pallas(
        jnp.asarray([1, 2], jnp.int32), params, jnp.int32(1),
        sub=sub, ca_iters=ca_iters, tol=tol, interpret=True,
    ))

    # replay the draws (stub depends only on (shape, call index))
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    half = (sub // 2, C)
    cat = lambda p: jnp.concatenate(p, axis=0)
    z_dx = cat(mcp._erfinv_pair(half))
    z_dy = cat(mcp._erfinv_pair(half))
    z_th = cat(mcp._erfinv_pair(half))
    z_dw = cat(mcp._erfinv_pair(half))
    z_dh = cat(mcp._erfinv_pair(half))

    p = np.asarray(params)
    prow = lambda i: jnp.asarray(p[i])[None, :]
    ox = z_dx * prow(7)
    oy = z_dy * prow(8)
    phi = z_th * prow(9)
    a = jnp.abs(prow(5) + z_dw * prow(10))
    b = jnp.abs(prow(6) + z_dh * prow(11))
    hit = mtp._toi_hits_tile(
        ox, oy, jnp.cos(phi), jnp.sin(phi), a, b,
        prow(0), prow(1), prow(2), prow(3), prow(4),
        prow(12), prow(13), prow(14), prow(15), ca_iters, tol,
    )
    want_wiring = np.array(jnp.sum(hit.astype(jnp.int32), axis=0))

    trans = p[14] == 0
    np.testing.assert_array_equal(counts[trans], want_wiring[trans])
    wiring_diff = np.abs(counts - want_wiring)[~trans]
    assert wiring_diff.max(initial=0) <= 2 and wiring_diff.sum() <= 6

    # independent semantic checks, one per decision path. Rotating
    # lanes: ops.toi._advance over the same closed-form distance on the
    # same per-sample noise, under the same grazing allowance.
    def dist_of_t(t):
        a1 = prow(2) + t * prow(14)
        dx = ox - (prow(0) + t * prow(12))
        dy = oy - (prow(1) + t * prow(13))
        return obb_signed_distance_tile(
            dx, dy, jnp.cos(a1), jnp.sin(a1), prow(3), prow(4),
            jnp.cos(phi), jnp.sin(phi), a, b)

    bound = jnp.broadcast_to(prow(15), ox.shape)
    toi = _advance(dist_of_t, bound, 1.0, ca_iters, tol)
    want_rot = np.array(jnp.sum(jnp.isfinite(toi), axis=0, dtype=jnp.int32))
    sem_diff = np.abs(counts - want_rot)[~trans]
    assert sem_diff.max(initial=0) <= 2 and sem_diff.sum() <= 6

    # Translation lanes: the public EXACT first-contact window on the
    # same noise — bitwise (the window is the same short stable chain
    # the wiring contract already relies on).
    bc = lambda r: jnp.broadcast_to(r, ox.shape)
    toi_tr = rect_translation_toi(
        jnp.stack([bc(prow(0)), bc(prow(1))], -1),
        jnp.stack([2.0 * bc(prow(3)), 2.0 * bc(prow(4))], -1),
        bc(prow(2)),
        jnp.stack([ox, oy], -1),
        jnp.stack([2.0 * a, 2.0 * b], -1),
        phi,
        jnp.stack([-bc(prow(12)), -bc(prow(13))], -1),
    )
    want_tr = np.array(jnp.sum(jnp.isfinite(toi_tr), axis=0, dtype=jnp.int32))
    np.testing.assert_array_equal(counts[trans], want_tr[trans])


def test_mc_moving_polygon_kernel_math_interpret(rng, monkeypatch):
    """Off-TPU CI coverage of the fused trajectory k-gon kernel
    (ops.mc_moving_polygon_pallas), translation-only by contract:

    1. WIRING, bit-for-bit: stubbed draws replayed through the module's
       own `_poly_window_hit` on the packed rows must reproduce the
       kernel's counts exactly — pins the moving layout (static rows +
       two velocity rows), offsets, draw order, and accumulation.
    2. SEMANTICS: counts must equal the EXACT public window
       `ops.toi.polygon_translation_toi_parts` on explicitly
       rigid-transformed vertices with the same noise (deterministic
       generic draws — no grazing boundary cases).
    3. ZERO-MOTION PARITY, bitwise: a zero-velocity pack consumes the
       identical stub stream as the static polygon kernel and its
       windows degenerate to the static interval test — counts must
       equal `mc_poly_counts_pallas` on the static pack bit for bit.
    """
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    import collide2d_tpu.ops.mc_moving_polygon_pallas as mmpp
    from collide2d_tpu.mc.moving import moving_polygon_configs
    from collide2d_tpu.models.collision_model import example_polygon_configs
    from collide2d_tpu.ops.toi import polygon_translation_toi_parts
    from tests.conftest import deterministic_uniform_stub

    C = mpp.LANE_CONFIGS
    sub, K, K2 = 16, 6, 4
    static = example_polygon_configs(C, k=K, seed=19)
    vel = rng.uniform(-2, 2, (C, 2)).astype(np.float32)
    t_max = rng.uniform(0.5, 3, C).astype(np.float32)
    cfgs = moving_polygon_configs(
        static.position, static.pose_theta, static.obstacle_verts,
        static.std_dev, vel, 0.0, t_max,
    )
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    params = mmpp.pack_moving_polygon_mc_params(cfgs, robot)

    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    counts = np.array(
        mmpp.mc_moving_poly_counts_pallas(
            jnp.asarray([1, 2], jnp.int32), params, jnp.int32(1),
            sub=sub, k=K, k2=K2, interpret=True,
        )
    )

    # --- 1. wiring replay through the module's own tile function
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    shape = (sub // 2, C)
    za_dx, zb_dx = mcp._erfinv_pair(shape)
    za_dy, zb_dy = mcp._erfinv_pair(shape)
    za_th, zb_th = mcp._erfinv_pair(shape)
    p = np.asarray(params)
    rows = lambda i: jnp.asarray(p[i])[None, :]
    hit_a = mmpp._poly_window_hit(rows, K, K2, za_dx, za_dy, za_th)
    hit_b = mmpp._poly_window_hit(rows, K, K2, zb_dx, zb_dy, zb_th)
    hits = hit_a.astype(jnp.int32) + hit_b.astype(jnp.int32)
    np.testing.assert_array_equal(
        counts, np.array(jnp.sum(hits, axis=0, dtype=jnp.int32))
    )

    # --- 2. semantics vs the exact public window on transformed verts
    ca = jnp.cos(cfgs.pose_theta)[:, None]
    sa = jnp.sin(cfgs.pose_theta)[:, None]
    rx, ry = robot[..., 0], robot[..., 1]
    rob_world = jnp.stack(
        [
            ca * rx - sa * ry + cfgs.position[:, 0:1],
            sa * rx + ca * ry + cfgs.position[:, 1:2],
        ],
        axis=-1,
    )  # (C, K2, 2)
    sd = cfgs.std_dev
    v_obs = -(cfgs.velocity * cfgs.t_max[:, None])  # (C, 2)
    want = np.zeros((C,), np.int64)
    rows_n = sub // 2
    for z_dx, z_dy, z_th in ((za_dx, za_dy, za_th), (zb_dx, zb_dy, zb_th)):
        dx = (z_dx * sd[None, :, 0])[..., None]   # (S, C, 1)
        dy = (z_dy * sd[None, :, 1])[..., None]
        th = z_th * sd[None, :, 2]
        ct, st = jnp.cos(th)[..., None], jnp.sin(th)[..., None]
        ox = cfgs.obstacle_verts[None, :, :, 0]   # (1, C, K)
        oy = cfgs.obstacle_verts[None, :, :, 1]
        obstacle = jnp.stack(
            [ct * ox - st * oy + dx, st * ox + ct * oy + dy], axis=-1
        )  # (S, C, K, 2)
        entry, exit_ = polygon_translation_toi_parts(
            jnp.broadcast_to(rob_world, (rows_n,) + rob_world.shape),
            obstacle,
            jnp.broadcast_to(v_obs, (rows_n,) + v_obs.shape),
        )
        hit = (entry <= exit_) & (entry <= 1.0) & (exit_ >= 0.0)
        want += np.array(jnp.sum(hit, axis=0, dtype=jnp.int32))
    np.testing.assert_array_equal(counts, want)

    # --- 3. zero-motion bitwise parity with the static polygon kernel
    cfgs0 = cfgs._replace(velocity=jnp.zeros_like(cfgs.velocity))
    params0 = mmpp.pack_moving_polygon_mc_params(cfgs0, robot)
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    moving0 = np.array(
        mmpp.mc_moving_poly_counts_pallas(
            jnp.asarray([1, 2], jnp.int32), params0, jnp.int32(2),
            sub=sub, k=K, k2=K2, interpret=True,
        )
    )
    params_s = mpp.pack_polygon_mc_params(static, robot)
    monkeypatch.setattr(mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub())
    static_c = np.array(
        mpp.mc_poly_counts_pallas(
            jnp.asarray([1, 2], jnp.int32), params_s, jnp.int32(2),
            sub=sub, k=K, k2=K2, interpret=True,
        )
    )
    np.testing.assert_array_equal(moving0, static_c)


def test_mc_moving_polygon_axis_dedup_interpret(rng, monkeypatch):
    """Dedup'd robot axes must leave the trajectory counts BITWISE
    unchanged (the noise stream does not depend on the axis count, and
    a dropped (anti-)parallel duplicate spans the same window)."""
    import collide2d_tpu.ops.mc_pallas as mcp
    import collide2d_tpu.ops.mc_polygon_pallas as mpp
    import collide2d_tpu.ops.mc_moving_polygon_pallas as mmpp
    from collide2d_tpu.mc.moving import moving_polygon_configs
    from collide2d_tpu.models.collision_model import example_polygon_configs
    from tests.conftest import deterministic_uniform_stub

    C = mpp.LANE_CONFIGS
    sub, K = 16, 6
    static = example_polygon_configs(C, k=K, seed=23)
    cfgs = moving_polygon_configs(
        static.position, static.pose_theta, static.obstacle_verts,
        static.std_dev, rng.uniform(-2, 2, (C, 2)).astype(np.float32),
        0.0, rng.uniform(0.5, 3, C).astype(np.float32),
    )
    robot = jnp.asarray(
        [[-2.035, -0.87], [2.035, -0.87], [2.035, 0.87], [-2.035, 0.87]],
        jnp.float32,
    )
    keep = mpp.dedup_robot_axes(robot)
    assert keep == (0, 1)

    counts = {}
    for label, a_keep in (("full", tuple(range(4))), ("dedup", keep)):
        params = mmpp.pack_moving_polygon_mc_params(cfgs, robot, a_keep)
        monkeypatch.setattr(
            mcp, "_TEST_UNIFORM_FN", deterministic_uniform_stub()
        )
        counts[label] = np.array(
            mmpp.mc_moving_poly_counts_pallas(
                jnp.asarray([1, 2], jnp.int32), params, jnp.int32(2),
                sub=sub, k=K, k2=4, k2_axes=len(a_keep), interpret=True,
            )
        )
    np.testing.assert_array_equal(counts["dedup"], counts["full"])


def test_rotating_screen_kernel_interpret(rng):
    """Fused stage-A screen kernel (ops.screen_pallas): interpret-mode
    agreement with the jnp cascade. Masks and warm starts must be
    BITWISE (the kernel calls the SAME tile functions); counts may
    differ on tolerance-boundary grazes because the advancement's
    mul+add chains fuse differently across program shapes (FMA
    contraction; _counts_chunk_fused_screen docstring) — bounded here
    to a handful of lanes. Zero-omega batches ride the exact window
    and must agree bitwise end to end."""
    import jax
    import jax.numpy as jnp

    from collide2d_tpu.mc.moving import counts_chunk_moving, moving_configs

    n, s = 64, 128
    cfgs = moving_configs(
        rng.uniform(-6, 6, (n, 2)).astype(np.float32),
        rng.uniform(0, 2 * np.pi, n).astype(np.float32),
        rng.uniform(0.5, 5, (n, 2)).astype(np.float32),
        rng.uniform(0, 0.3, (n, 5)).astype(np.float32),
        rng.uniform(-2, 2, (n, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, n).astype(np.float32),
        rng.uniform(0.5, 3, n).astype(np.float32),
    )
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    cj, (mj, hj, aj) = counts_chunk_moving(
        keys, cfgs, robot, s, return_screen_masks=True
    )
    cp, (mp, hp, ap) = counts_chunk_moving(
        keys, cfgs, robot, s, return_screen_masks=True,
        screen_impl="pallas", screen_interpret=True,
    )
    np.testing.assert_array_equal(np.array(mj), np.array(mp))
    np.testing.assert_array_equal(np.array(hj), np.array(hp))
    np.testing.assert_array_equal(np.array(aj), np.array(ap))
    assert int(np.abs(np.array(cj) - np.array(cp)).sum()) <= 4

    cfg0 = cfgs._replace(omega=jnp.zeros_like(cfgs.omega))
    c0j = np.array(counts_chunk_moving(keys, cfg0, robot, s))
    c0p = np.array(counts_chunk_moving(
        keys, cfg0, robot, s, screen_impl="pallas", screen_interpret=True
    ))
    np.testing.assert_array_equal(c0j, c0p)
