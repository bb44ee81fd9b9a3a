"""Scene-query tests: all-pairs matrix vs the pairwise oracle, tiling
invariance, fixed-capacity pair extraction, padding, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collide2d_tpu.ops.sat import sat_polygons
from collide2d_tpu.ops.scene import (
    scene_collision_matrix,
    scene_colliding_pairs,
)
from tests.test_sat import _regular_polygon


@pytest.fixture
def rng():
    return np.random.default_rng(20260820)


def _random_scene(rng, n=48, spread=6.0, kmax=8):
    polys = []
    for _ in range(n):
        k = int(rng.integers(3, kmax + 1))
        p = _regular_polygon(
            k, rng.uniform(0.3, 1.6), rng.uniform(-spread, spread),
            rng.uniform(-spread, spread), rng.uniform(0, 7))
        polys.append(np.concatenate([p, np.repeat(p[-1:], kmax - k, 0)]))
    return jnp.asarray(np.stack(polys))


def test_matrix_matches_pairwise_oracle(rng):
    polys = _random_scene(rng)
    n = polys.shape[0]
    m = np.array(scene_collision_matrix(polys))
    # Oracle: the existing pairwise SAT on every (i, j).
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    want = np.array(
        sat_polygons(polys[i.reshape(-1)], polys[j.reshape(-1)])
    ).reshape(n, n).astype(bool)
    np.fill_diagonal(want, False)
    np.testing.assert_array_equal(m, want)
    assert (m == m.T).all()
    assert not m.diagonal().any()
    assert m.any()  # the random scene genuinely collides somewhere


def test_row_tiling_is_invariant(rng):
    polys = _random_scene(rng, n=37)  # deliberately not a tile multiple
    base = np.array(scene_collision_matrix(polys, row_tile=64))
    for tile in (1, 5, 16, 37, 200):
        np.testing.assert_array_equal(
            base, np.array(scene_collision_matrix(polys, row_tile=tile))
        )


def test_pairs_match_matrix(rng):
    polys = _random_scene(rng)
    m = np.array(scene_collision_matrix(polys))
    want = np.argwhere(np.triu(m, k=1))
    pairs, count, overflow = map(
        np.array, scene_colliding_pairs(polys, capacity=256)
    )
    assert not overflow
    assert count == len(want)
    np.testing.assert_array_equal(pairs[:count], want)
    assert (pairs[count:] == 0).all()


def test_pair_overflow_contract(rng):
    polys = _random_scene(rng)
    m = np.array(scene_collision_matrix(polys))
    total = int(np.triu(m, k=1).sum())
    assert total >= 3
    cap = total - 1
    pairs, count, overflow = map(
        np.array, scene_colliding_pairs(polys, capacity=cap)
    )
    assert overflow
    assert count == cap
    want = np.argwhere(np.triu(m, k=1))[:cap]
    np.testing.assert_array_equal(pairs, want)


def test_padding_mask_and_touching(rng):
    # Mixed-k scene via mask == repeat-padding; touching squares collide.
    sq = np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1]], np.float32
    )
    scene = np.stack([
        np.concatenate([sq, sq[-1:]]),                    # k=4 padded to 5
        np.concatenate([sq + [1.0, 0.0], (sq + [1.0, 0.0])[-1:]]),  # touching
        np.concatenate([sq + [5.0, 5.0], (sq + [5.0, 5.0])[-1:]]),  # far away
    ])
    m = np.array(scene_collision_matrix(jnp.asarray(scene)))
    assert m[0, 1] and m[1, 0]  # touching counts (strict < separation)
    assert not m[0, 2] and not m[1, 2]

    arb = scene.copy()
    arb[:, -1] = 99.0  # garbage padding slot, masked out
    mask = jnp.asarray(np.array([[True] * 4 + [False]] * 3))
    m2 = np.array(scene_collision_matrix(jnp.asarray(arb), mask))
    np.testing.assert_array_equal(m, m2)


def test_jit_and_row_sharding(rng):
    polys = _random_scene(rng, n=64)
    base = np.array(scene_collision_matrix(polys))
    jitted = jax.jit(scene_collision_matrix)(polys)
    np.testing.assert_array_equal(base, np.array(jitted))

    # Row-sharded input under a config mesh: GSPMD partitions the row
    # tiles, output matches unsharded bitwise.
    from tests.conftest import cpu_devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = cpu_devices()[:8]
    mesh = Mesh(np.array(devs), ("config",))
    sharded = jax.device_put(
        polys, NamedSharding(mesh, P("config", None, None))
    )
    out = jax.jit(
        lambda p: scene_collision_matrix(p, row_tile=8)
    )(sharded)
    np.testing.assert_array_equal(base, np.array(out))


def test_scene_contact_manifolds(rng):
    from collide2d_tpu.ops.manifold import polygon_contact_manifold
    from collide2d_tpu.ops.scene import scene_contact_manifolds

    polys = _random_scene(rng)
    pairs, count, n_c, pts, dep, nrm, wex = map(
        np.array, scene_contact_manifolds(polys, capacity=256)
    )
    assert not wex  # dense broad phase never fires the certificate
    m = np.array(scene_collision_matrix(polys))
    want = np.argwhere(np.triu(m, k=1))
    assert count == len(want)
    np.testing.assert_array_equal(pairs[:count], want)
    pn = np.array(polys)
    for r in range(int(count)):
        i, j = pairs[r]
        wc, wp, wd, wn = map(
            np.array,
            polygon_contact_manifold(
                jnp.asarray(pn[i]), jnp.asarray(pn[j])
            ),
        )
        assert n_c[r] == wc
        np.testing.assert_allclose(pts[r], wp, atol=1e-6)
        np.testing.assert_allclose(dep[r], wd, atol=1e-6)
        np.testing.assert_allclose(nrm[r], wn, atol=1e-6)
        assert wc >= 1  # every listed pair genuinely collides


def test_streaming_pairs_match_matrix_large(rng):
    # The streaming extractor (no materialized matrix) must agree with
    # the matrix path across tile boundaries and odd N.
    polys = _random_scene(rng, n=203, spread=10.0)
    m = np.array(scene_collision_matrix(polys))
    want = np.argwhere(np.triu(m, k=1))
    for tile in (8, 64, 203):
        pairs, count, overflow = map(
            np.array,
            scene_colliding_pairs(polys, capacity=1024, row_tile=tile),
        )
        assert not overflow
        assert count == len(want), (tile, count, len(want))
        np.testing.assert_array_equal(pairs[: len(want)], want)
        assert (pairs[len(want):] == 0).all()


def test_swept_full_window_equals_dense(rng):
    from collide2d_tpu.ops.scene import scene_colliding_pairs_swept

    polys = _random_scene(rng, n=60)
    dp, dc, dov = map(np.array, scene_colliding_pairs(polys, capacity=256))
    assert not dov and dc >= 3
    sp, sc, sov, wex = map(
        np.array,
        scene_colliding_pairs_swept(polys, capacity=256, window=59),
    )
    # window = N-1 covers every sorted successor: the certificate
    # must hold and the result must equal the dense query exactly
    # (same pairs, same row-major order, same zero fill).
    assert not wex and not sov
    assert sc == dc
    np.testing.assert_array_equal(sp, dp)


def test_swept_sparse_scene_small_window(rng):
    from collide2d_tpu.ops.scene import scene_colliding_pairs_swept

    # Spread 250 shapes of radius <= 1.6 over a 60x60 box: few shapes
    # share any x interval, so a small window certifies exactness.
    polys = _random_scene(rng, n=250, spread=30.0)
    dp, dc, dov = map(np.array, scene_colliding_pairs(polys, capacity=512))
    assert not dov
    sp, sc, sov, wex = map(
        np.array,
        scene_colliding_pairs_swept(polys, capacity=512, window=32),
    )
    assert not wex, "sparse scene should fit a window-32 sweep"
    assert not sov
    assert sc == dc
    np.testing.assert_array_equal(sp, dp)


def test_swept_window_exceeded_flag(rng):
    from collide2d_tpu.ops.scene import scene_colliding_pairs_swept

    # A dense cluster: every shape x-overlaps every other, so any
    # window < N-1 must raise the certificate flag, and every pair the
    # sweep DOES return must still be genuinely colliding.
    polys = _random_scene(rng, n=40, spread=0.5)
    m = np.array(scene_collision_matrix(polys))
    sp, sc, sov, wex = map(
        np.array,
        scene_colliding_pairs_swept(polys, capacity=1024, window=8),
    )
    assert wex
    for i, j in sp[:sc]:
        assert i < j and m[i, j]


def test_swept_capacity_overflow(rng):
    from collide2d_tpu.ops.scene import scene_colliding_pairs_swept

    polys = _random_scene(rng, n=60)
    _, dc, _ = map(np.array, scene_colliding_pairs(polys, capacity=256))
    cap = int(dc) - 1
    sp, sc, sov, wex = map(
        np.array,
        scene_colliding_pairs_swept(polys, capacity=cap, window=59),
    )
    assert sov and not wex
    assert sc == cap
    m = np.array(scene_collision_matrix(polys))
    for i, j in sp:
        assert i < j and m[i, j]  # a valid subset, sweep-ordered


def test_swept_mask_padding(rng):
    from collide2d_tpu.ops.scene import scene_colliding_pairs_swept

    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    scene = np.stack([
        np.concatenate([sq, sq[-1:]]),
        np.concatenate([sq + [0.5, 0.5], (sq + [0.5, 0.5])[-1:]]),
        np.concatenate([sq + [9.0, 9.0], (sq + [9.0, 9.0])[-1:]]),
    ])
    arb = scene.copy()
    arb[:, -1] = 77.0  # garbage padding slot, masked out
    mask = jnp.asarray(np.array([[True] * 4 + [False]] * 3))
    sp, sc, sov, wex = map(
        np.array,
        scene_colliding_pairs_swept(
            jnp.asarray(arb), mask, capacity=8, window=2
        ),
    )
    assert not sov and not wex
    assert sc == 1
    np.testing.assert_array_equal(sp[0], [0, 1])


def test_swept_manifolds_match_dense(rng):
    from collide2d_tpu.ops.scene import scene_contact_manifolds

    polys = _random_scene(rng, n=250, spread=30.0)
    dense = tuple(
        map(np.array, scene_contact_manifolds(polys, capacity=512))
    )
    swept = tuple(
        map(
            np.array,
            scene_contact_manifolds(
                polys, capacity=512, broad_phase="swept", window=32
            ),
        )
    )
    assert swept[1] == dense[1] and dense[1] >= 1
    for a, b in zip(dense, swept):
        np.testing.assert_array_equal(a, b)

    # Uncertified sweep (window too small for a dense cluster) must
    # yield count 0 + zeroed pairs + the raised flag — never a
    # silently incomplete manifold set.
    cluster = _random_scene(rng, n=40, spread=0.5)
    cp, c, *_, cwex = scene_contact_manifolds(
        cluster, capacity=1024, broad_phase="swept", window=4
    )
    assert int(c) == 0 and bool(cwex)
    np.testing.assert_array_equal(np.array(cp), 0)

    with pytest.raises(ValueError, match="broad_phase"):
        scene_contact_manifolds(polys, capacity=8, broad_phase="grid")


def test_swept_config_sharded_input(rng):
    # The swept query under a config mesh: GSPMD handles the argsort
    # gather and the roll (a collective permute on the sharded axis);
    # output must match the unsharded run bitwise.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from collide2d_tpu.ops.scene import scene_colliding_pairs_swept
    from tests.conftest import cpu_devices

    polys = _random_scene(rng, n=256, spread=30.0)
    base = tuple(
        map(
            np.array,
            scene_colliding_pairs_swept(polys, capacity=512, window=32),
        )
    )
    assert not base[3]  # certified, so the comparison is meaningful
    devs = cpu_devices()[:8]
    mesh = Mesh(np.array(devs), ("config",))
    sharded = jax.device_put(
        polys, NamedSharding(mesh, P("config", None, None))
    )
    out = tuple(
        map(
            np.array,
            scene_colliding_pairs_swept(sharded, capacity=512, window=32),
        )
    )
    for a, b in zip(base, out):
        np.testing.assert_array_equal(a, b)
