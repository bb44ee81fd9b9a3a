"""Pallas TPU kernel: fused Monte Carlo collision sampling for k-gons.

The polygon counterpart of `ops.mc_pallas` — one kernel fuses the
per-sample pipeline of the k-gon noise model (`mc.estimator.
_counts_chunk_polygons`: draw (dx, dy, dtheta), rigid-transform the
obstacle polygon, true-normal SAT against the fixed robot polygon,
accumulate). The reference has no polygon MC at all (its kernel is
rectangle-only, generate_dataset.cu:175-253; README.md:3 names convex
polygons as SAT's extension but never builds the sampler).

The trick that makes a k-gon SAT cheap per sample: EVERYTHING that does
not depend on the (dx, dy, dtheta) draw is precomputed into per-config
parameter rows by `pack_polygon_mc_params` (one XLA pass per round):

  - the robot's world vertices, edge axes, and its own projection
    intervals [Rmin_i, Rmax_i] are sample-invariant;
  - a rotation decomposes: a · R(t)v = cos(t)(a·v) + sin(t)(ax vy - ay
    vx is the cross term) — so the obstacle-vertex projections onto
    each robot axis are cos/sin blends of two PRECOMPUTED tables
    (P1, P2), plus one axis·translation term per sample;
  - the obstacle's own projections onto its own (co-rotating) normals
    are rotation-INVARIANT: interval [Nmin_j, Nmax_j] precomputes
    exactly, and only the translation term (R n_j)·t varies;
  - robot-vertex projections onto the rotated obstacle normals blend
    two more tables (Q1, Q2).

Per sample per config that leaves ~2(K2*K) fused multiply-adds, two
min/max trees, one cos/sin pair, and 1.5 Box-Muller pairs — all on
(sub/2, 128) register tiles with configurations as lanes.

Padded fixed-K polygons (repeat-last-vertex convention, see
ops.sat.sat_polygons) work unchanged: a duplicated vertex adds a
zero-normal axis whose projections are identically zero on both bodies
— never separating — and never moves an interval's min/max.

Statistical contract: same noise model as the jnp path; labels agree
statistically, not bitwise (different PRNG + refactored rounding), the
same caveat as the rectangle kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collide2d_tpu.mc.estimator import PolygonConfigs
from collide2d_tpu.ops import mc_pallas as _mcp
from collide2d_tpu.ops.geometry import edge_normals, transform_vertices

LANE_CONFIGS = 128  # configurations per grid block (one lane each)


def dedup_robot_axes(robot_verts) -> tuple[int, ...]:
    """Indices of the robot's edge normals with duplicates removed.

    SAT verdicts are invariant under dropping an axis that is (anti-)
    parallel to an earlier one — the projection intervals merely scale
    and/or negate-and-swap. A centrally symmetric robot (rectangles, any
    even-gon with opposite edges parallel — rigid motion preserves the
    pattern, so the BASE polygon decides) therefore needs only half its
    axes. Exact-zero cross products only: near-parallel axes are kept,
    so the axis SET is never approximated. Host-side (concrete numpy).
    """
    import numpy as np

    v = np.asarray(robot_verts, np.float32)
    e = np.roll(v, -1, axis=0) - v
    axes = np.stack([e[:, 1], -e[:, 0]], axis=-1)
    keep = []
    for i in range(axes.shape[0]):
        if axes[i, 0] == 0.0 and axes[i, 1] == 0.0:
            # Zero-length edge (e.g. repeat-padded vertex): its zero
            # normal never separates, so drop it outright. Keeping it
            # would be worse than useless — cross() with the zero axis
            # is always 0, so every later REAL axis would be discarded
            # as its "duplicate".
            continue
        dup = any(
            float(axes[i, 0] * axes[j, 1] - axes[i, 1] * axes[j, 0]) == 0.0
            for j in keep
        )
        if not dup:
            keep.append(i)
    return tuple(keep)


def _num_rows(k: int, k2: int, k2_axes: int | None = None) -> int:
    """Parameter rows: 3 sigmas + robot axes (2*K2A) + robot intervals
    (2*K2A) + obstacle normals (2*K) + obstacle intervals (2*K) +
    P1/P2 (2*K2A*K) + Q1/Q2 (2*K*K2), padded to a multiple of 8.
    K2A = number of KEPT robot axes (<= K2; see `dedup_robot_axes`)."""
    if k2_axes is None:
        k2_axes = k2
    n = 3 + 4 * k2_axes + 4 * k + 2 * k2_axes * k + 2 * k * k2
    return -(-n // 8) * 8


def pack_polygon_mc_params(
    configs: PolygonConfigs, robot_verts, a_keep: tuple[int, ...] | None = None
) -> Array:
    """PolygonConfigs + robot polygon -> (ROWS, C) rows for the kernel.

    All sample-invariant SAT geometry is folded here (one fused XLA pass
    per round; ~K^2 scalars per config read once per round from HBM).
    ``a_keep``: static robot-axis subset from `dedup_robot_axes` (None =
    keep all) — the packed A-side rows cover only these axes.
    """
    rv = jnp.asarray(robot_verts, jnp.float32)  # (K2, 2)
    k2 = rv.shape[0]
    ov = configs.obstacle_verts  # (C, K, 2)
    k = ov.shape[1]
    if a_keep is None:
        a_keep = tuple(range(k2))

    # Robot world vertices (sample-invariant): rotate-then-translate,
    # the shared reference-parity transform (utils.cu:132-142).
    r = transform_vertices(
        rv[None], configs.position[:, 0], configs.position[:, 1],
        configs.pose_theta,
    )  # (C, K2, 2)

    a = edge_normals(r)   # (C, K2, 2) robot axes (world, sample-invariant)
    n = edge_normals(ov)  # (C, K, 2) obstacle normals (obstacle frame)
    a = a[:, jnp.asarray(a_keep, jnp.int32)]  # (C, K2A, 2) deduped axes
    k2a = len(a_keep)

    # All projection tables as EXPLICIT mul+add over the length-2
    # coordinate axis — never einsum/dot. On TPU, XLA lowers f32
    # contractions to bf16 MXU passes at the default precision, and the
    # ~0.4% relative error that puts in these tables flips the interval
    # (and especially the trajectory-WINDOW) tests on boundary
    # geometries: measured on-chip round 4 as a z~40 per-config label
    # bias of the moving-polygon kernel vs the threefry path at a FIXED
    # budget, reproduced at sigma=0 as outright deterministic verdict
    # flips (~2e-4 of configs) — invisible to interpret-mode tests,
    # where einsum is exact f32. Elementwise mul+add stays f32 on the
    # VPU (the same rule `sat._project_all` documents for parity).
    def _dot2(x, y):  # (C, I, 2) x (C, J, 2) -> (C, I, J), VPU f32
        return (
            x[..., 0][:, :, None] * y[..., 0][:, None, :]
            + x[..., 1][:, :, None] * y[..., 1][:, None, :]
        )

    # Robot's own intervals on its (kept) axes — over ALL robot verts.
    pr = _dot2(a, r)  # (C, K2A, K2)
    rmin = jnp.min(pr, axis=-1)
    rmax = jnp.max(pr, axis=-1)
    # Obstacle's own intervals on its own (co-rotating) normals:
    # (R n_j)·(R v_l) = n_j·v_l — rotation-invariant.
    po = _dot2(n, ov)  # (C, K, K)
    nmin = jnp.min(po, axis=-1)
    nmax = jnp.max(po, axis=-1)
    # Blend tables: a_i · R(t) v_j = ct*P1[i,j] + st*P2[i,j]
    p1 = _dot2(a, ov)  # (C, K2A, K)
    p2 = (
        a[..., 1][:, :, None] * ov[..., 0][:, None, :]
        - a[..., 0][:, :, None] * ov[..., 1][:, None, :]
    )  # ay*vx - ax*vy  (the -cross(a, v) term)
    # (R n_j) · r_i = ct*Q1[j,i] + st*Q2[j,i]
    q1 = _dot2(n, r)  # (C, K, K2)
    q2 = (
        n[..., 0][:, :, None] * r[..., 1][:, None, :]
        - n[..., 1][:, :, None] * r[..., 0][:, None, :]
    )  # nx*ry - ny*rx

    c = configs.num
    rows = [
        configs.std_dev[:, 0],
        configs.std_dev[:, 1],
        configs.std_dev[:, 2],
        a[..., 0].T.reshape(k2a, c),
        a[..., 1].T.reshape(k2a, c),
        rmin.T.reshape(k2a, c),
        rmax.T.reshape(k2a, c),
        n[..., 0].T.reshape(k, c),
        n[..., 1].T.reshape(k, c),
        nmin.T.reshape(k, c),
        nmax.T.reshape(k, c),
        p1.transpose(1, 2, 0).reshape(k2a * k, c),
        p2.transpose(1, 2, 0).reshape(k2a * k, c),
        q1.transpose(1, 2, 0).reshape(k * k2, c),
        q2.transpose(1, 2, 0).reshape(k * k2, c),
    ]
    rows = [jnp.atleast_2d(x) for x in rows]
    mat = jnp.concatenate(rows, axis=0)
    pad = _num_rows(k, k2, k2a) - mat.shape[0]
    if pad:
        mat = jnp.concatenate(
            [mat, jnp.zeros((pad, c), jnp.float32)], axis=0
        )
    return mat.astype(jnp.float32)


def _poly_separated(rows, k: int, k2: int, z_dx, z_dy, z_th, k2_axes=None):
    """Separation mask for one 3-normal draw — shared by the kernel and
    the CI replay in tests (pins the wiring bit-for-bit).

    ``rows``: callable i -> (1, L) parameter row, laid out as in
    `pack_polygon_mc_params`. ``k2_axes``: number of KEPT robot axes the
    rows were packed with (None = all K2).
    """
    k2a = k2 if k2_axes is None else k2_axes
    sx, sy, sth = rows(0), rows(1), rows(2)
    o_ax, o_ay = 3, 3 + k2a
    o_rmin, o_rmax = 3 + 2 * k2a, 3 + 3 * k2a
    o_nx, o_ny = 3 + 4 * k2a, 3 + 4 * k2a + k
    o_nmin, o_nmax = 3 + 4 * k2a + 2 * k, 3 + 4 * k2a + 3 * k
    o_p1 = 3 + 4 * k2a + 4 * k
    o_p2 = o_p1 + k2a * k
    o_q1 = o_p2 + k2a * k
    o_q2 = o_q1 + k * k2

    dx = z_dx * sx
    dy = z_dy * sy
    th = z_th * sth
    ct = jnp.cos(th)
    st = jnp.sin(th)
    u1 = ct * dx + st * dy   # (R^T t)_x
    u2 = ct * dy - st * dx   # (R^T t)_y

    sep = None
    for i in range(k2a):  # robot axes: fixed interval vs blended obstacle
        at = rows(o_ax + i) * dx + rows(o_ay + i) * dy
        mn = mx = ct * rows(o_p1 + i * k) + st * rows(o_p2 + i * k)
        for j in range(1, k):
            p = ct * rows(o_p1 + i * k + j) + st * rows(o_p2 + i * k + j)
            mn = jnp.minimum(mn, p)
            mx = jnp.maximum(mx, p)
        s = jnp.logical_or(
            mx + at < rows(o_rmin + i), rows(o_rmax + i) < mn + at
        )
        sep = s if sep is None else jnp.logical_or(sep, s)
    for j in range(k):  # obstacle axes: invariant interval + translation
        bt = rows(o_nx + j) * u1 + rows(o_ny + j) * u2
        mn = mx = ct * rows(o_q1 + j * k2) + st * rows(o_q2 + j * k2)
        for i in range(1, k2):
            p = ct * rows(o_q1 + j * k2 + i) + st * rows(o_q2 + j * k2 + i)
            mn = jnp.minimum(mn, p)
            mx = jnp.maximum(mx, p)
        s = jnp.logical_or(
            mx < rows(o_nmin + j) + bt, rows(o_nmax + j) + bt < mn
        )
        # sep can still be None here when k2_axes == 0 (a fully
        # degenerate robot whose axes all deduped away as zero-length).
        sep = s if sep is None else jnp.logical_or(sep, s)
    return sep


def _mc_poly_kernel(
    seed_ref, n_steps_ref, params_ref, out_ref, *, sub: int, k: int, k2: int,
    k2_axes: int, normal_method: str = "erfinv",
):
    if _mcp._TEST_UNIFORM_FN is None:
        block_mix = pl.program_id(0) * jnp.int32(-1640531527)  # 0x9E3779B9
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] ^ block_mix)
    n_steps = n_steps_ref[0, 0]

    p = params_ref[...]
    rows = lambda i: p[i, :][None, :]  # (1, L), broadcasts over sublanes
    shape = (sub // 2, LANE_CONFIGS)

    draw_pair = (
        _mcp._box_muller if normal_method == "box_muller"
        else _mcp._erfinv_pair
    )

    def step(_, acc):
        # Three normal pairs = six normals = the (dx, dy, theta) noise
        # for exactly TWO samples per tile row (erfinv by default — see
        # mc_pallas._erfinv_pair for the measured win over Box-Muller).
        za_dx, zb_dx = draw_pair(shape)
        za_dy, zb_dy = draw_pair(shape)
        za_th, zb_th = draw_pair(shape)
        sep_a = _poly_separated(rows, k, k2, za_dx, za_dy, za_th, k2_axes)
        sep_b = _poly_separated(rows, k, k2, zb_dx, zb_dy, zb_th, k2_axes)
        hits = jnp.logical_not(sep_a).astype(jnp.int32) + jnp.logical_not(
            sep_b
        ).astype(jnp.int32)
        return acc + jnp.sum(hits, axis=0, keepdims=True)

    acc = jax.lax.fori_loop(
        0, n_steps, step, jnp.zeros((1, LANE_CONFIGS), jnp.int32)
    )
    out_ref[...] = acc


@functools.partial(
    jax.jit,
    static_argnames=("sub", "k", "k2", "k2_axes", "interpret",
                     "normal_method"),
)
def mc_poly_counts_pallas(
    seed, params: Array, n_steps, *, sub: int = 16, k: int, k2: int,
    k2_axes: int | None = None, interpret: bool = False,
    normal_method: str = "erfinv",
) -> Array:
    """Collision counts out of ``n_steps * sub`` samples per config.

    Same contract as `mc_pallas.mc_counts_pallas` (two seed words, traced
    ``n_steps``, configs as lanes); ``params`` from
    `pack_polygon_mc_params`, ``k``/``k2`` the obstacle/robot vertex
    counts the rows were packed with; ``k2_axes`` the kept robot-axis
    count when the rows were packed with a `dedup_robot_axes` subset.
    """
    if k2_axes is None:
        k2_axes = k2
    c = params.shape[1]
    assert params.shape[0] == _num_rows(k, k2, k2_axes), (params.shape, k, k2)
    assert c % LANE_CONFIGS == 0, c
    assert sub % 2 == 0 and sub >= 16, sub
    assert normal_method in ("box_muller", "erfinv"), normal_method
    kernel = functools.partial(
        _mc_poly_kernel, sub=sub, k=k, k2=k2, k2_axes=k2_axes,
        normal_method=normal_method,
    )
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:2]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.int32),
        grid=(c // LANE_CONFIGS,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (params.shape[0], LANE_CONFIGS),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, LANE_CONFIGS), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        seed.reshape(1, 2),
        jnp.asarray(n_steps, jnp.int32).reshape(1, 1),
        params,
    )
    return out[0]


def mc_round_polygons_pallas(
    key: Array,
    configs: PolygonConfigs,
    robot_verts,
    round_tag,
    *,
    n_batch: int | None = None,
    n_steps=None,
    sub: int | None = None,
    a_keep: tuple[int, ...] | None = None,
    interpret: bool = False,
    normal_method: str = "erfinv",
) -> Array:
    """Drop-in round step on the fused polygon kernel: int32 (C,) counts.

    Same call shape as `mc_pallas.mc_round_pallas`; ``robot_verts`` is
    the (K2, 2) robot polygon. ``round_tag`` must differ across rounds.
    ``a_keep``: static robot-axis subset (`dedup_robot_axes`); when None
    and ``robot_verts`` is concrete it is computed automatically (a
    centrally symmetric robot then skips half its axis tests); traced
    robot vertices keep all axes unless the caller passes the subset.
    """
    if n_steps is None:
        sub = _mcp._pick_sub(n_batch)
        n_steps = n_batch // sub
    c = configs.num
    rv = jnp.asarray(robot_verts, jnp.float32)
    if a_keep is None and not isinstance(rv, jax.core.Tracer):
        a_keep = dedup_robot_axes(rv)
    params = pack_polygon_mc_params(configs, rv, a_keep)
    pad = -(-c // LANE_CONFIGS) * LANE_CONFIGS - c
    if pad:
        params = jnp.concatenate(
            [params, jnp.broadcast_to(params[:, :1], (params.shape[0], pad))],
            axis=1,
        )
    folded = jax.random.fold_in(key, round_tag)
    seed = jax.lax.bitcast_convert_type(
        jax.random.key_data(folded).reshape(-1)[:2], jnp.int32
    )
    counts = mc_poly_counts_pallas(
        seed, params, n_steps, sub=sub,
        k=configs.obstacle_verts.shape[1], k2=rv.shape[0],
        k2_axes=rv.shape[0] if a_keep is None else len(a_keep),
        interpret=interpret, normal_method=normal_method,
    )
    return counts[:c].astype(jnp.int32)
