"""Pallas TPU kernel: fused Monte Carlo TRAJECTORY sampling for k-gons.

The moving-shape analogue of `ops.mc_polygon_pallas`, restricted to the
planner-common TRANSLATION-ONLY case (``omega == 0`` for every row —
the adaptive driver verifies this with the same one-scalar readback it
already uses to compile the CA loop out of the jnp path). Per sample it
draws the (dx, dy, dtheta) obstacle-pose noise, then resolves the
continuous-collision question "does the robot, translating by
``velocity * t_max`` over t in [0, 1], touch the noisy obstacle?"
through the EXACT per-axis first-contact window of
`ops.toi.polygon_translation_toi_parts` — no conservative-advancement
iteration, one branch-free pass over the SAT axes.

Everything sample-invariant reuses the static polygon kernel's
precomputed rows verbatim (`pack_polygon_mc_params`: robot axes +
intervals, obstacle normals + co-rotating intervals, the cos/sin blend
tables P1/P2/Q1/Q2); the motion adds exactly TWO rows — the obstacle's
relative displacement ``-velocity * t_max`` — because on a robot axis
the projection speed ``a . v`` is sample-invariant (2 extra FMAs), and
on a rotated obstacle normal it is ``n . (R^T v)``, one more cos/sin
blend of the same per-sample pair the translation term already needs.

Window math per axis (identical formulas to
`polygon_translation_toi_parts`, so a zero-velocity batch degenerates
to the static kernel's interval test on the SAME separately-rounded
tables — bitwise zero-motion parity, pinned in
tests/test_moving_polygons.py):

    s     = axis . v_rel                    (obstacle relative velocity)
    ta,tb = (M1 - m2)/s, (m1 - M2)/s        (entry/exit candidates)
    s==0  -> (-inf, inf) if the static intervals overlap else (inf,-inf)
    hit   = max_axes(lo) <= min_axes(hi), window meets [0, 1]

Statistical contract as the static kernel: hardware-PRNG streams tied
to (round, block), labels agree with the threefry jnp path
(`mc.moving.counts_chunk_moving_polygons`) statistically, never
bitwise. The reference has no trajectory sampler of any kind (its
kernel is static rectangles only, generate_dataset.cu:175-253); this
kernel exists because the jnp trajectory path leaves ~10x on the table
for k-gons (7.6e8 samples/s vs the static polygon kernel's 8e9 — the
window test costs about as much as the static SAT it replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collide2d_tpu.ops import mc_pallas as _mcp
from collide2d_tpu.ops.mc_polygon_pallas import (
    LANE_CONFIGS,
    dedup_robot_axes,
    pack_polygon_mc_params,
)


def _static_rows(k: int, k2: int, k2a: int) -> int:
    """Unpadded row count of `pack_polygon_mc_params` (its layout)."""
    return 3 + 4 * k2a + 4 * k + 2 * k2a * k + 2 * k * k2


def _num_rows_moving(k: int, k2: int, k2_axes: int | None = None) -> int:
    """Static rows + 2 relative-velocity rows, padded to a multiple of 8."""
    k2a = k2 if k2_axes is None else k2_axes
    return -(-(_static_rows(k, k2, k2a) + 2) // 8) * 8


def pack_moving_polygon_mc_params(
    configs, robot_verts, a_keep: tuple[int, ...] | None = None
) -> Array:
    """MovingPolygonConfigs + robot polygon -> (ROWS, C) kernel rows.

    The static `pack_polygon_mc_params` layout (the moving configs carry
    the same position/pose_theta/obstacle_verts/std_dev fields), then
    two rows of the obstacle's relative displacement over the unit
    horizon: ``v_rel = -velocity * t_max`` (the `mc.moving` convention —
    the obstacle moves by ``t * v_rel`` in the robot's rest frame).
    """
    rv = jnp.asarray(robot_verts, jnp.float32)
    k2 = rv.shape[0]
    k = configs.obstacle_verts.shape[1]
    k2a = k2 if a_keep is None else len(a_keep)
    base = pack_polygon_mc_params(configs, rv, a_keep)
    v_rel = -(configs.velocity * configs.t_max[:, None])  # (C, 2)
    mat = jnp.concatenate(
        [base[: _static_rows(k, k2, k2a)], v_rel.T.astype(jnp.float32)],
        axis=0,
    )
    pad = _num_rows_moving(k, k2, k2a) - mat.shape[0]
    if pad:
        mat = jnp.concatenate(
            [mat, jnp.zeros((pad, mat.shape[1]), jnp.float32)], axis=0
        )
    return mat


def _axis_window(m1, big_m1, m2, big_m2, s):
    """(lo, hi) hit window on one axis — `polygon_translation_toi_parts`
    formulas verbatim (body 1 static, body 2 moving by ``t * s``)."""
    inf = jnp.float32(jnp.inf)
    zero = s == 0
    inv = 1.0 / jnp.where(zero, jnp.float32(1.0), s)
    ta = (big_m1 - m2) * inv
    tb = (m1 - big_m2) * inv
    inside = jnp.logical_and(m2 <= big_m1, m1 <= big_m2)
    lo = jnp.where(zero, jnp.where(inside, -inf, inf), jnp.minimum(ta, tb))
    hi = jnp.where(zero, jnp.where(inside, inf, -inf), jnp.maximum(ta, tb))
    return lo, hi


def _poly_window_hit(rows, k: int, k2: int, z_dx, z_dy, z_th, k2_axes=None):
    """Trajectory-hit mask for one 3-normal draw — shared by the kernel
    and the CI replay in tests (pins the wiring bit-for-bit).

    ``rows``: callable i -> (1, L) parameter row, laid out as in
    `pack_moving_polygon_mc_params`. Offsets mirror
    `mc_polygon_pallas._poly_separated` plus the two velocity rows.
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
    o_vx = o_q2 + k * k2
    o_vy = o_vx + 1

    dx = z_dx * sx
    dy = z_dy * sy
    th = z_th * sth
    ct = jnp.cos(th)
    st = jnp.sin(th)
    u1 = ct * dx + st * dy   # (R^T t)_x
    u2 = ct * dy - st * dx   # (R^T t)_y
    vx, vy = rows(o_vx), rows(o_vy)
    w1 = ct * vx + st * vy   # (R^T v_rel)_x
    w2 = ct * vy - st * vx   # (R^T v_rel)_y

    inf = jnp.float32(jnp.inf)
    entry = jnp.full_like(dx, -inf)
    exit_ = jnp.full_like(dx, inf)
    for i in range(k2a):  # robot axes: fixed interval vs blended obstacle
        at = rows(o_ax + i) * dx + rows(o_ay + i) * dy
        mn = mx = ct * rows(o_p1 + i * k) + st * rows(o_p2 + i * k)
        for j in range(1, k):
            p = ct * rows(o_p1 + i * k + j) + st * rows(o_p2 + i * k + j)
            mn = jnp.minimum(mn, p)
            mx = jnp.maximum(mx, p)
        s = rows(o_ax + i) * vx + rows(o_ay + i) * vy
        lo, hi = _axis_window(
            rows(o_rmin + i), rows(o_rmax + i), mn + at, mx + at, s
        )
        entry = jnp.maximum(entry, lo)
        exit_ = jnp.minimum(exit_, hi)
    for j in range(k):  # obstacle axes: invariant interval + translation
        bt = rows(o_nx + j) * u1 + rows(o_ny + j) * u2
        mn = mx = ct * rows(o_q1 + j * k2) + st * rows(o_q2 + j * k2)
        for i in range(1, k2):
            p = ct * rows(o_q1 + j * k2 + i) + st * rows(o_q2 + j * k2 + i)
            mn = jnp.minimum(mn, p)
            mx = jnp.maximum(mx, p)
        s = rows(o_nx + j) * w1 + rows(o_ny + j) * w2
        lo, hi = _axis_window(
            mn, mx, rows(o_nmin + j) + bt, rows(o_nmax + j) + bt, s
        )
        entry = jnp.maximum(entry, lo)
        exit_ = jnp.minimum(exit_, hi)
    return jnp.logical_and(
        jnp.logical_and(entry <= exit_, entry <= 1.0), exit_ >= 0.0
    )


def _mc_moving_poly_kernel(
    seed_ref, n_steps_ref, params_ref, out_ref, *, sub: int, k: int, k2: int,
    k2_axes: int, normal_method: str = "erfinv",
):
    if _mcp._TEST_UNIFORM_FN is None:
        block_mix = pl.program_id(0) * jnp.int32(-1640531527)  # 0x9E3779B9
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] ^ block_mix)
    n_steps = n_steps_ref[0, 0]

    p = params_ref[...]
    rows = lambda i: p[i, :][None, :]
    shape = (sub // 2, LANE_CONFIGS)

    draw_pair = (
        _mcp._box_muller if normal_method == "box_muller"
        else _mcp._erfinv_pair
    )

    def step(_, acc):
        # Same draw schedule as the static polygon kernel: three normal
        # pairs = the (dx, dy, theta) noise for TWO samples per tile row
        # (a zero-motion batch therefore consumes identical streams).
        za_dx, zb_dx = draw_pair(shape)
        za_dy, zb_dy = draw_pair(shape)
        za_th, zb_th = draw_pair(shape)
        hit_a = _poly_window_hit(rows, k, k2, za_dx, za_dy, za_th, k2_axes)
        hit_b = _poly_window_hit(rows, k, k2, zb_dx, zb_dy, zb_th, k2_axes)
        hits = hit_a.astype(jnp.int32) + hit_b.astype(jnp.int32)
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
def mc_moving_poly_counts_pallas(
    seed, params: Array, n_steps, *, sub: int = 16, k: int, k2: int,
    k2_axes: int | None = None, interpret: bool = False,
    normal_method: str = "erfinv",
) -> Array:
    """Trajectory-collision counts out of ``n_steps * sub`` samples per
    config. Contract as `mc_polygon_pallas.mc_poly_counts_pallas`;
    ``params`` from `pack_moving_polygon_mc_params`.
    """
    if k2_axes is None:
        k2_axes = k2
    c = params.shape[1]
    assert params.shape[0] == _num_rows_moving(k, k2, k2_axes), (
        params.shape, k, k2, k2_axes,
    )
    assert c % LANE_CONFIGS == 0, c
    assert sub % 2 == 0 and sub >= 16, sub
    assert normal_method in ("box_muller", "erfinv"), normal_method
    kernel = functools.partial(
        _mc_moving_poly_kernel, sub=sub, k=k, k2=k2, k2_axes=k2_axes,
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


def mc_round_moving_polygons_pallas(
    key: Array,
    configs,
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
    """Drop-in round step on the fused trajectory k-gon kernel.

    TRANSLATION-ONLY: the caller must guarantee ``configs.omega == 0``
    for every row (the adaptive driver's one-scalar readback does; see
    `mc.driver`). Same call shape as
    `mc_polygon_pallas.mc_round_polygons_pallas`.
    """
    if n_steps is None:
        sub = _mcp._pick_sub(n_batch)
        n_steps = n_batch // sub
    c = configs.num
    rv = jnp.asarray(robot_verts, jnp.float32)
    if a_keep is None and not isinstance(rv, jax.core.Tracer):
        a_keep = dedup_robot_axes(rv)
    params = pack_moving_polygon_mc_params(configs, rv, a_keep)
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
    counts = mc_moving_poly_counts_pallas(
        seed, params, n_steps, sub=sub,
        k=configs.obstacle_verts.shape[1], k2=rv.shape[0],
        k2_axes=rv.shape[0] if a_keep is None else len(a_keep),
        interpret=interpret, normal_method=normal_method,
    )
    return counts[:c].astype(jnp.int32)
