"""Pallas TPU kernel: fused Monte Carlo TRAJECTORY sampling.

The moving-robot analogue of `ops.mc_pallas`: one kernel fuses noise
draws (hardware PRNG + inverse-CDF normals, the exact machinery of
`mc_pallas`), noisy-obstacle construction, and a conservative-
advancement time-of-impact query per sample (the `mc.moving` predicate)
— with nothing touching HBM except the per-configuration parameter rows
(76 bytes/config, read once per round) and the final counts.

Measured reality on a v5e (``bench_mc_moving*``, difference-quotient
timing): on TRANSLATION-ONLY batches — every sample resolved by the
exact first-contact window, the planner-common case — the kernel
streams 6.9-7.1e9 samples/s across rounds; the threefry XLA path's
draws on the SAME metric have swung 4.4e9 (round 4) to 8.1e9 (round
5) with NO code change on that path (toi/estimator untouched since
round 3) — this pair dispatches ~0.5-1 ms programs, deep in
remote-tunnel RTT jitter, so treat kernel-vs-jnp here as WITHIN
SPREAD rather than a stable ranking ('auto' keeps the kernel for
translation: its draws are the stabler of the two, and explicit
impl='jnp' restores the bitwise uid-stream path when that contract
matters). On ROTATING batches the conservative-advancement loop (4
transcendentals per step per sample) is trig-issue-bound in Mosaic
and the kernel measures 1.5e8 vs the XLA path's 2.5e8 — a quantified
LOSS, so the adaptive driver's 'auto' resolves rotating trajectory
batches to impl='jnp' and reserves this kernel for translation-only
batches (driver readback; explicit impl='pallas' is honored). Since
round 4 the jnp rotating path additionally runs the certified
screening cascade (mc.moving._screened_rotating_hits, 5.3-5.6e8
samples/s — ~4x this kernel's rotating rate), which widens the case
for 'auto' keeping XLA on rotation. The CA loop still early-exits per (sub, 128) tile
(`lax.while_loop`; `ca_iters` stays the hard bound so results are
identical to the fixed-trip loop).

Sample predicate: IDENTICAL formulas to `mc.moving.counts_chunk_moving`
(the closed-form OBB signed distance `obb_signed_distance_tile`, exact
— overlap gaps + vertex-to-box minima), so the two paths differ only in
PRNG stream, never in per-draw decisions. Statistical contract as
`mc_pallas`: streams tied to (round, block); the adaptive driver
reseeds per round.

Layout: configurations are LANES (`pack_mc_toi_params`, (19, C) rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import collide2d_tpu.ops.mc_pallas as mcp
from collide2d_tpu.ops.distance_pallas import obb_signed_distance_tile
from collide2d_tpu.ops.toi import obb_translation_toi_parts

LANE_CONFIGS = 128
PARAM_ROWS = 19


def pack_mc_toi_params(configs, robot_wh) -> Array:
    """MovingConfigs + robot -> (19, C) parameter rows.

    Rows: 0 px, 1 py, 2 theta, 3 rw/2, 4 rh/2, 5 ow/2, 6 oh/2,
    7 sigma_x, 8 sigma_y, 9 sigma_theta, 10 sigma_w/2, 11 sigma_h/2,
    12 vx*t_max, 13 vy*t_max, 14 omega*t_max, 15 advancement bound,
    16-18 zero padding (sublane-multiple-of-8 friendly is not required
    for a VMEM block, but a fixed row count keeps the BlockSpec static).
    The horizon folds into the motion rows exactly like
    `mc.moving.counts_chunk_moving` (unit-horizon advancement).
    """
    robot_wh = jnp.broadcast_to(
        jnp.asarray(robot_wh, jnp.float32), configs.position.shape
    )
    v_eff = configs.velocity * configs.t_max[:, None]
    w_eff = configs.omega * configs.t_max
    r_rob = 0.5 * jnp.hypot(robot_wh[:, 0], robot_wh[:, 1])
    bound = jnp.hypot(v_eff[:, 0], v_eff[:, 1]) + jnp.abs(w_eff) * r_rob
    zero = jnp.zeros_like(bound)
    rows = [
        configs.position[:, 0],
        configs.position[:, 1],
        configs.pose_theta,
        jnp.abs(robot_wh[:, 0]) * 0.5,
        jnp.abs(robot_wh[:, 1]) * 0.5,
        configs.obstacle_wh[:, 0] * 0.5,
        configs.obstacle_wh[:, 1] * 0.5,
        configs.std_dev[:, 0],
        configs.std_dev[:, 1],
        configs.std_dev[:, 2],
        configs.std_dev[:, 3] * 0.5,
        configs.std_dev[:, 4] * 0.5,
        v_eff[:, 0],
        v_eff[:, 1],
        w_eff,
        jnp.maximum(bound, jnp.float32(1e-30)),
        zero,
        zero,
        zero,
    ]
    return jnp.stack(rows, axis=0)


def _toi_hits_tile(
    ox, oy, cphi, sphi, a, b,
    px, py, theta, hx1, hy1, vx, vy, w, bound,
    ca_iters: int, tol: float,
):
    """Per-sample trajectory-hit mask on a (S, L) tile — the kernel's
    inner math, shared with the CI replay in tests/test_pallas.py.

    (ox, oy, phi-as-cos/sin, a, b) describe the noisy STATIC obstacle
    per sample; the per-config rows describe the robot and its unit-
    horizon motion. Returns bool (S, L).

    Non-rotating lanes (w == 0) resolve through the EXACT translation
    window (`ops.toi.obb_translation_toi_parts` — no iteration, no
    tolerance band, and no per-step transcendentals: the kernel's CA
    loop is trig-bound, so this is both the accuracy and the throughput
    path). Rotating lanes run conservative advancement; they are the
    only lanes that keep the while-loop alive. ``ca_iters == 0`` asserts
    a translation-only batch and skips the CA trace entirely (the
    adaptive driver auto-detects this with one host readback)."""
    c1_, s1_ = jnp.cos(theta), jnp.sin(theta)
    entry, exit_ = obb_translation_toi_parts(
        ox - px, oy - py, c1_, s1_, hx1, hy1, cphi, sphi, a, b,
        -vx, -vy,  # obstacle velocity relative to the robot
    )
    hit_exact = (entry <= exit_) & (entry <= 1.0) & (exit_ >= 0)
    if ca_iters == 0:
        return hit_exact

    tol_f = jnp.float32(tol)
    rotating = w != 0

    def dist_at(t):
        a1 = theta + t * w
        dx = ox - (px + t * vx)
        dy = oy - (py + t * vy)
        return obb_signed_distance_tile(
            dx, dy, jnp.cos(a1), jnp.sin(a1), hx1, hy1, cphi, sphi, a, b
        )

    def cond(carry):
        i, _, any_live = carry
        return jnp.logical_and(i < ca_iters, any_live)

    def body(carry):
        i, t, _ = carry
        d = dist_at(t)
        done = jnp.logical_not(rotating) | (d <= tol_f) | (t > 1.0)
        t = jnp.where(done, t, t + jnp.maximum(d, 0.0) / bound)
        return i + 1, t, jnp.logical_not(jnp.all(done))

    # Seed liveness with the actual rotating mask so a translation-only
    # sample step skips the CA body outright (its lanes are decided by
    # hit_exact below).
    _, t, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros(ox.shape, jnp.float32), jnp.any(rotating)),
    )
    hit_ca = (dist_at(t) <= tol_f) & (t <= 1.0)
    # boolean select spelled as logic ops: Mosaic's select_n on i1
    # vectors fails to lower ("Unsupported target bitwidth for
    # truncation", observed on v5e)
    return (rotating & hit_ca) | (jnp.logical_not(rotating) & hit_exact)


def _mc_toi_kernel(
    seed_ref, n_steps_ref, params_ref, out_ref, *, sub: int,
    shape_noise: bool, ca_iters: int, tol: float,
):
    if mcp._TEST_UNIFORM_FN is None:
        block_mix = pl.program_id(0) * jnp.int32(-1640531527)  # 0x9E3779B9
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] ^ block_mix)
    n_steps = n_steps_ref[0, 0]

    p = params_ref[...]  # (19, LANE_CONFIGS)
    row = lambda i: p[i, :][None, :]  # (1, L), broadcasts over sublanes
    px, py, theta = row(0), row(1), row(2)
    hx1, hy1 = row(3), row(4)
    ow_h, oh_h = row(5), row(6)
    sx, sy, sth = row(7), row(8), row(9)
    swh, shh = row(10), row(11)
    vx, vy, w = row(12), row(13), row(14)
    bound = row(15)

    half = (sub // 2, LANE_CONFIGS)
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)  # -> (sub, L)

    def draw(shape):
        z0, z1 = mcp._erfinv_pair(shape)
        return cat(z0, z1)

    def step(_, acc):
        # one (sub, L) tile of samples; 5 (or 3) normal pairs per pair
        # of rows, exactly the static kernel's draw economy
        ox = draw(half) * sx
        oy = draw(half) * sy
        phi = draw(half) * sth
        if shape_noise:
            a = jnp.abs(ow_h + draw(half) * swh)
            b = jnp.abs(oh_h + draw(half) * shh)
        else:
            a = jnp.abs(jnp.broadcast_to(ow_h, ox.shape))
            b = jnp.abs(jnp.broadcast_to(oh_h, ox.shape))
        hit = _toi_hits_tile(
            ox, oy, jnp.cos(phi), jnp.sin(phi), a, b,
            px, py, theta, hx1, hy1, vx, vy, w, bound, ca_iters, tol,
        )
        return acc + jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)

    acc = jax.lax.fori_loop(
        0, n_steps, step, jnp.zeros((1, LANE_CONFIGS), jnp.int32)
    )
    out_ref[...] = acc


@functools.partial(
    jax.jit,
    static_argnames=("sub", "shape_noise", "ca_iters", "tol", "interpret"),
)
def mc_toi_counts_pallas(
    seed, params: Array, n_steps, *, sub: int = 16,
    shape_noise: bool = True, ca_iters: int = 48, tol: float = 1e-4,
    interpret: bool = False,
) -> Array:
    """Trajectory-collision counts out of ``n_steps * sub`` samples per
    config. Contract as `mc_pallas.mc_counts_pallas` (traced n_steps,
    (2,) seed words, C multiple of 128), with the advancement knobs
    static."""
    c = params.shape[1]
    assert params.shape[0] == PARAM_ROWS, params.shape
    assert c % LANE_CONFIGS == 0, c
    assert sub % 2 == 0 and sub >= 8, sub
    kernel = functools.partial(
        _mc_toi_kernel, sub=sub, shape_noise=shape_noise,
        ca_iters=int(ca_iters), tol=float(tol),
    )
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed.shape[0] == 1:
        seed = jnp.concatenate([seed, jnp.zeros((1,), jnp.int32)])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.int32),
        grid=(c // LANE_CONFIGS,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (PARAM_ROWS, LANE_CONFIGS), lambda i: (0, i),
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


def mc_round_moving_pallas(
    key: Array,
    configs,
    robot_wh,
    round_tag,
    *,
    n_batch: int | None = None,
    n_steps=None,
    sub: int | None = None,
    shape_noise: bool = True,
    ca_iters: int = 48,
    tol: float = 1e-4,
    interpret: bool = False,
) -> Array:
    """Drop-in round step for `MovingConfigs` on the fused kernel:
    int32 (C,) counts. Mirrors `mc_pallas.mc_round_pallas` (reseed per
    round via ``round_tag``; traced ``n_steps`` + static ``sub`` lets one
    compilation serve every round size)."""
    if n_steps is None:
        sub = mcp._pick_sub(n_batch)
        n_steps = n_batch // sub
    c = configs.num
    params = pack_mc_toi_params(configs, robot_wh)
    pad = -(-c // LANE_CONFIGS) * LANE_CONFIGS - c
    if pad:
        params = jnp.concatenate(
            [params, jnp.broadcast_to(params[:, :1], (PARAM_ROWS, pad))],
            axis=1,
        )
    folded = jax.random.fold_in(key, round_tag)
    seed = jax.lax.bitcast_convert_type(
        jax.random.key_data(folded).reshape(-1)[:2], jnp.int32
    )
    counts = mc_toi_counts_pallas(
        seed, params, n_steps, sub=sub, shape_noise=shape_noise,
        ca_iters=ca_iters, tol=tol, interpret=interpret,
    )
    return counts[:c].astype(jnp.int32)
