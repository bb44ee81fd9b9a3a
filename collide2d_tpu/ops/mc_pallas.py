"""Pallas TPU kernel: fused Monte Carlo collision sampling.

One kernel fuses the entire per-sample pipeline of the reference's hot
loop (generate_dataset.cu:238-242 — curand draws, noisy-obstacle
construction, SAT, accumulation) with NOTHING touching HBM except the
per-configuration parameter rows (64 bytes/config, read once per round)
and the final counts (4 bytes/config):

  - randomness: the on-core hardware PRNG (`pltpu.prng_random_bits`),
    seeded per (round, grid block) with BOTH 32-bit halves of the folded
    threefry key (64-bit round entropy — a single int32 would birthday-
    collide across rounds x blocks) and the block id hash-mixed into the
    second word. Normals via inverse-CDF `erf_inv` by default (jax.
    random.normal's method — a polynomial of FMAs instead of Box-
    Muller's log/sqrt/cos/sin; +21-25% measured on v5e, the kernel
    being VPU-issue-bound with the normal draws its largest op block),
    with Box-Muller (curand_normal's method) selectable for A/B. Each
    loop step draws FIVE normal pairs = ten normals = the noise for
    exactly TWO samples, so no half-pair is ever wasted (a
    6-normals-for-5 layout measured 14% slower);
  - the sampled obstacle is used in closed OBB form (`ops.sat.obb_collide`
    math): center (dx,dy), half-extents |wh/2 + z*sigma_wh/2|, angle
    dtheta — no vertex materialization. The axis test uses the
    RELATIVE-ANGLE form: cos/sin of (theta - dtheta) directly instead of
    cos/sin(dtheta) plus 6 extra ops/sample for the axis-dot products
    (same two transcendentals, measurably fewer VPU issues);
  - the 4-axis separation test runs on (SUB/2, 128) register tiles:
    SUB samples x 128 configurations per VPU op pair.

Layout: configurations are LANES. `pack_mc_params` builds the (16, C)
parameter matrix; counts come back as int32 (C,) (int32 accumulator —
float32 would lose integer precision past 2^24 samples per round).

Statistical contract: same noise model as `mc.estimator` (threefry path)
— labels agree statistically, not bitwise (different PRNG). Unlike the
threefry path, streams are tied to (seed, block position), so results
change under repacking; the adaptive driver reseeds every round, which
keeps all samples i.i.d. regardless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collide2d_tpu.mc.estimator import Configs

LANE_CONFIGS = 128  # configurations per grid block (one lane each)
PARAM_ROWS = 16

_TWO_PI = 6.2831853071795865
_INV_2_24 = 1.0 / (1 << 24)


def pack_mc_params(configs: Configs, robot_wh) -> Array:
    """Configs + robot -> (16, C) parameter rows for the kernel.

    Rows: 0 px, 1 py, 2 cos(theta), 3 sin(theta), 4 rw/2, 5 rh/2,
    6 ow/2, 7 oh/2, 8 sigma_x, 9 sigma_y, 10 sigma_theta,
    11 sigma_w/2, 12 sigma_h/2, 13 theta, 14-15 zero padding.
    """
    robot_wh = jnp.broadcast_to(
        jnp.asarray(robot_wh, jnp.float32), configs.position.shape
    )
    c = jnp.cos(configs.pose_theta)
    s = jnp.sin(configs.pose_theta)
    zero = jnp.zeros_like(c)
    rows = [
        configs.position[:, 0],
        configs.position[:, 1],
        c,
        s,
        robot_wh[:, 0] * 0.5,
        robot_wh[:, 1] * 0.5,
        configs.obstacle_wh[:, 0] * 0.5,
        configs.obstacle_wh[:, 1] * 0.5,
        configs.std_dev[:, 0],
        configs.std_dev[:, 1],
        configs.std_dev[:, 2],
        configs.std_dev[:, 3] * 0.5,
        configs.std_dev[:, 4] * 0.5,
        configs.pose_theta,
        zero,
        zero,
    ]
    return jnp.stack(rows, axis=0)


# Test hook: when set, replaces the hardware PRNG as the uniform source
# (pltpu.prng_seed/prng_random_bits have no CPU interpret-mode lowering),
# letting CI check the kernel's OBB math off-TPU bit-for-bit against
# a replay through the same tile functions (tests/test_pallas).
_TEST_UNIFORM_FN = None


def _uniform_bits24(shape):
    """Raw 24-bit uniform codes: int32 in [0, 2^24).

    The single point where randomness enters the kernel — hardware PRNG
    in production, `_TEST_UNIFORM_FN` in interpret-mode CI (the stub's
    (k+1)*2^-24 floats invert exactly: k+1 <= 2^24 is exact in f32).
    """
    if _TEST_UNIFORM_FN is not None:
        return (
            _TEST_UNIFORM_FN(shape) * jnp.float32(1 << 24) - 1.0
        ).astype(jnp.int32)
    bits = pltpu.prng_random_bits(shape)
    # Mosaic has no uint32->f32 cast; shift as int32 (>> 8 of a uint is
    # the same as of its int reinterpretation's logical shift) and the
    # result fits in 24 bits, so the later int32->f32 cast is exact.
    return jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.int32), 8)


def _uniform01(shape):
    """Uniform floats in (0, 1] from 24-bit codes."""
    bits = _uniform_bits24(shape)
    return (bits.astype(jnp.float32) + 1.0) * jnp.float32(_INV_2_24)


def _box_muller(shape):
    """One Box-Muller pair of standard normals (curand_normal's method)."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = jnp.float32(_TWO_PI) * u2
    return r * jnp.cos(a), r * jnp.sin(a)


def _erfinv_pair(shape):
    """One pair of standard normals via inverse-CDF (erf_inv).

    jax.random.normal's own method on 23-BIT codes: z = sqrt(2) *
    erfinv((b + 0.5) / 2^22 - 1) with b in [0, 2^23). 23 bits, not 24,
    because the ±0.5 centering must be EXACT in float32: at 24 bits,
    b + 0.5 rounds (half-to-even) for every b >= 2^23, and the top code
    rounds UP to 2^24 making the erf_inv argument exactly 1.0 — an
    +inf draw whose NaNs would count as collisions (review r3 finding,
    regression-tested). With 23-bit codes every b + 0.5 and the final
    argument ±(1 - 2^-23) are exact, so draws are finite by
    construction: |z| <= erfinv(1-2^-23)*sqrt(2) ≈ 5.33σ — the same
    finite-code tail-truncation class as Box-Muller's 5.77σ. On TPU
    erf_inv lowers to a polynomial block measurably cheaper than
    Box-Muller's log/sqrt/cos/sin (see `bench_mc_pallas`).
    """
    b0 = jax.lax.shift_right_logical(_uniform_bits24(shape), 1)
    b1 = jax.lax.shift_right_logical(_uniform_bits24(shape), 1)
    scale = jnp.float32(1.0 / (1 << 22))
    s2 = jnp.float32(1.4142135623730951)
    z0 = s2 * jax.lax.erf_inv((b0.astype(jnp.float32) + 0.5) * scale - 1.0)
    z1 = s2 * jax.lax.erf_inv((b1.astype(jnp.float32) + 0.5) * scale - 1.0)
    return z0, z1


def _obb_separated(
    px, py, cos_a, sin_a, theta, hx1, hy1, ow_h, oh_h, sx, sy, sth, swh, shh,
    z_dx, z_dy, z_th, z_dw, z_dh,
):
    """Separation mask for one 5-normal draw set (`ops.sat.obb_collide`
    math in relative-angle form — shared by the kernel and the CI replay
    in tests/test_pallas.py, which pins the wiring bit-for-bit).

    Box a is the robot (angle theta, given as cos/sin AND the raw angle);
    box b is the noisy obstacle (angle phi = z_th * sigma_theta). With
    delta = theta - phi and (u, v) = the center offset in the robot
    frame, the obstacle-frame projections are u*cos(delta) -+
    v*sin(delta) — two transcendentals for cos/sin(delta) replace
    cos/sin(phi) plus the two axis-dot products.

    ``z_dw``/``z_dh`` may be None (shape noise disabled — the reference
    default, generate_dataset.cu:285-290 zeroes the w/h sigmas unless
    --shape_variance): the extents are then the loop-invariant |ow_h|,
    |oh_h| and the two fused mul-adds drop out.
    """
    dx = z_dx * sx
    dy = z_dy * sy
    if z_dw is None:
        a = jnp.abs(ow_h)
        b = jnp.abs(oh_h)
    else:
        a = jnp.abs(ow_h + z_dw * swh)
        b = jnp.abs(oh_h + z_dh * shh)
    delta = theta - z_th * sth
    cd_raw = jnp.cos(delta)
    sd_raw = jnp.sin(delta)
    cd = jnp.abs(cd_raw)
    sd = jnp.abs(sd_raw)
    dxv = px - dx
    dyv = py - dy
    u = dxv * cos_a + dyv * sin_a
    v = -dxv * sin_a + dyv * cos_a
    sep = jnp.abs(u) > hx1 + a * cd + b * sd
    sep = jnp.logical_or(sep, jnp.abs(v) > hy1 + a * sd + b * cd)
    sep = jnp.logical_or(
        sep, jnp.abs(u * cd_raw - v * sd_raw) > a + hx1 * cd + hy1 * sd
    )
    sep = jnp.logical_or(
        sep, jnp.abs(u * sd_raw + v * cd_raw) > b + hx1 * sd + hy1 * cd
    )
    return sep


def _mc_kernel(
    seed_ref, n_steps_ref, params_ref, out_ref, *, sub: int,
    shape_noise: bool, normal_method: str = "erfinv",
):
    if _TEST_UNIFORM_FN is None:
        # Two seed words (Mosaic's limit): both halves of the round's
        # folded threefry key give 64-bit round entropy; the grid block
        # id, dispersed by the golden-ratio odd constant (Weyl/Fibonacci
        # hashing), is mixed into the second word for per-block streams.
        # int32 mul wraps.
        block_mix = pl.program_id(0) * jnp.int32(-1640531527)  # 0x9E3779B9
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] ^ block_mix)
    n_steps = n_steps_ref[0, 0]

    p = params_ref[...]  # (16, LANE_CONFIGS)
    row = lambda i: p[i, :][None, :]  # (1, L), broadcasts over sublanes
    args = (
        row(0), row(1),            # px, py
        row(2), row(3), row(13),   # cos_a, sin_a, theta
        row(4), row(5),            # hx1, hy1
        row(6), row(7),            # ow_h, oh_h
        row(8), row(9), row(10),   # sx, sy, sth
        row(11), row(12),          # swh, shh
    )

    shape = (sub // 2, LANE_CONFIGS)
    draw_pair = _box_muller if normal_method == "box_muller" else _erfinv_pair

    def step(_, acc):
        # Five pairs = ten normals = the (dx, dy, theta, dw, dh) noise
        # for exactly TWO samples per tile row — nothing wasted. With
        # shape noise off (the reference default) only THREE pairs are
        # drawn: the normal draws are the kernel's largest op block and
        # the kernel is VPU-issue-bound, so dead draws are pure waste.
        za_dx, zb_dx = draw_pair(shape)
        za_dy, zb_dy = draw_pair(shape)
        za_th, zb_th = draw_pair(shape)
        if shape_noise:
            za_dw, zb_dw = draw_pair(shape)
            za_dh, zb_dh = draw_pair(shape)
        else:
            za_dw = zb_dw = za_dh = zb_dh = None
        sep_a = _obb_separated(*args, za_dx, za_dy, za_th, za_dw, za_dh)
        sep_b = _obb_separated(*args, zb_dx, zb_dy, zb_th, zb_dw, zb_dh)
        # int32 accumulation: float32 would lose integer precision past
        # 2^24 samples/round (the CLI exposes n_batch directly).
        hits = jnp.logical_not(sep_a).astype(jnp.int32) + jnp.logical_not(
            sep_b
        ).astype(jnp.int32)
        return acc + jnp.sum(hits, axis=0, keepdims=True)

    acc = jax.lax.fori_loop(
        0, n_steps, step, jnp.zeros((1, LANE_CONFIGS), jnp.int32)
    )
    out_ref[...] = acc


def _pick_sub(n_batch: int) -> int:
    for sub in (64, 32, 16):
        if n_batch % sub == 0:
            return sub
    raise ValueError(
        f"n_batch={n_batch} must be a multiple of 16 (the kernel's sample "
        "sub-tile: two samples per sublane row, 8-row minimum tile); round "
        "the budget up or use impl='jnp'. The adaptive driver normalizes "
        "this automatically (estimator._plan_round)."
    )


@functools.partial(
    jax.jit,
    static_argnames=("sub", "shape_noise", "interpret", "normal_method"),
)
def mc_counts_pallas(
    seed, params: Array, n_steps, *, sub: int = 16, shape_noise: bool = True,
    interpret: bool = False, normal_method: str = "erfinv",
) -> Array:
    """Collision counts out of ``n_steps * sub`` noise samples per config.

    ``seed``: int32 (2,) vector — two independent seed words, vary per
    round! ``n_steps``: TRACED int32 scalar — one compilation per (C, sub)
    serves the whole adaptive schedule (remote compiles cost minutes).
    ``params``: (16, C) from `pack_mc_params`, C a multiple of 128.
    ``sub``: samples per loop step — even, >= 16 (each step evaluates two
    samples per (sub/2, 128) tile row). ``shape_noise=False`` (all w/h
    sigmas zero — the reference default) draws 3 Box-Muller pairs per
    step instead of 5: measurably faster, identical labels since the
    skipped normals would be multiplied by zero anyway (the streams
    differ, but the paths are only ever statistically comparable).
    Returns int32 (C,) counts.
    """
    c = params.shape[1]
    assert params.shape[0] == PARAM_ROWS, params.shape
    assert c % LANE_CONFIGS == 0, c
    assert sub % 2 == 0 and sub >= 16, sub
    assert normal_method in ("box_muller", "erfinv"), normal_method
    kernel = functools.partial(
        _mc_kernel, sub=sub, shape_noise=shape_noise,
        normal_method=normal_method,
    )
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed.shape[0] == 1:  # tolerate legacy scalar seeds
        seed = jnp.concatenate([seed, jnp.zeros((1,), jnp.int32)])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.int32),
        grid=(c // LANE_CONFIGS,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (PARAM_ROWS, LANE_CONFIGS), lambda i: (0, i), memory_space=pltpu.VMEM
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


def mc_round_pallas(
    key: Array,
    configs: Configs,
    robot_wh,
    round_tag,
    *,
    n_batch: int | None = None,
    n_steps=None,
    sub: int | None = None,
    shape_noise: bool = True,
    interpret: bool = False,
    normal_method: str = "erfinv",
) -> Array:
    """Drop-in round step on the fused kernel: int32 (C,) counts.

    ``round_tag`` must differ across rounds (e.g. the chunk offset) so
    every round draws fresh i.i.d. samples.

    Pass either ``n_batch`` (python int; the sub-tile is chosen
    automatically) or a TRACED ``n_steps`` with a static ``sub``
    (samples per config = n_steps * sub) — the traced form lets ONE
    compilation serve every round size of an adaptive schedule.
    ``shape_noise=False`` skips the two w/h noise draws (see
    `mc_counts_pallas`); only valid when every config's w/h sigma is 0.
    ``normal_method``: 'erfinv' (default — inverse-CDF normals, +21-25%
    measured over Box-Muller on v5e; see `_erfinv_pair`) or
    'box_muller' (curand_normal's method). Both draw exactly N(0,1) up
    to the 24-bit-uniform tail truncation; switching methods changes
    the stream, never the distribution — the kernel's only contract.
    """
    if n_steps is None:
        sub = _pick_sub(n_batch)
        n_steps = n_batch // sub
    c = configs.num
    params = pack_mc_params(configs, robot_wh)
    pad = -(-c // LANE_CONFIGS) * LANE_CONFIGS - c
    if pad:
        params = jnp.concatenate(
            [params, jnp.broadcast_to(params[:, :1], (PARAM_ROWS, pad))], axis=1
        )
    # Both 32-bit halves of the folded key = 64 bits of round entropy
    # (a single int32 seed would birthday-collide across rounds x blocks).
    folded = jax.random.fold_in(key, round_tag)
    seed = jax.lax.bitcast_convert_type(
        jax.random.key_data(folded).reshape(-1)[:2], jnp.int32
    )
    counts = mc_counts_pallas(
        seed, params, n_steps, sub=sub, shape_noise=shape_noise,
        interpret=interpret, normal_method=normal_method,
    )
    return counts[:c].astype(jnp.int32)
