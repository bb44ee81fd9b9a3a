"""Pallas TPU kernel: fused stage-A screen for ROTATING rect trajectories.

The jnp rotating cascade (`mc.moving._screened_rotating_hits`) spends
~2.6 ms of its 7.6 ms step (round-5 decomposition) on the stage-A
screen + obstacle assembly: XLA materializes the six derived obstacle
arrays and ~30 (C, S) screen intermediates through HBM. This kernel
fuses the whole per-lane front half in VMEM — noise scaling, obstacle
assembly (trig included), the exact t=0 SAT, the exact translation
window, and the 8-segment paired inflated/eroded screen — reading ONLY
the raw threefry draws z (C, S, 5) plus 16 per-config scalars, and
writing a 3-bit verdict mask + the certified warm-start bound
(~24 bytes/lane in, ~8 out, vs the jnp graph's hundreds).

The math is NOT duplicated: the kernel body calls the exact tile
functions the jnp path uses (`mc.moving._paired_segment_screen`,
`ops.toi.obb_translation_toi_parts`, the same hit0 expressions), so the
two paths can only diverge by backend transcendental rounding (cos/sin
of the pose draw), never by formula — interpret-mode agreement with the
jnp screen is BITWISE (tests/test_pallas.py). Keeping the threefry
draws in XLA preserves the jnp cascade's uid-keyed stream contract;
the kernel is a pure function of (z, params) with no grid-position
dependence, so counts remain reproducible under compaction and
sharding.

MEASURED, and the avenue is REFUTED (round 5, on-chip, 8192x512-lane
step, fresh processes — the experiment review r4 #1 asked for):

- this kernel in isolation: 1.57-1.77 ms per step (block 64..16) vs
  the XLA screen's ~2.6 — the screen is closer to compute-bound than
  the "bandwidth-bound" estimate assumed (8 segments x 4 paired axis
  tests + 2 per-lane transcendentals ~ 1.5 GFLOP + 8.4M
  transcendentals per step);
- threefry draws 0.67 ms, the z transpose free (0.01 ms);
- END TO END the fused-screen cascade measures 7.6 ms vs the jnp
  screen's 7.2 (0.95x): the ~1 ms screen saving is offset by the
  advancement stage rebuilding gathered obstacle arrays from z and by
  the flags/t0 round trip.

The deeper blocker for the 1.5e9 ask: even a FREE screen + draws
leaves the advancement's ~4.6 ms (on the ~22% of rows holding
ambiguity; every finer granularity refuted by measurement —
mc/moving.py), a ~9e8 ceiling; and the CA loop's own in-kernel form
measures WORSE, not better (ops/mc_toi_pallas.py: CA-48 in-kernel runs
28 ms per 4.2M lanes vs XLA's 16.2 — transcendental-bound). The
kernel stays in-tree as the measured exploration (interpret-mode
BITWISE vs the jnp screen, tests/test_pallas.py), reachable via
``counts_chunk_moving(screen_impl='pallas')``; the jnp cascade remains
the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PARAMS = 16
# Configs per grid step. The screen's broadcast graph holds ~20 live
# (BC, n_seg, S) f32 temporaries in scoped VMEM: BC = 128 blows the
# 16 MB scoped limit (44 MB requested); BC = 64 compiles and measured
# fastest (1.57 ms/step vs 1.77 at BC = 16). Params ride config-major
# (C, 16) so the block's last dim equals the full array dim — legal at
# any 8-multiple config block.
CONFIG_BLOCK = 64


def pack_screen_params(configs, robot_wh: Array) -> Array:
    """MovingConfigs -> (C, 16) f32 kernel rows (config-major: the
    16-wide param dim rides the LANE axis and the block's last dim
    equals the full array dim, which Mosaic accepts at any config
    block size).

    Rows: sd0..sd4, wh_x, wh_y, px, py, v_eff_x, v_eff_y, th0, w_eff,
    hx1, hy1, r_rob — the per-config scalars of
    `mc.moving.counts_chunk_moving`'s assembly, horizon pre-folded
    (v*t_max, w*t_max) exactly as the jnp path does."""
    rw = jnp.broadcast_to(
        jnp.asarray(robot_wh, jnp.float32), configs.position.shape
    )
    v_eff = configs.velocity * configs.t_max[:, None]
    w_eff = configs.omega * configs.t_max
    return jnp.stack([
        configs.std_dev[:, 0], configs.std_dev[:, 1],
        configs.std_dev[:, 2], configs.std_dev[:, 3],
        configs.std_dev[:, 4],
        configs.obstacle_wh[:, 0], configs.obstacle_wh[:, 1],
        configs.position[:, 0], configs.position[:, 1],
        v_eff[:, 0], v_eff[:, 1],
        configs.pose_theta, w_eff,
        jnp.abs(rw[:, 0]) * 0.5, jnp.abs(rw[:, 1]) * 0.5,
        0.5 * jnp.hypot(rw[:, 0], rw[:, 1]),
    ], axis=-1).astype(jnp.float32)


def _screen_kernel(params_ref, z_ref, flags_ref, t0_ref, *, n_seg, tol):
    from collide2d_tpu.mc.moving import _paired_segment_screen
    from collide2d_tpu.ops.toi import obb_translation_toi_parts

    p = params_ref[...]                  # (BC, 16)
    z = z_ref[...]                       # (5, BC, S)
    col = lambda i: p[:, i][:, None]     # (BC, 1)

    ox = z[0] * col(0)
    oy = z[1] * col(1)
    d2 = z[2] * col(2)
    c2, s2 = jnp.cos(d2), jnp.sin(d2)
    hx2 = jnp.abs(col(5) + z[3] * col(3)) * 0.5
    hy2 = jnp.abs(col(6) + z[4] * col(4)) * 0.5
    px, py = col(7), col(8)
    vx, vy = col(9), col(10)
    th0, w = col(11), col(12)
    hx1, hy1 = col(13), col(14)
    r_rob = col(15)

    # Exact t=0 SAT (the cascade's certified overlap test — identical
    # expressions to counts_chunk_moving's hit_at_0).
    c1, s1 = jnp.cos(th0), jnp.sin(th0)
    cd0 = jnp.abs(c1 * c2 + s1 * s2)
    sd0 = jnp.abs(s1 * c2 - c1 * s2)
    dx0, dy0 = ox - px, oy - py
    hit_at_0 = (
        (jnp.abs(dx0 * c1 + dy0 * s1) <= hx1 + hx2 * cd0 + hy2 * sd0)
        & (jnp.abs(-dx0 * s1 + dy0 * c1) <= hy1 + hx2 * sd0 + hy2 * cd0)
        & (jnp.abs(dx0 * c2 + dy0 * s2) <= hx2 + hx1 * cd0 + hy1 * sd0)
        & (jnp.abs(-dx0 * s2 + dy0 * c2) <= hy2 + hx1 * sd0 + hy1 * cd0)
    )

    # Exact translation window (non-rotating lanes' verdict).
    entry, exit_ = obb_translation_toi_parts(
        dx0, dy0, c1, s1, hx1, hy1, c2, s2, hx2, hy2, -vx, -vy
    )
    hit_exact = (entry <= exit_) & (entry <= 1.0) & (exit_ >= 0)

    # 8-segment paired inflated/eroded screen — the SAME tile function
    # the jnp cascade runs.
    maybe, hit_cert, t_first = _paired_segment_screen(
        ox, oy, c2, s2, hx2, hy2, px, py, vx, vy, th0, w,
        hx1, hy1, r_rob, tol, n_seg,
    )
    hit_a = hit_cert | hit_at_0

    flags_ref[...] = (
        maybe.astype(jnp.int32)
        | (hit_a.astype(jnp.int32) << 1)
        | (hit_exact.astype(jnp.int32) << 2)
    )
    t0_ref[...] = jnp.clip(
        jnp.where(jnp.isfinite(t_first), t_first, 2.0), 0.0, 2.0
    )


@functools.partial(
    jax.jit, static_argnames=("n_seg", "tol", "block", "interpret")
)
def rotating_screen_pallas(
    zt: Array, params: Array, *, n_seg: int = 8, tol: float = 1e-4,
    block: int = CONFIG_BLOCK, interpret: bool = False,
):
    """Fused stage-A screen: (5, C, S) draws + (C, 16) params ->
    (flags (C, S) int32, t0 (C, S) f32).

    flags bit 0 = maybe (union of possibly-colliding segments), bit 1 =
    certified hit (eroded/overlap proof), bit 2 = exact translation
    window verdict; t0 = certified no-contact-before warm-start bound
    (2.0 where no segment may collide), exactly the jnp cascade's
    `t0_full`."""
    _, c, s = zt.shape
    assert params.shape == (c, N_PARAMS), (params.shape, c)
    block = min(block, c)
    assert c % block == 0, (c, block)
    kernel = functools.partial(_screen_kernel, n_seg=n_seg, tol=tol)
    flags, t0 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((c, s), jnp.int32),
            jax.ShapeDtypeStruct((c, s), jnp.float32),
        ),
        grid=(c // block,),
        in_specs=[
            pl.BlockSpec((block, N_PARAMS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, block, s), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=400 * c * s,
            bytes_accessed=(5 * 4 + 8) * c * s,
            transcendentals=4 * c * s,
        ),
        interpret=interpret,
    )(params, zt)
    return flags, t0
