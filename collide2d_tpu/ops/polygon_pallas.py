"""Pallas TPU kernel: batched convex k-gon SAT (true edge normals).

The general-shape narrow phase of BASELINE.json config #4, as a
fixed-shape kernel: polygons are padded to a static K by
REPEATING their last real vertex — a convention that makes vertex masks
unnecessary inside the kernel:

- a padded slot duplicates a real vertex, so it never changes a
  projection interval's min/max;
- the edge between duplicates is the zero vector, so its normal is the
  zero axis, whose projections are identically zero on both polygons —
  intervals [0,0] vs [0,0] overlap, so a zero axis can never separate.

Axes are TRUE perpendicular edge normals (the correct general-polygon
axis set — the reference's edge-direction quirk, utils.cu:170-171, is
rectangle-only; see ops.sat). Labels match `ops.sat.sat_polygons` with
the same padding, bit for bit (same separately-rounded mul+add
projections, strict `<` separation).

Layout mirrors ops.sat_pallas: a K-gon batch is (2K, 8, N/8) float32,
rows [x0..x_{K-1}, y0..y_{K-1}], pair p at (s, l) = (p // (N/8), p % (N/8)).

Practical K range: the framework's production surfaces use k <= 8, but
the kernels here (and the distance/manifold siblings built on this
layout) are generically unrolled — k = 12/16 are pinned correct against
the XLA paths (tests/test_manifold.py::test_fused_kernels_beyond_k8).
Trace size and flops grow O(K^2); very large K wants the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 512  # lanes per grid step = 8 * 512 pairs per block


def pad_polygons(p: Array, k: int) -> Array:
    """(N, k0, 2) -> (N, k, 2) by repeating the last vertex (k0 <= k)."""
    n, k0, _ = p.shape
    if k0 > k:
        raise ValueError(f"polygon has {k0} vertices > K={k}")
    if k0 == k:
        return p
    return jnp.concatenate(
        [p, jnp.broadcast_to(p[:, k0 - 1 : k0], (n, k - k0, 2))], axis=1
    )


def pack_polygons(p: Array) -> Array:
    """(N, K, 2) vertex batch -> (2K, 8, N/8) SoA layout (N % 8 == 0)."""
    n, k, _ = p.shape
    assert n % 8 == 0, n
    # rows: x0..x_{K-1}, then y0..y_{K-1}
    coords = jnp.concatenate([p[..., 0], p[..., 1]], axis=1).T  # (2K, N)
    return coords.reshape(2 * k, 8, n // 8)


def _polygon_sat_body(v1: Array, v2: Array, k1: int, k2: int):
    x1 = [v1[i] for i in range(k1)]
    y1 = [v1[k1 + i] for i in range(k1)]
    x2 = [v2[i] for i in range(k2)]
    y2 = [v2[k2 + i] for i in range(k2)]

    def interval(ax, ay, xs, ys):
        mn = mx = ax * xs[0] + ay * ys[0]
        for x, y in zip(xs[1:], ys[1:]):
            p = ax * x + ay * y
            mn = jnp.minimum(mn, p)
            mx = jnp.maximum(mx, p)
        return mn, mx

    separated = None
    for xs, ys, k in ((x1, y1, k1), (x2, y2, k2)):
        for i in range(k):
            j = (i + 1) % k
            # true perpendicular normal of edge i -> j: (ey, -ex)
            ax = ys[j] - ys[i]
            ay = xs[i] - xs[j]
            mn1, mx1 = interval(ax, ay, x1, y1)
            mn2, mx2 = interval(ax, ay, x2, y2)
            sep = jnp.logical_or(mx1 < mn2, mx2 < mn1)
            separated = sep if separated is None else jnp.logical_or(separated, sep)
    return jnp.logical_not(separated)


def _make_kernel(k1: int, k2: int):
    def kernel(p1_ref, p2_ref, out_ref):
        # Upcast on load (exactly like sat_pallas._sat_body): bf16 SoA
        # input halves HBM traffic; the axis/interval arithmetic always
        # runs in float32.
        out_ref[...] = _polygon_sat_body(
            p1_ref[...].astype(jnp.float32),
            p2_ref[...].astype(jnp.float32),
            k1, k2,
        ).astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("k1", "k2", "block", "interpret"))
def sat_polygons_pallas_t(
    p1t: Array,
    p2t: Array,
    *,
    k1: int,
    k2: int,
    block: int = LANE_BLOCK,
    interpret: bool = False,
) -> Array:
    """SAT over SoA k-gon pairs: (2K1, 8, M) x (2K2, 8, M) -> f32 (8*M,)."""
    m = p1t.shape[2]
    assert m % block == 0, (m, block)
    out = pl.pallas_call(
        _make_kernel(k1, k2),
        out_shape=jax.ShapeDtypeStruct((8, m), jnp.float32),
        grid=(m // block,),
        in_specs=[
            pl.BlockSpec(
                (2 * k1, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2 * k2, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=(k1 + k2) * (k1 + k2) * 3 * 8 * m,
            bytes_accessed=(k1 + k2) * 8 * 8 * m + 4 * 8 * m,
            transcendentals=0,
        ),
        interpret=interpret,
    )(p1t, p2t)
    return out.reshape(-1)


def pack_polygons_bf16(p: Array) -> Array:
    """(N, K, 2) float32 -> (2K, 8, N/8) bfloat16 SoA (see pack_polygons).

    Opt-in half-bandwidth input for `sat_polygons_pallas_t`: the kernel
    upcasts tiles to float32 on load, so only the COORDINATES are rounded
    to bf16 (8 mantissa bits, ~0.4% relative). Labels can differ from the
    f32 path for near-touching pairs within that rounding; use for coarse
    labeling, never for bit-parity work — the same contract as
    `sat_pallas.pack_rects_bf16`.
    """
    return pack_polygons(p).astype(jnp.bfloat16)


def sat_polygons_pallas(
    p1: Array,
    p2: Array,
    *,
    block: int = LANE_BLOCK,
    interpret: bool = False,
    precision: str = "f32",
) -> Array:
    """Drop-in for `ops.sat.sat_polygons` on repeat-padded (N, K, 2)
    inputs (no masks needed — see module docstring): int32 (N,).
    ``precision='bf16'`` rounds coordinates to bfloat16 before the kernel
    (half the HBM traffic; see pack_polygons_bf16 for the contract)."""
    n, k1 = p1.shape[0], p1.shape[1]
    k2 = p2.shape[1]
    align = 8 * block
    padded = -(-n // align) * align
    if padded != n:
        # pad pairs with copies of the last pair (labels sliced away)
        reps1 = jnp.broadcast_to(p1[-1:], (padded - n, k1, 2))
        reps2 = jnp.broadcast_to(p2[-1:], (padded - n, k2, 2))
        p1 = jnp.concatenate([p1, reps1], axis=0)
        p2 = jnp.concatenate([p2, reps2], axis=0)
    pack = pack_polygons_bf16 if precision == "bf16" else pack_polygons
    out = sat_polygons_pallas_t(
        pack(p1), pack(p2), k1=k1, k2=k2,
        block=block, interpret=interpret,
    )
    return out[:n].astype(jnp.int32)
