"""Pallas TPU kernel: scene raycast, fused (the lidar workload).

`ops.raycast.scene_raycast` broadcasts `polygon_raycast` to an
(R rays, N shapes) grid and argmins over shapes — XLA materializes the
(R, N, k) face-window intermediates in HBM, so at scene sizes the query
is bandwidth-bound on tensors k*N times larger than its 16-byte/ray
input. This kernel keeps the WHOLE scene resident: the per-face
half-plane tables (unit normal + offset, N*k*12 bytes total) are
VMEM-resident across every grid step, rays stream through (8,128) lane
tiles, and the face loop / shape argmin never touch HBM. Per ray it
reads 16 bytes and writes 20 (t, hit index, unit entry normal).

Layout: shapes ride the SUBLANE axis, rays the LANE axis — every face
update is one (N, block) VPU op, there are exactly k of them, and the
scene argmin is a sublane-axis min+first-index reduction (iota/one-hot,
branch-free). No scalar loads, no loops over shapes.

Semantics match `ops.raycast.scene_raycast` (same window math,
first-wins ties on both the entry face and the shape argmin; see
`ops/raycast.py` for the conventions — t=+inf miss, t=0 + zero normal
for inside-starts, repeat-last/mask padding, degenerate shapes never
hit). Face normals are pre-normalized into the table — the entry/exit
ratios are scale-invariant, so results differ from the XLA path only by
f32 rounding (tested: hit/idx agreement away from razor ties + 1e-5
tolerance on t and normals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collide2d_tpu.ops.geometry import edge_normals
from collide2d_tpu.ops.sat import _normalize_padding

# Rays per grid step. (N, block) f32 intermediates live in VMEM (~10 of
# them), so the wrapper shrinks the block when the scene is large enough
# that N * block would not fit comfortably.
LANE_BLOCK = 512
_VMEM_LANE_BUDGET = 1 << 16  # N * block ceiling (~2.6 MB of live f32)


def _make_raycast_kernel(k: int, t_max: float):
    def kernel(ray_ref, nx_ref, ny_ref, off_ref, anyf_ref, outf_ref,
               outi_ref):
        inf = jnp.float32(jnp.inf)
        n_shapes = nx_ref.shape[0]
        ox = ray_ref[0:1, :]  # (1, block)
        oy = ray_ref[1:2, :]
        dx = ray_ref[2:3, :]
        dy = ray_ref[3:4, :]

        shape2 = (n_shapes, ox.shape[1])
        entry = jnp.full(shape2, -inf, jnp.float32)
        exit_ = jnp.full(shape2, inf, jnp.float32)
        bnx = jnp.zeros(shape2, jnp.float32)
        bny = jnp.zeros(shape2, jnp.float32)
        for j in range(k):
            nx = nx_ref[:, j : j + 1]  # (N, 1), unit (or zero) normals
            ny = ny_ref[:, j : j + 1]
            off = off_ref[:, j : j + 1]
            no = nx * ox + ny * oy  # (N, block)
            nd = nx * dx + ny * dy
            num = off - no  # constraint: t * nd <= num
            ratio = num / jnp.where(nd == 0, 1.0, nd)
            pm = (nd == 0) & (num < 0)  # parallel face, origin outside
            lo = jnp.where(nd < 0, ratio, jnp.where(pm, inf, -inf))
            hi = jnp.where(nd > 0, ratio, jnp.where(pm, -inf, inf))
            upd = lo > entry  # strict: first max wins, like argmax
            entry = jnp.where(upd, lo, entry)
            bnx = jnp.where(upd, jnp.broadcast_to(nx, shape2), bnx)
            bny = jnp.where(upd, jnp.broadcast_to(ny, shape2), bny)
            exit_ = jnp.minimum(exit_, hi)

        anyf = anyf_ref[:, 0:1] > 0
        hit = (entry <= exit_) & (entry <= t_max) & (exit_ >= 0) & anyf
        inside = hit & (entry < 0)
        t_all = jnp.where(hit, jnp.maximum(entry, 0.0), inf)
        keep_n = hit & jnp.logical_not(inside)
        bnx = jnp.where(keep_n, bnx, 0.0)
        bny = jnp.where(keep_n, bny, 0.0)

        # Shape argmin, first occurrence (ties + the all-inf miss lane
        # both resolve to the smallest index, matching jnp.argmin).
        best_t = jnp.min(t_all, axis=0, keepdims=True)  # (1, block)
        ids = lax.broadcasted_iota(jnp.int32, shape2, 0)
        at_min = t_all == best_t
        idx = jnp.min(
            jnp.where(at_min, ids, jnp.int32(n_shapes)), axis=0,
            keepdims=True,
        )
        sel = (ids == idx).astype(jnp.float32)
        outf_ref[0:1, :] = best_t
        outf_ref[1:2, :] = jnp.sum(bnx * sel, axis=0, keepdims=True)
        outf_ref[2:3, :] = jnp.sum(bny * sel, axis=0, keepdims=True)
        outi_ref[0:1, :] = idx

    return kernel


@functools.partial(
    jax.jit, static_argnames=("t_max", "block", "interpret")
)
def _scene_raycast_pallas_packed(
    rays: Array, nx: Array, ny: Array, off: Array, anyf: Array,
    *, t_max: float, block: int, interpret: bool,
) -> tuple[Array, Array]:
    r = rays.shape[1]
    assert r % block == 0, (r, block)
    npad, k = nx.shape
    tab = lambda c: pl.BlockSpec(  # noqa: E731 — scene tables, step-invariant
        (npad, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    outf, outi = pl.pallas_call(
        _make_raycast_kernel(k, float(t_max)),
        out_shape=[
            jax.ShapeDtypeStruct((3, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        grid=(r // block,),
        in_specs=[
            pl.BlockSpec((4, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            tab(k), tab(k), tab(k), tab(1),
        ],
        out_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * npad * k * r,
            bytes_accessed=(16 + 20) * r + 12 * npad * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rays, nx, ny, off, anyf)
    return outf, outi


def scene_raycast_pallas(
    origin: Array,
    direction: Array,
    polys: Array,
    mask: Array | None = None,
    *,
    t_max: float = jnp.inf,
    block: int = LANE_BLOCK,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Drop-in for `ops.raycast.scene_raycast` on 1-D ray batches:
    ``origin``/``direction`` (R, 2), ``polys`` (N, k, 2) [+ optional
    (N, k) ``mask``] -> ``(t (R,), index (R,) int32, normal (R, 2))``.

    Any R and N are accepted (padded internally to the lane block /
    sublane multiple); padding shapes are degenerate and can never win
    the argmin. ``t`` is in units of |direction|, +inf = no hit.
    """
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    p = _normalize_padding(jnp.asarray(polys, jnp.float32), mask)
    assert p.ndim == 3 and origin.ndim == 2, (p.shape, origin.shape)
    n_shapes, k = p.shape[0], p.shape[1]
    r = origin.shape[0]

    # Unit-normal face tables: ratios are scale-invariant, and the entry
    # normal comes out of the table already unit (zero-length faces keep
    # a zero normal => 0 <= 0, trivially satisfied, never clips).
    nrm = edge_normals(p)  # (N, k, 2), outward, unnormalized
    ln = jnp.sqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True))
    un = nrm / jnp.where(ln > 0, ln, 1.0)
    off = jnp.sum(un * p, axis=-1)  # (N, k)
    anyf = jnp.any(ln[..., 0] > 0, axis=-1, keepdims=True)  # (N, 1)

    npad = -(-n_shapes // 8) * 8
    while block > 128 and npad * block > _VMEM_LANE_BUDGET:
        block //= 2
    rpad = -(-r // block) * block
    if npad != n_shapes:
        zpad = ((0, npad - n_shapes), (0, 0))
        un = jnp.pad(un, zpad + ((0, 0),))
        off = jnp.pad(off, zpad[:1] + ((0, 0),))
        anyf = jnp.pad(anyf, zpad)
    rays = jnp.stack(
        [origin[:, 0], origin[:, 1], direction[:, 0], direction[:, 1]],
        axis=0,
    )
    if rpad != r:
        rays = jnp.pad(rays, ((0, 0), (0, rpad - r)))

    outf, outi = _scene_raycast_pallas_packed(
        rays, un[..., 0], un[..., 1], off, anyf.astype(jnp.float32),
        t_max=float(t_max), block=block, interpret=interpret,
    )
    t = outf[0, :r]
    normal = jnp.stack([outf[1, :r], outf[2, :r]], axis=-1)
    return t, outi[0, :r], normal
