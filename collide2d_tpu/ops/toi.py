"""Time of impact for moving convex shapes — conservative advancement.

Beyond the reference's static queries (utils.cu:159-184 tests one
frozen configuration): planners validating trajectories need the
earliest time two moving shapes touch. For convex shapes under
bounded-velocity motion, conservative advancement (CA) turns the
signed-distance oracle (`ops.distance`) into a continuous-collision
query:

    the distance between the shapes changes at most ``bound`` per unit
    time, where ``bound = |v_rel| + |w1| r1 + |w2| r2`` (relative linear
    speed plus each body's angular speed times its circumradius), so
    from any time t with distance d(t) > 0 the shapes cannot touch
    before t + d(t)/bound.

Iterating ``t <- t + max(d(t), 0)/bound`` is therefore monotone and
never overshoots the true TOI; each step is one batched distance
evaluation, so the whole query is a fixed-length `lax.fori_loop` of
VPU-friendly closed forms — no data-dependent control flow, jittable,
vmappable, shard_map-safe.

Translation is special-cased EXACTLY: under pure relative translation
the per-SAT-axis colliding-time set is a linear window, so the first
contact time is a closed-form interval intersection — no iteration, no
tolerance band (`rect_translation_toi`; `polygon_time_of_impact` is
translation-only and always exact). Conservative advancement remains
the engine for ROTATING motion, with this contract:

Contract (CA entry points):
- returns ``t`` in ``[0, t_max]`` with ``d(t) <= tol`` when an impact
  is found (initially overlapping pairs return exactly 0);
- returns ``+inf`` when the pair provably cannot touch within
  ``t_max`` OR the iteration budget ran out before certifying an
  impact (grazing trajectories converge slowly — raise ``iters`` to
  tighten; every returned finite t is always a certified impact, the
  conservative direction for trajectory validation: a grazing
  trajectory may be reported safe, never a colliding one reported at
  the wrong time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.distance import rect_signed_distance


def _advance(dist_of_t, bound: Array, t_max: float, iters: int, tol: float,
             t0: Array | None = None):
    """Shared CA loop: batched t, frozen per-lane once converged or past
    the horizon.

    ``t0`` (optional, per-lane) warm-starts the advancement at a time
    the CALLER certifies contact-free before (d(t) > tol for all
    t < t0): the loop then spends its ``iters`` budget on [t0, t_max]
    only. With the certificate in hand, the result is at least as
    converged as starting from 0 — every returned finite t remains a
    certified impact (d(t) <= tol is re-checked after the loop)."""
    bound = jnp.maximum(bound, jnp.float32(1e-30))
    t_hor = jnp.float32(t_max)

    def body(_, t):
        d = dist_of_t(t)
        done = (d <= tol) | (t > t_hor)
        return jnp.where(done, t, t + jnp.maximum(d, 0.0) / bound)

    t_init = (jnp.zeros_like(bound) if t0 is None
              else jnp.broadcast_to(jnp.asarray(t0, bound.dtype), bound.shape))
    t = jax.lax.fori_loop(0, iters, body, t_init)
    hit = (dist_of_t(t) <= tol) & (t <= t_hor)
    return jnp.where(hit, t, jnp.float32(jnp.inf))


def _axis_interval(p0, s, r):
    """Per-axis hit window of ``|p0 + t s| <= r``: (lo, hi), branch-free.

    s == 0 degenerates to all-t (|p0| <= r) or empty (encoded as
    (+inf, -inf), which any max/min intersection keeps empty)."""
    zero = s == 0
    inv = 1.0 / jnp.where(zero, 1.0, s)
    t1 = (-r - p0) * inv
    t2 = (r - p0) * inv
    inf = jnp.float32(jnp.inf)
    inside = jnp.abs(p0) <= r
    lo = jnp.where(zero, jnp.where(inside, -inf, inf), jnp.minimum(t1, t2))
    hi = jnp.where(zero, jnp.where(inside, inf, -inf), jnp.maximum(t1, t2))
    return lo, hi


def obb_translation_toi_parts(
    dx, dy, c1, s1, hx1, hy1, c2, s2, hx2, hy2, vx, vy,
):
    """(entry, exit) hit window of two oriented boxes under pure relative
    translation, on elementwise tiles (shared with `ops.mc_toi_pallas`).

    ``(dx, dy)`` = center2 - center1 at t=0; ``(vx, vy)`` = relative
    velocity (of box 2); cos/sin are each box's FIXED angle; ``hxi/hyi``
    are HALF extents. EXACT: under translation the pair collides at time
    t iff the center offset projects inside the summed radius on all 4
    unit SAT axes — these are the edge normals of the pair's Minkowski
    sum, so SAT is exact at every t and each axis condition is linear in
    t. The hit set is the intersection of 4 per-axis windows: no
    iteration, no tolerance band (the CA loop's weakness on grazing
    trajectories), ~60 flops. At v = 0 the window test degenerates
    BITWISE to `sat.obb_collide`'s gap expressions.
    """
    cd = jnp.abs(c1 * c2 + s1 * s2)
    sd = jnp.abs(s1 * c2 - c1 * s2)
    lo, hi = _axis_interval(
        dx * c1 + dy * s1, vx * c1 + vy * s1, hx1 + hx2 * cd + hy2 * sd
    )
    l2, h2 = _axis_interval(
        -dx * s1 + dy * c1, -vx * s1 + vy * c1, hy1 + hx2 * sd + hy2 * cd
    )
    lo, hi = jnp.maximum(lo, l2), jnp.minimum(hi, h2)
    l3, h3 = _axis_interval(
        dx * c2 + dy * s2, vx * c2 + vy * s2, hx2 + hx1 * cd + hy1 * sd
    )
    lo, hi = jnp.maximum(lo, l3), jnp.minimum(hi, h3)
    l4, h4 = _axis_interval(
        -dx * s2 + dy * c2, -vx * s2 + vy * c2, hy2 + hx1 * sd + hy1 * cd
    )
    return jnp.maximum(lo, l4), jnp.minimum(hi, h4)


def rect_translation_toi(
    c1, ext1, th1, c2, ext2, th2, v_rel, *, t_max: float = 1.0,
) -> Array:
    """EXACT earliest impact time of two oriented boxes under pure
    relative TRANSLATION (box 2 moves by ``t * v_rel`` relative to
    box 1). float32 ``B``; t in [0, t_max] or +inf. Unlike the CA
    entry points there is no iteration budget and no tolerance band —
    grazing trajectories resolve exactly (see
    `obb_translation_toi_parts`). Parameters as `sat.obb_collide`."""
    c1 = jnp.asarray(c1, jnp.float32)
    c2 = jnp.asarray(c2, jnp.float32)
    ext1 = jnp.abs(jnp.asarray(ext1, jnp.float32))
    ext2 = jnp.abs(jnp.asarray(ext2, jnp.float32))
    th1 = jnp.asarray(th1, jnp.float32)
    th2 = jnp.asarray(th2, jnp.float32)
    v = jnp.broadcast_to(jnp.asarray(v_rel, jnp.float32), c2.shape)
    co1, si1 = jnp.cos(th1), jnp.sin(th1)
    co2, si2 = jnp.cos(th2), jnp.sin(th2)
    entry, exit_ = obb_translation_toi_parts(
        c2[..., 0] - c1[..., 0], c2[..., 1] - c1[..., 1],
        co1, si1, 0.5 * ext1[..., 0], 0.5 * ext1[..., 1],
        co2, si2, 0.5 * ext2[..., 0], 0.5 * ext2[..., 1],
        v[..., 0], v[..., 1],
    )
    hit = (entry <= exit_) & (entry <= t_max) & (exit_ >= 0)
    return jnp.where(hit, jnp.maximum(entry, 0.0), jnp.float32(jnp.inf))


def rect_time_of_impact(
    c1, ext1, th1, v1, w1,
    c2, ext2, th2, v2, w2,
    *, t_max: float = 1.0, iters: int = 64, tol: float = 1e-4,
) -> Array:
    """Earliest impact time of two moving oriented boxes. float32 ``B``.

    Box i starts at (``ci``, ``thi``) with FULL extents ``exti`` (the
    `sat.obb_collide` parameterization) and moves rigidly: center
    ``ci + t*vi``, angle ``thi + t*wi`` (rotation about its own
    center). ``vi``: ``B+(2,)``; ``wi``: ``B`` (radians/unit time,
    broadcastable).

    Non-rotating lanes (w1 == w2 == 0) resolve through the EXACT
    translation window test (`rect_translation_toi` — true first-contact
    time, no tolerance band); rotating lanes run conservative
    advancement (module contract). All-translation workloads should
    call `rect_translation_toi` directly and skip the CA trace.
    """
    c1 = jnp.asarray(c1, jnp.float32)
    c2 = jnp.asarray(c2, jnp.float32)
    ext1 = jnp.abs(jnp.asarray(ext1, jnp.float32))
    ext2 = jnp.abs(jnp.asarray(ext2, jnp.float32))
    th1 = jnp.asarray(th1, jnp.float32)
    th2 = jnp.asarray(th2, jnp.float32)
    v1 = jnp.broadcast_to(jnp.asarray(v1, jnp.float32), c1.shape)
    v2 = jnp.broadcast_to(jnp.asarray(v2, jnp.float32), c2.shape)
    batch = jnp.broadcast_shapes(c1.shape[:-1], th1.shape)
    w1 = jnp.broadcast_to(jnp.asarray(w1, jnp.float32), batch)
    w2 = jnp.broadcast_to(jnp.asarray(w2, jnp.float32), batch)

    v_rel = v2 - v1
    r1 = 0.5 * jnp.sqrt(jnp.sum(ext1 * ext1, axis=-1))  # circumradius
    r2 = 0.5 * jnp.sqrt(jnp.sum(ext2 * ext2, axis=-1))
    bound = (
        jnp.sqrt(jnp.sum(v_rel * v_rel, axis=-1))
        + jnp.abs(w1) * r1
        + jnp.abs(w2) * r2
    )

    def dist_of_t(t):
        te = t[..., None]
        return rect_signed_distance(
            c1 + te * v1, ext1, th1 + t * w1,
            c2 + te * v2, ext2, th2 + t * w2,
        )

    t_ca = _advance(dist_of_t, bound, t_max, iters, tol)
    t_exact = rect_translation_toi(
        c1, ext1, th1, c2, ext2, th2, v_rel, t_max=t_max
    )
    return jnp.where((w1 == 0) & (w2 == 0), t_exact, t_ca)


def polygon_time_of_impact(
    p1: Array, p2: Array, v_rel,
    *, t_max: float = 1.0, iters: int = 64, tol: float = 1e-4,
    mask1: Array | None = None, mask2: Array | None = None,
) -> Array:
    """EXACT earliest impact time of convex k-gon pairs under relative
    TRANSLATION: shape 2 moves by ``t * v_rel`` relative to shape 1
    (``v_rel``: ``B+(2,)``). float32 ``B``; t in [0, t_max] or +inf.

    Under translation the colliding-time set per SAT axis (the true edge
    normals of both polygons — together the Minkowski-sum normals, so
    SAT is exact at every t) is a linear-inequality window; the hit set
    is their intersection. No iteration, no tolerance band: ``iters``
    and ``tol`` are accepted for backward compatibility with the
    original conservative-advancement implementation and ignored (the
    exact method strictly strengthens the old certified-impact contract
    — every finite t is the true first-contact time, every +inf a proof
    of no contact within the horizon). Same padding contract as
    `sat.sat_polygons` (a zero padded axis never constrains the window).
    """
    del iters, tol  # superseded by the exact window intersection
    from collide2d_tpu.ops.sat import _normalize_padding

    p1 = _normalize_padding(jnp.asarray(p1, jnp.float32), mask1)
    p2 = _normalize_padding(jnp.asarray(p2, jnp.float32), mask2)
    v = jnp.broadcast_to(jnp.asarray(v_rel, jnp.float32), p1.shape[:-2] + (2,))
    entry, exit_ = polygon_translation_toi_parts(p1, p2, v)
    hit = (entry <= exit_) & (entry <= t_max) & (exit_ >= 0)
    return jnp.where(hit, jnp.maximum(entry, 0.0), jnp.float32(jnp.inf))


def polygon_translation_toi_parts(p1: Array, p2: Array, v: Array):
    """(entry, exit) hit window of convex k-gon pairs under pure relative
    translation (shape 2 moves by ``t * v``); shared by
    `polygon_time_of_impact` and the trajectory sampler
    (`mc.moving.counts_chunk_moving_polygons`). Inputs pre-normalized:
    ``p1``/``p2`` ``B + (k, 2)`` float32 CCW (repeat-padded), ``v``
    ``B + (2,)``. EXACT — see `polygon_time_of_impact`.

    Projections are explicit mul+add (`sat._project_all`), NOT einsum:
    at ``v = 0`` every axis window degenerates to
    ``(m2 <= M1) & (m1 <= M2)`` on the SAME separately-rounded
    projections as `sat.sat_polygons`, so a zero-motion trajectory
    sample reproduces the static SAT label bit for bit (the k-gon
    analogue of `obb_translation_toi_parts`' parity contract).
    """
    from collide2d_tpu.ops.geometry import edge_normals
    from collide2d_tpu.ops.sat import _project_all

    axes = jnp.concatenate([edge_normals(p1), edge_normals(p2)], axis=-2)
    proj1 = _project_all(axes, p1)  # (..., A, K1)
    proj2 = _project_all(axes, p2)
    m1, M1 = jnp.min(proj1, -1), jnp.max(proj1, -1)  # (..., A)
    m2, M2 = jnp.min(proj2, -1), jnp.max(proj2, -1)
    s = axes[..., 0] * v[..., None, 0] + axes[..., 1] * v[..., None, 1]
    # overlap on an axis at time t: m2 + t s <= M1  AND  m1 <= M2 + t s
    zero = s == 0
    inv = 1.0 / jnp.where(zero, 1.0, s)
    ta = (M1 - m2) * inv
    tb = (m1 - M2) * inv
    inf = jnp.float32(jnp.inf)
    inside = (m2 <= M1) & (m1 <= M2)  # also the zero padded-axis case
    lo = jnp.where(zero, jnp.where(inside, -inf, inf), jnp.minimum(ta, tb))
    hi = jnp.where(zero, jnp.where(inside, inf, -inf), jnp.maximum(ta, tb))
    return jnp.max(lo, axis=-1), jnp.min(hi, axis=-1)
