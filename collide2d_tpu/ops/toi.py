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

Contract (both entry points):
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

from collide2d_tpu.ops.distance import (
    polygon_signed_distance,
    rect_signed_distance,
)


def _advance(dist_of_t, bound: Array, t_max: float, iters: int, tol: float):
    """Shared CA loop: batched t, frozen per-lane once converged or past
    the horizon."""
    bound = jnp.maximum(bound, jnp.float32(1e-30))
    t_hor = jnp.float32(t_max)

    def body(_, t):
        d = dist_of_t(t)
        done = (d <= tol) | (t > t_hor)
        return jnp.where(done, t, t + jnp.maximum(d, 0.0) / bound)

    t = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(bound))
    hit = (dist_of_t(t) <= tol) & (t <= t_hor)
    return jnp.where(hit, t, jnp.float32(jnp.inf))


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
    broadcastable). Returns the CA time (see module contract).
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

    return _advance(dist_of_t, bound, t_max, iters, tol)


def polygon_time_of_impact(
    p1: Array, p2: Array, v_rel,
    *, t_max: float = 1.0, iters: int = 64, tol: float = 1e-4,
    mask1: Array | None = None, mask2: Array | None = None,
) -> Array:
    """Earliest impact time of convex k-gon pairs under relative
    TRANSLATION: shape 2 moves by ``t * v_rel`` relative to shape 1
    (``v_rel``: ``B+(2,)``). float32 ``B``; same contract as
    `rect_time_of_impact` (here the CA bound ``|v_rel|`` is exact, and
    d(t) is convex in t, so convergence is monotone from below). Same
    padding contract as `sat.sat_polygons`.
    """
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    v = jnp.broadcast_to(jnp.asarray(v_rel, jnp.float32), p1.shape[:-2] + (2,))
    bound = jnp.sqrt(jnp.sum(v * v, axis=-1))

    def dist_of_t(t):
        shift = t[..., None, None] * v[..., None, :]
        return polygon_signed_distance(p1, p2 + shift, mask1, mask2)

    return _advance(dist_of_t, bound, t_max, iters, tol)
