"""N-body scene queries — all colliding pairs among N convex shapes.

The reference (and this framework's core) tests PAIRED batches: row i of
body 1 against row i of body 2 (`generate_dataset.cu:238-242` — one
thread per configuration). A scene query answers the other question a
collision engine gets asked: given ONE set of N shapes, which pairs
collide?

TPU-native shape of the answer (`ops/broad_phase.py`'s measured reality
check applies even more strongly at N^2 scale: element-level compaction
costs an order of magnitude more than the ~1e2-flop/pair narrow phase it
would skip, so dense masked execution wins):

- `scene_collision_matrix` — the full (N, N) boolean matrix, computed in
  row tiles under `lax.map` so peak memory stays O(tile * N * k^2)
  instead of O(N^2 * k^2). Every tile is a plain batched `sat_polygons`
  broadcast: the MXU/VPU stream at full occupancy, no data-dependent
  control flow, jit/shard-safe (shard the row axis across chips; each
  shard needs only its row block plus the replicated vertex table).
- `scene_colliding_pairs` — the fixed-capacity (i, j) pair list: the
  TPU-shaped form of a dynamic contact list (static ``capacity`` slots
  + a count + an overflow flag instead of a variable-length vector).
  Streams row tiles through a `lax.scan` WITHOUT materializing the
  matrix, so it scales to scenes where (N, N) booleans would not fit.
- `scene_colliding_pairs_swept` — sweep-and-prune: sort by AABB x-min,
  test each shape against a STATIC window of sorted successors. The
  narrow phase drops from O(N^2) to O(N * window) with an exactness
  certificate (``window_exceeded``) proving nothing was missed — the
  right tool for spatially sparse scenes.

Padding follows `sat.sat_polygons` (repeat-last or per-shape ``mask``);
shapes of different vertex counts share one table by padding to a
common k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.sat import _normalize_padding, sat_polygons


def _row_tiled_matrix(polys: Array, row_tile: int) -> Array:
    """(N, k, 2) -> (N, N) int32 SAT labels, tiled over row blocks."""
    n = polys.shape[0]
    pad = (-n) % row_tile
    rows = polys
    if pad:
        rows = jnp.concatenate(
            [polys, jnp.broadcast_to(polys[-1:], (pad,) + polys.shape[1:])],
            axis=0,
        )
    tiles = rows.reshape(-1, row_tile, *polys.shape[1:])

    def one_tile(tile):
        # (T, 1, k, 2) vs (1, N, k, 2): batched SAT over the full row
        # block — dense masked execution, the measured TPU optimum.
        return sat_polygons(tile[:, None], polys[None])

    out = jax.lax.map(one_tile, tiles).reshape(-1, n)[:n]
    return out


def scene_collision_matrix(
    polys: Array,
    mask: Array | None = None,
    *,
    row_tile: int = 64,
) -> Array:
    """All-pairs collision matrix of one set of convex shapes.

    ``polys``: ``(N, k, 2)`` CCW convex vertices (repeat-last padded, or
    pass ``mask``: ``(N, k)`` bool). Returns bool ``(N, N)``, symmetric,
    diagonal False (a shape does not collide with itself), entry (i, j)
    True iff shapes i and j overlap (touching counts, the narrow phase's
    convention — utils.cu:178 strict <).

    ``row_tile`` bounds peak memory at O(row_tile * N * k^2) without
    changing results; any value >= 1 works, powers of two tile best.
    """
    polys = _normalize_padding(jnp.asarray(polys, jnp.float32), mask)
    n = polys.shape[0]
    hit = _row_tiled_matrix(polys, min(row_tile, n))
    eye = jnp.eye(n, dtype=bool)
    return (hit == 1) & ~eye


@functools.partial(jax.jit, static_argnames=("capacity", "row_tile"))
def scene_colliding_pairs(
    polys: Array,
    mask: Array | None = None,
    *,
    capacity: int,
    row_tile: int = 64,
) -> tuple[Array, Array, Array]:
    """Fixed-capacity list of colliding index pairs in one shape set.

    Returns ``(pairs, count, overflow)``: ``pairs`` int32 ``(capacity,
    2)`` with each row ``(i, j)``, ``i < j``, in row-major order; rows
    past ``count`` are zero-filled. ``count`` int32 = total colliding
    pairs found, clamped to ``capacity`` in ``pairs``; ``overflow`` bool
    = True when the true count exceeds ``capacity`` (the returned list
    is then the first ``capacity`` pairs in row-major order — re-call
    with a larger capacity for the rest).

    Jittable end to end (``capacity`` is a static shape), no host sync,
    and the (N, N) matrix is never materialized: row tiles stream
    through a `lax.scan` whose carry is the pair buffer, so peak memory
    is O(row_tile * N) — 10^5-shape scenes fit where the dense matrix
    would need gigabytes. Extraction costs O(n_tiles * capacity)
    scatter work on top of the O(N^2) narrow phase; very large
    ``capacity`` with tiny ``row_tile`` shifts the balance — raise
    ``row_tile`` if extraction ever dominates.
    """
    # Streaming extraction: one row tile at a time, pairs accumulated
    # into the fixed-capacity buffer inside a lax.scan carry — the
    # (N, N) matrix is NEVER materialized, so the memory wall moves from
    # O(N^2) to O(row_tile * N) and N = 10^5-scale scenes fit on-chip.
    polys = _normalize_padding(jnp.asarray(polys, jnp.float32), mask)
    n = polys.shape[0]
    tile = min(row_tile, n)
    pad = (-n) % tile
    rows = polys
    if pad:
        rows = jnp.concatenate(
            [polys, jnp.broadcast_to(polys[-1:], (pad,) + polys.shape[1:])],
            axis=0,
        )
    tiles = rows.reshape(-1, tile, *polys.shape[1:])
    n_tiles = tiles.shape[0]
    col = jnp.arange(n, dtype=jnp.int32)
    slot = jnp.arange(capacity, dtype=jnp.int32)

    def body(carry, inp):
        buf, cnt = carry
        t_idx, block = inp
        row = t_idx * tile + jnp.arange(tile, dtype=jnp.int32)
        hit = sat_polygons(block[:, None], polys[None]) == 1  # (tile, N)
        upper = hit & (row[:, None] < col[None, :]) & (row[:, None] < n)
        flat = upper.reshape(-1)
        t_total = jnp.sum(flat, dtype=jnp.int32)
        # First `capacity` hits of this tile in row-major order — enough
        # to preserve the global first-`capacity` prefix (a tile that
        # truncates here necessarily overflows the whole query).
        idx = jnp.flatnonzero(flat, size=capacity, fill_value=0)
        pi = row[0] + (idx // n).astype(jnp.int32)
        pj = (idx % n).astype(jnp.int32)
        dst = jnp.where(slot < t_total, cnt + slot, capacity)  # drop o.o.b.
        buf = buf.at[dst].set(
            jnp.stack([pi, pj], axis=-1), mode="drop"
        )
        return (buf, cnt + t_total), None

    buf0 = jnp.zeros((capacity, 2), jnp.int32)
    (pairs, total), _ = jax.lax.scan(
        body, (buf0, jnp.int32(0)),
        (jnp.arange(n_tiles, dtype=jnp.int32), tiles),
    )
    # Rows past the final count keep whatever a dropped write left —
    # zero them to honor the zero-fill contract.
    valid = slot < total
    pairs = jnp.where(valid[:, None], pairs, 0)
    return pairs, jnp.minimum(total, capacity), total > capacity


@functools.partial(
    jax.jit, static_argnames=("capacity", "window")
)
def scene_colliding_pairs_swept(
    polys: Array,
    mask: Array | None = None,
    *,
    capacity: int,
    window: int = 64,
) -> tuple[Array, Array, Array, Array]:
    """Sweep-and-prune colliding pairs: O(N * window) narrow phase.

    `scene_colliding_pairs` runs the SAT on all N^2/2 pairs — exact and
    dense, but quadratic. This variant sorts shapes by their AABB x-min
    (one O(N log N) argsort) and tests each shape only against its next
    ``window`` successors in sorted order, the TPU-shaped form of sweep
    and prune: the candidate set has a STATIC (N, window) shape, so the
    whole query stays one fixed-shape jit program — no compaction, no
    data-dependent control flow — while the narrow phase drops from
    O(N^2 k^2) to O(N window k^2).

    Returns ``(pairs, count, overflow, window_exceeded)``. The first
    three match `scene_colliding_pairs` (``pairs`` sorted row-major,
    ``i < j`` in ORIGINAL indices; zero-filled past ``count``), except
    that when ``overflow`` is True the retained ``capacity`` pairs are
    a row-major-sorted subset — sorted among themselves, but not
    necessarily the row-major prefix of the full pair set.
    ``window_exceeded`` is the exactness certificate: False means every
    pair whose x intervals overlap fell inside the window, i.e. the
    result equals the dense query's; True means some x-overlapping
    candidate was out of reach and collisions may be missing — re-call
    with a larger ``window`` (the flag is conservative: computed on
    AABB x overlap via one `searchsorted`, no narrow phase needed).

    Implementation note: the sorted successor at offset ``d`` is a
    SHIFT of the sorted array, so each of the ``window`` scan steps
    pairs ``spolys`` against ``jnp.roll(spolys, -d)`` — contiguous
    copies, never a (N, window, k, 2) gather (dynamic gathers measure
    ~8x slower than the whole shifted narrow phase on TPU). Hit flags
    accumulate into one (window, N) plane extracted once at the end;
    peak memory is O(window * N + N * k^2).

    Wins when scenes are spatially sparse (max shapes overlapping any
    x position << N) — the regime broad phases exist for. A dense
    cluster of N mutually x-overlapping shapes needs window = N-1, at
    which point `scene_colliding_pairs` is the better tool.
    """
    polys = _normalize_padding(jnp.asarray(polys, jnp.float32), mask)
    n = polys.shape[0]
    w = min(window, max(n - 1, 1))

    xmin = jnp.min(polys[..., 0], axis=-1)
    xmax = jnp.max(polys[..., 0], axis=-1)
    order = jnp.argsort(xmin, stable=True).astype(jnp.int32)
    sx_min, sx_max = xmin[order], xmax[order]
    spolys = polys[order]

    # Exactness certificate: the farthest sorted successor whose x-min
    # is still <= this row's x-max. Beyond-window successors can only
    # collide if they also x-overlap, so this one searchsorted bounds
    # everything the window could have missed.
    reach = (
        jnp.searchsorted(sx_min, sx_max, side="right").astype(jnp.int32) - 1
    )
    window_exceeded = jnp.any(
        reach - jnp.arange(n, dtype=jnp.int32) > w
    )

    pos = jnp.arange(n, dtype=jnp.int32)

    def one_offset(_, d):
        partner = jnp.roll(spolys, -d, axis=0)
        hit = (pos + d < n) & (sat_polygons(spolys, partner) == 1)
        return None, hit

    _, hits = jax.lax.scan(
        one_offset, None, jnp.arange(1, w + 1, dtype=jnp.int32)
    )  # (w, N) bool, row d-1 = sorted pairs (p, p+d)

    total = jnp.sum(hits, dtype=jnp.int32)
    idx = jnp.flatnonzero(hits.reshape(-1), size=capacity, fill_value=0)
    d = (idx // n).astype(jnp.int32) + 1
    p = (idx % n).astype(jnp.int32)
    oi = order[p]
    oj = order[jnp.minimum(p + d, n - 1)]
    count = jnp.minimum(total, capacity)
    slot = jnp.arange(capacity, dtype=jnp.int32)
    valid = slot < count
    # Restore row-major (i, j) order for parity with the dense query:
    # two stable argsorts = lexicographic sort without an i*n+j key
    # (which would overflow int32 at N ~ 5e4). Invalid slots sort last
    # via the n sentinel, then zero-fill.
    pi = jnp.where(valid, jnp.minimum(oi, oj), n)
    pj = jnp.where(valid, jnp.maximum(oi, oj), n)
    o1 = jnp.argsort(pj, stable=True)
    pi, pj = pi[o1], pj[o1]
    o2 = jnp.argsort(pi, stable=True)
    pi, pj = pi[o2], pj[o2]
    pairs = jnp.where((pi < n)[:, None], jnp.stack([pi, pj], axis=-1), 0)
    return pairs, count, total > capacity, window_exceeded


@functools.partial(
    jax.jit, static_argnames=("capacity", "row_tile", "broad_phase", "window")
)
def scene_contact_manifolds(
    polys: Array,
    mask: Array | None = None,
    *,
    capacity: int,
    row_tile: int = 64,
    broad_phase: str = "dense",
    window: int = 64,
) -> tuple[Array, Array, Array, Array, Array, Array, Array]:
    """Contact manifolds for every colliding pair in one shape set.

    The contact-solver front end: a broad phase finds the pairs,
    `ops.manifold.polygon_contact_manifold` runs batched on the
    gathered (capacity,)-shaped pair buffers. Returns ``(pairs, count,
    n_contacts, points, depths, normals, window_exceeded)``:
    ``pairs``/``count`` as `scene_colliding_pairs` (count clamps at
    ``capacity``; re-call larger when more pairs exist), ``n_contacts``
    int32 ``(capacity,)`` = contact points per pair (0..2), ``points``
    float32 ``(capacity, 2, 2)``, ``depths`` ``(capacity, 2)``,
    ``normals`` ``(capacity, 2)`` — the normal of row r points FROM
    shape ``pairs[r, 0]`` INTO shape ``pairs[r, 1]``. Rows past
    ``count`` are computed on the zero-fill gather (shape 0 vs itself)
    — filter by ``count``. One jit-compiled program; all shapes static.

    Broad-phase selection: ``broad_phase='dense'`` (default) tests all
    N^2/2 pairs exactly via `scene_colliding_pairs` (``row_tile``
    controls its tiling); ``broad_phase='swept'`` uses the O(N *
    ``window``) `scene_colliding_pairs_swept` sweep-and-prune instead.

    ``window_exceeded`` is the swept broad phase's exactness
    certificate (always False for 'dense'). When it fires, the sweep
    may have MISSED colliding pairs, so this function fails closed:
    ``count`` is zeroed and ``pairs`` is zero-filled — the caller's
    filter-by-count contract then yields no manifolds rather than a
    silently incomplete set. A solver seeing ``count == 0`` with
    ``window_exceeded`` True must re-call with a larger ``window`` (or
    ``broad_phase='dense'``); ``count == 0`` with the flag False
    genuinely means no contacts in the scene.
    """
    from collide2d_tpu.ops.manifold import polygon_contact_manifold

    polys = _normalize_padding(jnp.asarray(polys, jnp.float32), mask)
    if broad_phase == "swept":
        pairs, count, _, window_exceeded = scene_colliding_pairs_swept(
            polys, capacity=capacity, window=window
        )
        # The certificate cannot abort a jit program; an uncertified
        # sweep silently missing contacts would be a solver correctness
        # bug, so fail closed the fixed-shape way: zero the count AND
        # the pairs buffer (full zero-fill-past-count contract), and
        # return the flag so callers can distinguish "no contacts"
        # from "window too small".
        count = jnp.where(window_exceeded, 0, count)
        pairs = jnp.where(window_exceeded, 0, pairs)
    elif broad_phase == "dense":
        pairs, count, _ = scene_colliding_pairs(
            polys, capacity=capacity, row_tile=row_tile
        )
        window_exceeded = jnp.bool_(False)
    else:
        raise ValueError(
            f"broad_phase must be 'dense' or 'swept', got {broad_phase!r}"
        )
    p1 = jnp.take(polys, pairs[:, 0], axis=0)
    p2 = jnp.take(polys, pairs[:, 1], axis=0)
    n_contacts, points, depths, normals = polygon_contact_manifold(p1, p2)
    return (pairs, count, n_contacts, points, depths, normals,
            window_exceeded)
