"""Host-side adaptive-labeling driver: scheduler + device ops + loop.

The TPU equivalent of the reference's host while-loop
(generate_dataset.cu:425-468) lives here, split into three testable
pieces (round-2 review asked for exactly this — the ~190-line state
machine used to carry its correctness argument in comments only):

- `AdaptiveScheduler` — the PURE host state machine: plans sync groups,
  decides when to resolve the pipelined done-count readback, when to
  emit+repack, when to stop, and how to drain. It owns counters and
  policy only; every device effect goes through an injected ops object,
  so unit tests drive each branch deterministically with fakes
  (tests/test_driver.py).
- `_JaxOps` — the real device-ops implementation: `_fused_round`
  dispatch, on-device emit/flush/pack, async scalar readbacks,
  checkpoint writes.
- `adaptive_collision_probabilities` — the public entry point: state
  setup (pruning, sharding, checkpoint resume, compile warmup), one
  scheduler run, final materialize.

Scheduling invariants the tests pin (see `AdaptiveScheduler.run`):
- a resolved done count may be one sync group STALE; labels freeze on
  device at the exact round the criterion holds, so staleness only
  delays repack/exit decisions — and a stale count UNDERCOUNTS done
  rows, so the repack bucket it sizes can only be too roomy, never too
  small;
- after a repack, the count of the group dispatched just before it
  refers to the pre-repack buffer and must be DISCARDED;
- a group right before a schedule cliff (an expensive next round)
  resolves synchronously, so a repack can land before the big round
  instead of arriving one group late onto a mostly-done buffer;
- three drain paths: inflight count resolves after the loop; a repack
  consumed the last count (state may hold frozen-but-unemitted labels
  and an at-cap tail); or STOP fired inside the loop (at-cap flush or
  the active pool emptied).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.mc import estimator as est
from collide2d_tpu.mc.estimator import (
    AdaptiveConfig,
    PolygonConfigs,
    _LoopState,
    _mesh_axis,
    resolve_impl,
)

# Dispatch enough rounds between host syncs to amortize the readback
# latency (~30 ms through the remote tunnel) against real compute.
SYNC_SAMPLES = 3 * 10**8  # ~20-40 ms of device work per sync
# The tuned schedule's fewer, larger rounds tolerate a coarser quantum:
# measured +5% end to end at 6e8 (7.17->7.55e4 configs/s, 65k), while
# the REFERENCE schedule loses ~4% there (its 1000-sample early rounds
# pack too many rounds per group and the 20k->100k cliff coarsens) —
# the post-erfinv sweep in docs/design.md.
TUNED_SYNC_SAMPLES = 6 * 10**8
# Only SMALL groups pipeline their done-count readback: for a big group
# the stall is a few percent while a one-group-late repack wastes a
# whole large round on a mostly-done buffer, so those resolve
# synchronously.
PIPELINE_WORK = 5 * SYNC_SAMPLES


def sync_samples_for(schedule) -> int:
    """Schedule-aware sync quantum — ONE policy shared by the live
    driver and the offline replay (mc/schedule_sim.py), so the sim's
    equivalence proof can never drift from production grouping."""
    return TUNED_SYNC_SAMPLES if schedule == "tuned" else SYNC_SAMPLES


class _OutState(NamedTuple):
    """Device-resident emission buffers, one row per ORIGINAL config.

    Frozen labels accumulate here instead of riding a 5-array host
    readback at every repack: the host reads one scalar per repack and
    materializes these once at the end. k/n are the frozen integer
    numerator/denominator (division happens on host at materialize time,
    bit-identical to the previous host-side emission)."""

    k: Array     # int32 (C,) frozen true-counts (or tail-flush counts)
    n: Array     # int32 (C,) frozen sample denominators (0 = never written)
    flag: Array  # bool  (C,) converged (tail-flushed rows stay False)


@jax.jit
def _emit_to_out(state: _LoopState, outs: _OutState) -> _OutState:
    """Scatter frozen labels of done rows into the output buffers.

    Idempotent (frozen values never change after freezing), so calling it
    at every repack and again at the end is safe."""
    C = outs.k.shape[0]
    emit = jnp.logical_and(state.done, state.uids >= 0)
    tgt = jnp.where(emit, state.uids, C)  # C = out of bounds -> dropped
    return _OutState(
        k=outs.k.at[tgt].set(state.k_frozen, mode="drop"),
        n=outs.n.at[tgt].set(state.n_frozen, mode="drop"),
        flag=outs.flag.at[tgt].set(True, mode="drop"),
    )


@jax.jit
def _flush_to_out(state: _LoopState, outs: _OutState, n_samples) -> _OutState:
    """Tail flush (generate_dataset.cu:470-479): unconverged rows get
    their current estimate at the final sample count; flag stays False."""
    C = outs.k.shape[0]
    fl = jnp.logical_and(jnp.logical_not(state.done), state.uids >= 0)
    tgt = jnp.where(fl, state.uids, C)
    n_bcast = jnp.broadcast_to(jnp.int32(n_samples), state.uids.shape)
    return _OutState(
        k=outs.k.at[tgt].set(state.n_true, mode="drop"),
        n=outs.n.at[tgt].set(n_bcast, mode="drop"),
        flag=outs.flag,
    )


@functools.partial(jax.jit, static_argnames=("bucket",))
def _pack_active(state: _LoopState, *, bucket: int):
    """Repack still-active rows into a ``bucket``-sized buffer ON DEVICE.

    Stable argsort puts active rows first in original order — the same
    bucket contents the previous host-side flatnonzero produced — so the
    Pallas path's block-tied streams see an identical trajectory. Pad
    slots carry uids=-1 and done=True. Also returns the exact active
    count (the only scalar the host needs to read)."""
    active = jnp.logical_and(jnp.logical_not(state.done), state.uids >= 0)
    order = jnp.argsort(jnp.logical_not(active), stable=True)[:bucket]
    slot_valid = jnp.take(active, order)
    new_state = _LoopState(
        uids=jnp.where(slot_valid, jnp.take(state.uids, order), -1),
        active=type(state.active)(*(jnp.take(a, order, axis=0) for a in state.active)),
        n_true=jnp.take(state.n_true, order),
        done=jnp.logical_not(slot_valid),
        k_frozen=jnp.take(state.k_frozen, order),
        n_frozen=jnp.take(state.n_frozen, order),
    )
    return new_state, jnp.sum(active, dtype=jnp.int32)


@functools.lru_cache(maxsize=None)
def _ladder_buckets(
    c0: int, min_bucket: int, ladder: str = "half"
) -> tuple[int, ...]:
    """Every bucket size the repack ladder can visit starting from a
    ``c0``-row buffer: c0 itself plus `_round_up_bucket`'s image over all
    possible active counts below it — DERIVED from the real ladder
    function so the warm list can never drift from what the driver
    actually compiles."""
    vals = {c0}
    n = 1
    while n < c0:
        b = _round_up_bucket(n, min_bucket, ladder)
        if b < c0:
            vals.add(b)
        # jump to the next n that can map to a new bucket (the image is
        # monotone in n, so the next change is just past this bucket)
        n = b + 1
    return tuple(sorted(vals, reverse=True))


def _round_up_bucket(n: int, min_bucket: int, ladder: str = "half") -> int:
    """Smallest ladder size >= n.

    ladder="half": {2^k, 3*2^(k-1)} — bounds bucket padding waste at 33%
    (average ~17%) instead of the pure power-of-two ladder's 100% (avg
    ~33%), at the cost of one extra compiled shape per octave.
    ladder="quarter": {2^k, 5*2^(k-2), 3*2^(k-1), 7*2^(k-2)} — padding
    <= 25% (avg ~11%) for two extra shapes per octave; worth it when the
    compile bill is hidden (warm threads / cached) and rounds are large.
    ladder="eighth": all 2^k + i*2^(k-3) rungs — padding <= 12.5% (avg
    ~5.6%) for four more shapes per octave; only pays where the compile
    bill is fully warmed/cached AND the workload spends most of its time
    in large repacked rounds.
    ladder="sixteenth": all 2^k + i*2^(k-4) rungs below eighth spacing —
    padding <= 6.25% (avg ~3%) for eight more shapes per octave; under
    EAGER count resolution the rung spacing bounds ride waste too, so
    the finer ladder pays twice, at 2x the warm/compile bill.
    Every rung is a multiple of 8 at the sizes where it is used (b >= 16
    half-steps, b >= 32 quarter-steps, b >= 64 eighth-steps, b >= 128
    sixteenth-steps).
    """
    b = max(min_bucket, 1)
    while b < n:
        if ladder == "sixteenth" and b >= 128:
            for i in range(1, 16):
                m = b + i * (b // 16)
                if m >= n:
                    return m
        elif ladder in ("eighth", "sixteenth") and b >= 64:
            for i in range(1, 8):
                m = b + i * (b // 8)
                if m >= n:
                    return m
        elif ladder in ("quarter", "eighth", "sixteenth") and b >= 32:
            for m in (b + b // 4, b + b // 2, b + 3 * (b // 4)):
                if m >= n:
                    return m
        elif b >= 16:
            b2 = b + b // 2  # 3 * 2^(k-1)
            if b2 >= n:
                return b2
        b *= 2
    return b


def _warm_targets(cfg, impl: str, c0: int) -> list[tuple[int, int, int]]:
    """Every (bucket, step_samples, sub) `_fused_round` variant the
    adaptive driver can dispatch for a ``c0``-row unsharded run — the
    ladder's bucket image x the schedule's static plan combos. Shared by
    the warmup (below) and the cache-hit test so the warm list cannot
    drift from what the driver actually calls."""
    combos, n = set(), 0
    while n < cfg.max_samples and len(combos) < 6:
        nb, step = est._plan_round(cfg, n, 1, impl)
        n += nb
        if impl == "pallas":
            combos.add((0, est._pick_sub_pallas(nb)))
        else:
            combos.add((step, 0))
    return [
        (bucket, step_samples, sub)
        for bucket in _ladder_buckets(c0, cfg.min_active, cfg.ladder)
        for step_samples, sub in sorted(combos)
    ]


def _warm_fused_round_compiles(
    key, configs, robot_wh, cfg, *, impl, shape_noise, c0, acc_bins, bin_acc,
    poly_a_keep=None, ca: tuple | None = None, sync: bool = False,
) -> dict:
    """Fire-and-forget compile warmup for every bucket shape the repack
    ladder can visit.

    The adaptive driver's programs compile on first dispatch, serially —
    on this image's remote tunnel that is 1.4-11 min of a cold
    10^7-config run (pure tunnel-load latency: each program compiles in
    0.5-2 s when idle), and the persistent on-disk cache cannot help
    (executable LOADING through the tunnel costs as much as compiling;
    see utils/compile_cache.py). But the compile service handles
    CONCURRENT requests at near-perfect overlap (measured 4 programs in
    the time of one), so warming the ladder's `_fused_round` variants on
    daemon threads while the first rounds execute hides most of the
    bill. Each warm call is an AOT ``.lower().compile()`` with the big
    arrays abstract and every scalar/static EXACTLY as the driver
    passes them, so the populated jit cache is hit verbatim; a warm
    failure only means that shape compiles on demand as before — but it
    is RECORDED in the returned stats dict and reported once per run
    (a silently useless warmup would quietly bring the multi-minute
    cold-start bill back; review r2 finding).

    Warms are ONCE PER PROCESS per compiled-program signature: the jit
    cache the warm populates is process-global, so re-warming on every
    `generate_dataset`/`relabel_dataset`/`AdaptiveRun` call in the same
    process would re-issue ~65 AOT lower+compile round trips whose
    tracing work contends (GIL) with the live driver loop and whose
    executable loads contend at the tunnel's compile service — measured
    on-chip: a process's SECOND identical relabel ran 8-28x slower than
    its first purely from the repeated herd. `_WARMED_SIGS` makes every
    warm after the first a no-op (skipped targets count as ``ok``).

    ``sync=True`` compiles inline (tests); default spawns daemon threads.
    Returns the (live, thread-updated) stats dict
    ``{"ok": int, "failed": int, "errors": [(target, repr), ...]}``.
    """
    import threading

    ca_iters_eff, ca_tol_eff = ca or (cfg.ca_iters, cfg.ca_tol)
    stats = {"ok": 0, "failed": 0, "errors": []}
    lock = threading.Lock()
    # Bound the in-flight warms: the eighth ladder has ~65 targets, and
    # an unbounded herd would contend with the driver's own first
    # on-demand compiles at the tunnel's compile service (which overlaps
    # concurrent requests well, but not 65 at once). Targets are ordered
    # largest-bucket first — the order the trajectory needs them.
    gate = threading.Semaphore(8)

    def warm(bucket, step_samples, sub):
        gate.acquire()
        try:
            sds = lambda a: jax.ShapeDtypeStruct(
                (bucket,) + a.shape[1:], a.dtype
            )
            state_abs = _LoopState(
                uids=jax.ShapeDtypeStruct((bucket,), jnp.int32),
                active=type(configs)(*(sds(a) for a in configs)),
                n_true=jax.ShapeDtypeStruct((bucket,), jnp.int32),
                done=jax.ShapeDtypeStruct((bucket,), jnp.bool_),
                k_frozen=jax.ShapeDtypeStruct((bucket,), jnp.int32),
                n_frozen=jax.ShapeDtypeStruct((bucket,), jnp.int32),
            )
            est._fused_round.lower(
                key, state_abs, robot_wh,
                jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.int32(0),
                step_samples=step_samples, sub=sub,
                use_vertices=cfg.use_vertices, impl=impl,
                accuracy_bins=acc_bins, bin_accuracy=bin_acc,
                mesh=None, shape_noise=shape_noise,
                poly_a_keep=poly_a_keep,
                ca_iters=ca_iters_eff, ca_tol=ca_tol_eff,
            ).compile()
            with lock:
                stats["ok"] += 1
        except Exception as e:  # that shape compiles on demand, as before
            with lock:
                stats["failed"] += 1
                stats["errors"].append(((bucket, step_samples, sub), repr(e)))
                first = stats["failed"] == 1
            if first:
                import sys

                print(
                    "[mc] warmup: compile warm failed for "
                    f"(bucket={bucket}, step_samples={step_samples}, "
                    f"sub={sub}): {e!r} — shapes will compile on demand "
                    "(cold-start mitigation degraded)",
                    file=sys.stderr, flush=True,
                )
        finally:
            gate.release()

    base_sig = (
        impl, shape_noise, cfg.use_vertices, acc_bins, bin_acc, poly_a_keep,
        ca_iters_eff, ca_tol_eff,
        type(configs).__name__,
        # result_type/shape read dtype metadata without materializing —
        # jnp.asarray here would device-upload host-numpy configs leaves.
        tuple((jnp.shape(a)[1:], jnp.result_type(a).name) for a in configs),
        jnp.shape(robot_wh), jnp.result_type(robot_wh).name,
    )
    for bucket, step_samples, sub in _warm_targets(cfg, impl, c0):
        sig = (bucket, step_samples, sub) + base_sig
        with lock:
            if sig in _WARMED_SIGS:  # one attempt per process per program
                stats["ok"] += 1
                continue
            _WARMED_SIGS.add(sig)
        if sync:
            warm(bucket, step_samples, sub)
        else:
            threading.Thread(
                target=warm, args=(bucket, step_samples, sub), daemon=True
            ).start()
    return stats


# Compiled-program signatures already warmed (or warming) this process —
# the jit/compile caches they populate are process-global, so one attempt
# each is enough (see _warm_fused_round_compiles docstring).
_WARMED_SIGS: set = set()


# ---------------------------------------------------------------------------
# The scheduler (pure host logic over injected device ops)
# ---------------------------------------------------------------------------

CONTINUE, REPACKED, STOP = 0, 1, 2


class AdaptiveScheduler:
    """Plans sync groups and repack/stop/drain decisions for one
    adaptive-labeling run.

    ``ops`` provides every device effect (the protocol `_JaxOps`
    implements; tests inject fakes):

    - ``buffer_len() -> int`` — rows in the current device buffer
    - ``run_rounds(nb, step, n_rounds, n_samples_first, chunk_offset)
      -> handle`` — dispatch ``n_rounds`` same-plan rounds as ONE fused
      program; returns an opaque done-count handle (state after the
      last round)
    - ``start_transfer(handle)`` — begin the async device->host copy
    - ``resolve(handle) -> int`` — block on the done count
    - ``emit()`` — scatter frozen labels into the output buffers
    - ``flush(n_samples)`` — at-cap tail flush into the output buffers
    - ``pack(bucket) -> handle`` — repack active rows into ``bucket``
      slots; returns an async exact-active-count handle
    - ``resolve_active(handle) -> int`` — block on that count
    - ``bookkeeping(n_samples, chunk_offset, num_real, rnd)`` —
      checkpoint hook (called at most once per handled count)
    - ``progress(num_left, n_samples, rnd)`` — observability hook

    The scheduler can be resumed mid-run: pass the checkpointed
    ``n_samples``/``chunk_offset``/``rnd`` counters and the recomputed
    ``num_real``. `step()` processes ONE sync group (dispatch +
    pipelined-count handling) so callers can interleave several runs
    (the cross-batch pipelining in data.pipeline); `run()` loops step()
    to completion and drains.
    """

    def __init__(
        self,
        cfg: AdaptiveConfig,
        ops,
        *,
        num_real: int,
        impl: str,
        n_sample: int = 1,
        n_shards: int = 1,
        n_samples: int = 0,
        chunk_offset: int = 0,
        rnd: int = 0,
        checkpoint_every: int = 0,
        sync_samples: int | None = None,  # None -> sync_samples_for(cfg)
        pipeline_work: int = PIPELINE_WORK,
        eager_resolve: bool = False,
    ) -> None:
        self.cfg = cfg
        self.ops = ops
        self.impl = impl
        self.n_sample = n_sample
        self.n_shards = n_shards
        self.num_real = num_real
        self.n_samples = n_samples
        self.chunk_offset = chunk_offset
        self.rnd = rnd
        self.checkpoint_every = checkpoint_every
        self.sync_samples = (
            sync_samples if sync_samples is not None
            else sync_samples_for(cfg.schedule)
        )
        self.pipeline_work = pipeline_work
        # Eager mode: handle the in-flight count at the TOP of step(),
        # BEFORE planning the next group, so a repack always lands before
        # the group it could have shrunk — no group ever runs on a buffer
        # the scheduler already knows is mostly done, and no resolved
        # count is ever discarded. The resolve may block on the group's
        # completion + the ~30 ms tunnel round trip, which is dead time
        # for a SOLO run (that is exactly what the pipelined default
        # avoids) but is covered work when sibling interleaved runs keep
        # the device queue full — so `run_interleaved` turns this on and
        # the serial drivers leave it off. Deterministic by construction
        # (no readiness probing): the scheduler trajectory, and therefore
        # the Pallas path's block-tied sample streams, stay reproducible
        # for a given (seed, overlap) setting. Measured in the offline
        # replay (mc/schedule_sim.py) on the bench workload: slot
        # efficiency 0.84 -> 0.95 (reference schedule) / 0.76 -> 0.93
        # (tuned) at 65k configs.
        self.eager_resolve = eager_resolve
        self._inflight = None   # pipelined done-count handle (one group stale)
        self._pending_active = None  # async exact-active-count from last pack
        self._stopped = False
        self._drained = False

    # -- state inspection (cross-batch pipelining + tests) ---------------
    @property
    def finished(self) -> bool:
        """The loop guard is exhausted (drain may still be pending)."""
        return (
            self._stopped
            or self.num_real <= 0
            or self.n_samples >= self.cfg.max_samples
        )

    def _bookkeeping(self) -> None:
        if self.checkpoint_every:
            self.ops.bookkeeping(
                self.n_samples, self.chunk_offset, self.num_real, self.rnd
            )

    def _bucket_for(self, est_active: int) -> int:
        """Shard-aligned ladder bucket for ``est_active`` rows, capped at
        the current buffer (a repack never grows the buffer)."""
        bucket = _round_up_bucket(
            est_active, self.cfg.min_active, self.cfg.ladder
        )
        return min(
            -(-bucket // self.n_shards) * self.n_shards, self.ops.buffer_len()
        )

    def _handle(self, num_done: int) -> int:
        """Bookkeeping for one resolved done count.

        ``num_done`` may be one sync group STALE (pipelined readback):
        labels freeze on device at the exact round the criterion holds,
        so a stale count only delays repack/exit decisions — never
        changes a label. A stale count UNDERCOUNTS done rows, so the
        bucket it sizes can only be too roomy, never too small.

        Repack policy: emit + repack exactly when the ladder bucket for
        the remaining active rows is SMALLER than the current buffer (or
        the cap/empty-pool stop paths fire). A repack that cannot shrink
        the buffer saves no device slots — it only costs a pack dispatch
        and discards one pipelined count — while waiting longer than the
        next rung boundary rides converged rows through whole extra
        groups. This replaced a done-fraction threshold (round-3 perf
        push): riding waste is now bounded by the ladder's rung spacing
        (≤12.5% on the default eighth ladder) instead of by the
        threshold×group-size product, measured −5% device slots and +13%
        configs/s serial on the reference schedule at 65k configs.
        """
        cfg = self.cfg
        if self._pending_active is not None:
            # Exact active count from the last repack (its transfer
            # overlapped the sync group after it); replaces the
            # provisional stale-safe overestimate.
            self.num_real = self.ops.resolve_active(self._pending_active)
            self._pending_active = None
            if self.num_real == 0:
                return STOP  # buffer is pure padding; everything emitted
        self.ops.progress(
            max(self.num_real - num_done, 0), self.n_samples, self.rnd
        )
        at_cap = self.n_samples >= cfg.max_samples
        if num_done == 0 and not at_cap:
            self._bookkeeping()
            return CONTINUE
        est_active = max(self.num_real - num_done, 0)
        if (
            not at_cap
            and est_active > 0
            and self._bucket_for(est_active) >= self.ops.buffer_len()
        ):
            # Repacking cannot shrink the buffer yet: converged rows keep
            # sampling (their labels are frozen; the waste is bounded by
            # the rung spacing, see docstring).
            self._bookkeeping()
            return CONTINUE

        # Emit + repack, all on device: frozen labels scatter into the
        # output buffers and the active rows pack into a smaller bucket —
        # the host reads ONE scalar (the exact active count) instead of
        # five buffer-sized arrays.
        self.ops.emit()
        if at_cap:
            self.ops.flush(self.n_samples)
            self.num_real = 0
            return STOP
        if est_active == 0:
            self.num_real = 0
            return STOP
        # Async: the exact count resolves at the NEXT sync; until then the
        # stale-safe overestimate stands in (used only for bucket sizing,
        # thresholds, and the loop guard — a too-big value can at worst
        # run one extra group on an all-padding buffer).
        self._pending_active = self.ops.pack(self._bucket_for(est_active))
        self.num_real = est_active
        self._bookkeeping()
        return REPACKED

    def plan_group(self) -> tuple[list[tuple[int, int]], int]:
        """The next sync group: [(n_batch, step), ...] and its work in
        sample-slots. Accumulates rounds until ~sync_samples of device
        work (or the checkpoint cadence) so the host sync amortizes."""
        group: list[tuple[int, int]] = []
        work = 0
        sim_n = self.n_samples
        buf = self.ops.buffer_len()
        while sim_n < self.cfg.max_samples:
            nb, step = est._plan_round(self.cfg, sim_n, self.n_sample, self.impl)
            sim_n += nb
            group.append((nb, step))
            work += nb * buf
            if work >= self.sync_samples or (
                self.checkpoint_every and len(group) >= self.checkpoint_every
            ):
                break
        return group, work

    def step(self) -> bool:
        """Dispatch ONE sync group and handle the pipelined readback.

        Returns False when the loop guard is exhausted (caller should
        `drain()`); True to keep stepping. Every round still freezes
        labels on device, so grouping changes nothing about label
        semantics.
        """
        if self.finished:
            return False
        if self.eager_resolve and self._inflight is not None:
            # Eager path: consume the previous group's count before
            # planning, so any repack shrinks THIS group's buffer (the
            # pipelined default repacks one group late; see __init__).
            action = self._handle(self.ops.resolve(self._inflight))
            self._inflight = None
            if action == STOP:
                self._stopped = True
                return False
            if self.finished:
                return False
        group, work = self.plan_group()
        handle = None
        # Coalesce maximal same-plan runs into ONE fused multi-round
        # dispatch each: round tags and convergence checkpoints advance
        # inside the program exactly as per-round dispatches would
        # (bitwise-identical labels), but the per-round host dispatch
        # cost — measured ~7-8 ms through this image's tunnel, dominating
        # the small-bucket convergence tail — is paid once per run.
        idx = 0
        while idx < len(group):
            nb, step = group[idx]
            count = 1
            while idx + count < len(group) and group[idx + count] == (nb, step):
                count += 1
            handle = self.ops.run_rounds(
                nb, step, count, self.n_samples + nb, self.chunk_offset
            )
            self.n_samples += nb * count
            self.chunk_offset += (nb // step) * count
            self.rnd += count
            idx += count
        self.ops.start_transfer(handle)
        if self._inflight is not None:
            # Pipelined readback: the done count of group k resolves while
            # group k+1 is already computing, so the ~30 ms host round
            # trip no longer stalls the device once per sync — profiling
            # showed those stalls cost ~30% of end-to-end wall-clock.
            action = self._handle(self.ops.resolve(self._inflight))
            self._inflight = None
            if action == STOP:
                self._stopped = True
                return False
            if action == REPACKED:
                # The just-dispatched group's count refers to the
                # pre-repack buffer — discard it.
                return not self.finished
        if self.eager_resolve:
            # The count is consumed at the next step's top, before any
            # further dispatch — the same decision point a synchronous
            # resolve here would give, but the block happens after the
            # caller has stepped its sibling runs (their queued groups
            # cover the wait). The cliff special-case is subsumed: EVERY
            # group's repack lands before the next group.
            self._inflight = handle
            return not self.finished
        resolve_now = work >= self.pipeline_work
        if not resolve_now and self.n_samples < self.cfg.max_samples:
            # Schedule cliff: if the NEXT round is expensive relative to
            # the ~30 ms readback stall, resolve this group's count NOW so
            # a repack can land before it — pipelining here would dispatch
            # the big round on the stale (possibly mostly-done) buffer.
            # This is what lets a convergence checkpoint right before a
            # large round (e.g. the 37k rule-of-three point ahead of a
            # 100k round) actually shed its converged mass in time.
            nb_next, _ = est._plan_round(
                self.cfg, self.n_samples, self.n_sample, self.impl
            )
            resolve_now = nb_next * self.ops.buffer_len() >= self.pipeline_work
        if resolve_now:
            # Resolve synchronously (stall is a few percent of this much
            # compute) so any repack lands before the next expensive round.
            action = self._handle(self.ops.resolve(handle))
            if action == STOP:
                self._stopped = True
                return False
        else:
            self._inflight = handle
        return not self.finished

    def drain(self) -> None:
        """Resolve the final group's count (or run bookkeeping once more
        after a repack consumed it) so converged rows emit and the at-cap
        tail flush runs. Idempotent."""
        if self._drained:
            return
        self._drained = True
        if not self._stopped and self.num_real > 0:
            if self._inflight is not None:
                self._handle(self.ops.resolve(self._inflight))
                self._inflight = None
            else:
                # A repack consumed the last count; the state still holds
                # frozen-but-unemitted labels (and possibly an at-cap
                # tail).
                self._handle(self.num_real)

    def run(self) -> None:
        while self.step():
            pass
        self.drain()


# ---------------------------------------------------------------------------
# Real device ops
# ---------------------------------------------------------------------------


class _JaxOps:
    """`AdaptiveScheduler` ops backed by the real jit'd programs."""

    def __init__(
        self,
        key: Array,
        state: _LoopState,
        outs: _OutState,
        robot_wh: Array,
        cfg: AdaptiveConfig,
        *,
        impl: str,
        acc_bins: tuple,
        bin_acc: tuple,
        round_mesh=None,
        shape_noise: bool = True,
        poly_a_keep=None,
        ca: tuple | None = None,
        shard=lambda s: s,
        progress=None,
        checkpoint_write=None,
    ) -> None:
        self.key = key
        self.state = state
        self.outs = outs
        self.robot_wh = robot_wh
        self.cfg = cfg
        self.impl = impl
        self.acc_bins = acc_bins
        self.bin_acc = bin_acc
        self.round_mesh = round_mesh
        self.shape_noise = shape_noise
        self.poly_a_keep = poly_a_keep
        # effective CA knobs: (iters, tol) — may differ from cfg's when
        # the run auto-detected a translation-only trajectory batch
        self.ca_iters, self.ca_tol = ca or (cfg.ca_iters, cfg.ca_tol)
        self._shard = shard
        self._progress = progress
        self._checkpoint_write = checkpoint_write
        # Host-side accounting: device sample-slots dispatched so far
        # (Σ n_batch x rounds x buffer rows, padding and post-freeze rows
        # included). Slot efficiency = Σ frozen denominators / this —
        # the share of dispatched work that labels actually used; the
        # complement is padding + ride waste (bench_e2e reports both).
        self.dispatched_slots = 0
        self.slots_by_bucket: dict[int, int] = {}

    def buffer_len(self) -> int:
        return len(self.state.uids)

    def run_rounds(self, nb, step, n_rounds, n_samples_first, chunk_offset):
        buf = self.buffer_len()
        slots = int(nb) * int(n_rounds) * buf
        self.dispatched_slots += slots
        self.slots_by_bucket[buf] = self.slots_by_bucket.get(buf, 0) + slots
        if self.impl == "pallas":
            # Static sub (always 64: _plan_round rounds nb to its
            # granule), traced step count — one compile per bucket.
            sub = est._pick_sub_pallas(nb)
            n_steps_v, step_static = nb // sub, 0
        else:
            sub = 0
            n_steps_v, step_static = nb // step, step
        self.state, handle = est._fused_round(
            self.key, self.state, self.robot_wh,
            jnp.int32(chunk_offset), jnp.int32(n_samples_first),
            jnp.int32(n_steps_v), jnp.int32(n_rounds), jnp.int32(nb),
            jnp.int32(nb // step),
            step_samples=step_static, sub=sub,
            use_vertices=self.cfg.use_vertices, impl=self.impl,
            accuracy_bins=self.acc_bins, bin_accuracy=self.bin_acc,
            mesh=self.round_mesh, shape_noise=self.shape_noise,
            poly_a_keep=self.poly_a_keep,
            ca_iters=self.ca_iters, ca_tol=self.ca_tol,
        )
        return handle

    def start_transfer(self, handle) -> None:
        try:
            handle.copy_to_host_async()
        except Exception:
            pass  # transfer then happens at np.asarray time

    def resolve(self, handle) -> int:
        return int(np.asarray(handle))

    resolve_active = resolve

    def emit(self) -> None:
        self.outs = _emit_to_out(self.state, self.outs)

    def flush(self, n_samples) -> None:
        self.outs = _flush_to_out(self.state, self.outs, jnp.int32(n_samples))

    def pack(self, bucket):
        self.state, num_active_dev = _pack_active(self.state, bucket=bucket)
        self.state = self._shard(self.state)
        self.start_transfer(num_active_dev)
        return num_active_dev

    def progress(self, num_left, n_samples, rnd) -> None:
        if self._progress is not None:
            self._progress(num_left=num_left, n_samples=n_samples, round=rnd)

    def bookkeeping(self, n_samples, chunk_offset, num_real, rnd) -> None:
        if self._checkpoint_write is not None:
            self._checkpoint_write(
                out_k=np.asarray(jax.device_get(self.outs.k)),
                out_nn=np.asarray(jax.device_get(self.outs.n)),
                out_flag=np.asarray(jax.device_get(self.outs.flag)),
                uids=np.asarray(jax.device_get(self.state.uids)),
                n_true=np.asarray(jax.device_get(self.state.n_true)),
                done=np.asarray(jax.device_get(self.state.done)),
                k_frozen=np.asarray(jax.device_get(self.state.k_frozen)),
                n_frozen=np.asarray(jax.device_get(self.state.n_frozen)),
                active=[np.asarray(jax.device_get(a)) for a in self.state.active],
                n_samples=n_samples, chunk_offset=chunk_offset,
                num_real=num_real, round=rnd,
            )


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


def adaptive_collision_probabilities(
    key: Array,
    configs,
    robot_wh,
    cfg: AdaptiveConfig = AdaptiveConfig(),
    *,
    progress=None,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Label every configuration to its bin's CI accuracy target.

    Host-side driver equivalent of the reference's while-loop
    (generate_dataset.cu:425-468) with thrust compaction replaced by
    halving buckets: after each round the still-active configurations are
    repacked into a buffer of the smallest power-of-two bucket that holds
    them, so each bucket shape compiles once and finished configurations
    stop consuming FLOPs — the XLA-native analogue of shrinking the CUDA
    grid to ``num_left``.

    Returns (cp, n_samples_used, converged) as host numpy arrays in the
    ORIGINAL configuration order (the reference restores order via a
    device-side index column, compute_collision_probability.cu:337-344;
    here the uid array serves that role).

    Checkpoint/resume: with ``checkpoint_path`` + ``checkpoint_every`` >
    0, the full loop state is written every N rounds and restored on the
    next call with the same key/configs — finer-grained than the
    reference's batch-level artifact resume (SURVEY.md §5), whose killed
    runs lose up to one whole batch. The file is validated against the
    PRNG key; a mismatched checkpoint is ignored.

    Multi-chip: pass a `jax.sharding.Mesh` (see parallel.make_mesh) to
    shard every state array over its ``config`` axis. On the threefry
    path BOTH axes are value-level no-ops: config-DP is bitwise-equal
    because streams are uid-keyed, and a ``sample`` axis > 1 round-robins
    the sample STEPS across devices with the single-chip fold_in tags, so
    the psum'd counts equal the unsharded sum bit for bit
    (`estimator._sample_sharded_counts`); the auto step choice is itself
    shard-invariant (`estimator._canonical_step`), so no step pinning is
    needed. Under a mesh impl='auto' therefore resolves to jnp.
    Explicitly passing impl='pallas' opts into the fused kernel
    (shard_map, per-shard seeds) at the cost of the bitwise guarantee;
    a sample axis > 1 then splits each round's step budget across the
    sample shards with psum'd counts (`estimator._pallas_sharded_counts`
    — exact totals at any step count, i.i.d. streams per shard).
    """
    run = AdaptiveRun(
        key, configs, robot_wh, cfg,
        progress=progress, checkpoint_path=checkpoint_path,
        checkpoint_every=checkpoint_every, mesh=mesh,
    )
    run.scheduler.run()
    return run.materialize()


class AdaptiveRun:
    """One adaptive labeling run: device-state setup + a scheduler over
    the real ops + final materialize. Exposed as an object (rather than
    only the `adaptive_collision_probabilities` function) so the dataset
    pipeline can interleave the sync groups of SEVERAL runs — cross-batch
    pipelining with bitwise-identical per-batch results, since each run's
    trajectory (keys, buffers, round plan) is untouched by interleaving.
    """

    def __init__(
        self,
        key: Array,
        configs,
        robot_wh,
        cfg: AdaptiveConfig = AdaptiveConfig(),
        *,
        progress=None,
        checkpoint_path=None,
        checkpoint_every: int = 0,
        mesh=None,
        warmup: bool | None = None,
    ) -> None:
        C = configs.num
        self.C = C
        self.configs = configs
        self.checkpoint_path = checkpoint_path
        robot_wh = jnp.asarray(robot_wh, jnp.float32)
        acc_bins = tuple(float(b) for b in cfg.accuracy_bins)
        bin_acc = tuple(float(b) for b in cfg.bin_accuracy)
        is_poly = isinstance(configs, PolygonConfigs)
        self._early_outs = None  # (cp, n, done) when pruning empties the pool

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # Under a mesh, 'auto' resolves to the threefry jnp path: its
            # uid-keyed streams make BOTH mesh axes value-level no-ops
            # (bitwise-equal to unsharded — the documented DP contract).
            # Explicit impl='pallas' opts into the faster fused kernel at
            # the cost of that bitwise guarantee (per-shard block-tied
            # streams).
            impl = cfg.impl if cfg.impl != "auto" else "jnp"
            n_sample = _mesh_axis(mesh, "sample")
            row_sharding = NamedSharding(mesh, PartitionSpec("config"))
            n_shards = _mesh_axis(mesh, "config")
            # Config-only jnp DP shards transparently under GSPMD;
            # shard_map (and thus the mesh) is needed only for the sample
            # axis or the Pallas kernel.
            round_mesh = mesh if (impl == "pallas" or n_sample > 1) else None

            def _shard(s: _LoopState) -> _LoopState:
                return jax.tree.map(lambda a: jax.device_put(a, row_sharding), s)
        else:
            impl = resolve_impl(cfg.impl, configs.position)
            n_sample = 1
            n_shards = 1
            round_mesh = None
            _shard = lambda s: s

        # With every w/h sigma zero (the reference default —
        # generate_dataset.cu:285-290 zeroes them unless --shape_variance),
        # the fused kernel skips 2 of its 5 Box-Muller draw pairs (it is
        # VPU-issue-bound; measured speedup in ops/mc_pallas.py). One
        # scalar readback at driver start.
        shape_noise = True
        poly_a_keep = None
        # std_dev carries w/h sigmas only for the RECTANGLE config types
        # (Configs/MovingConfigs, (C, 5)); MovingPolygonConfigs is not a
        # PolygonConfigs subclass but its (C, 3) std_dev has no shape
        # sigmas either — without the exclusion this branch would issue a
        # blocking tunnel readback of an empty slice whose result the
        # MovingPolygonConfigs block below unconditionally overwrites.
        if (
            impl == "pallas"
            and not is_poly
            and configs.std_dev.shape[-1] >= 5
        ):
            shape_noise = bool(
                jax.device_get(jnp.any(configs.std_dev[:, 3:] != 0.0))
            )
        elif impl == "pallas" and is_poly:
            # Static robot-axis dedupe for the fused polygon kernel (robot
            # vertices are concrete here; inside the jit they are traced).
            from collide2d_tpu.ops.mc_polygon_pallas import dedup_robot_axes

            poly_a_keep = dedup_robot_axes(np.asarray(jax.device_get(robot_wh)))

        # Trajectory batches with NO rotation resolve every sample
        # through the exact translation window: setting the effective
        # ca_iters to 0 compiles the conservative-advancement loop out
        # of the round program entirely (mc.moving / ops.mc_toi_pallas).
        # One scalar readback, mirroring shape_noise above. The same
        # readback steers 'auto' impl: the fused kernel wins only on
        # translation-only batches (6.9e9 vs 5.4e9 samples/s on a v5e);
        # for ROTATING batches the CA loop is trig-issue-bound in
        # Mosaic and the XLA path is measurably faster (2.5e8 vs 1.5e8)
        # — 'auto' therefore resolves rotating trajectory batches to
        # 'jnp' (explicit impl='pallas' is honored either way).
        ca_iters, ca_tol = cfg.ca_iters, cfg.ca_tol
        from collide2d_tpu.mc.moving import MovingConfigs, MovingPolygonConfigs

        if isinstance(configs, MovingPolygonConfigs):
            # Trajectory k-gons: 'auto' stays on the threefry jnp path
            # (uid-keyed streams, compaction-invariant); EXPLICIT
            # 'pallas' opts into the fused translation-window kernel
            # (ops.mc_moving_polygon_pallas) and is valid only for
            # translation-only batches — the omega readback below
            # surfaces rotating rows as an error rather than a silent
            # wrong kernel (the fused kernel has no CA loop).
            impl = "pallas" if cfg.impl == "pallas" else "jnp"
            shape_noise = True
            poly_a_keep = None
            if impl == "pallas":
                from collide2d_tpu.ops.mc_polygon_pallas import (
                    dedup_robot_axes,
                )

                poly_a_keep = dedup_robot_axes(
                    np.asarray(jax.device_get(robot_wh))
                )
        if (isinstance(configs, (MovingConfigs, MovingPolygonConfigs))
                and ca_iters > 0):
            if not bool(jax.device_get(jnp.any(configs.omega != 0.0))):
                ca_iters = 0
            elif isinstance(configs, MovingPolygonConfigs):
                if cfg.impl == "pallas":
                    raise ValueError(
                        "impl='pallas' supports only translation-only "
                        "MovingPolygonConfigs batches (this batch has "
                        "rotating rows; rotating trajectory k-gons run "
                        "the jnp CA path — use 'jnp' or 'auto')"
                    )
            elif (isinstance(configs, MovingConfigs)
                  and impl == "pallas" and cfg.impl == "auto"):
                impl = "jnp"
        self_ca = (ca_iters, ca_tol)

        # Device state: uids identify original rows through repacking (-1
        # = padding); labels freeze on device (see estimator._fused_round).
        if C % n_shards:
            raise ValueError(
                f"config count {C} must divide over {n_shards} shards"
            )
        self._pruned_done = None
        if cfg.prune_sigma > 0:
            # Noise-aware broad phase: impossible-to-touch rows get cp=0
            # and never enter the loop (see AdaptiveConfig.prune_sigma).
            from collide2d_tpu.ops.broad_phase import possible_collision_mask

            keep_mask = np.asarray(
                jax.device_get(
                    possible_collision_mask(configs, robot_wh, cfg.prune_sigma)
                )
            )
            self._pruned_done = ~keep_mask
            keep0 = np.flatnonzero(keep_mask)
            if keep0.size == 0:
                self._early_outs = True
                state = None
                num_real = 0
            else:
                bucket = _round_up_bucket(
                    max(keep0.size, 1), cfg.min_active, cfg.ladder
                )
                bucket = min(
                    -(-bucket // n_shards) * n_shards,
                    -(-C // n_shards) * n_shards,
                )
                pad0 = np.concatenate(
                    [keep0,
                     np.full(bucket - keep0.size, keep0[0], dtype=keep0.dtype)]
                ) if bucket > keep0.size else keep0[:bucket]
                gather0 = jnp.asarray(pad0, jnp.int32)
                pad_mask0 = jnp.arange(len(pad0)) >= keep0.size
                state = _shard(
                    _LoopState(
                        uids=jnp.where(pad_mask0, -1, gather0),
                        active=type(configs)(
                            *(jnp.take(a, gather0, axis=0) for a in configs)
                        ),
                        n_true=jnp.zeros((len(pad0),), jnp.int32),
                        done=jnp.asarray(pad_mask0),
                        k_frozen=jnp.zeros((len(pad0),), jnp.int32),
                        n_frozen=jnp.ones((len(pad0),), jnp.int32),
                    )
                )
                num_real = int(keep0.size)
        else:
            state = _shard(
                _LoopState(
                    uids=jnp.arange(C, dtype=jnp.int32),
                    active=configs,
                    n_true=jnp.zeros((C,), jnp.int32),
                    done=jnp.zeros((C,), bool),
                    k_frozen=jnp.zeros((C,), jnp.int32),
                    n_frozen=jnp.ones((C,), jnp.int32),
                )
            )
            num_real = C  # rows of the buffer that are real (not padding)

        n_samples = 0
        chunk_offset = 0
        rnd = 0
        # Device-resident emission buffers (see _OutState): frozen labels
        # scatter here at each repack; the host reads them ONCE at the end.
        outs = _OutState(
            k=jnp.zeros((C,), jnp.int32),
            n=jnp.zeros((C,), jnp.int32),
            flag=jnp.zeros((C,), bool),
        )

        key_data = np.asarray(jax.random.key_data(key)).ravel()
        if checkpoint_path is not None and state is not None:
            ckpt = _load_checkpoint(
                checkpoint_path, key_data, C, cfg_type=type(configs).__name__
            )
            if ckpt is not None:
                outs = _OutState(
                    k=jnp.asarray(ckpt["out_k"], jnp.int32),
                    n=jnp.asarray(ckpt["out_nn"], jnp.int32),
                    flag=jnp.asarray(ckpt["out_flag"], bool),
                )
                state = _shard(_LoopState(
                    uids=jnp.asarray(ckpt["uids"], jnp.int32),
                    active=type(configs)(
                        *(jnp.asarray(a) for a in ckpt["active"])
                    ),
                    n_true=jnp.asarray(ckpt["n_true"], jnp.int32),
                    done=jnp.asarray(ckpt["done"], bool),
                    k_frozen=jnp.asarray(ckpt["k_frozen"], jnp.int32),
                    n_frozen=jnp.asarray(ckpt["n_frozen"], jnp.int32),
                ))
                n_samples = int(ckpt["n_samples"])
                chunk_offset = int(ckpt["chunk_offset"])
                # Recompute exactly (the stored count may be the
                # provisional overestimate the async repack pipeline runs
                # on). num_real counts REAL (non-padding) buffer rows —
                # including done-but-unemitted ones: the scheduler's
                # est_active = num_real - num_done subtracts the done
                # count itself, so excluding done rows here would
                # double-subtract and size the next repack bucket too
                # small, silently DROPPING still-active rows (they'd
                # finish with n=0 labels).
                num_real = int((ckpt["uids"] >= 0).sum())
                rnd = int(ckpt["round"])

        # Overlap the ladder's program compilations with the first rounds'
        # execution. Gated to TPU-platform data (the remote-compile
        # environment it targets): on CPU hosts the thread herd would burn
        # real compile CPU next to the measured run for no latency win.
        # Mesh runs skip it: the warm lowers unsharded avals, which would
        # miss the sharded-arg cache keys anyway. Small runs skip it:
        # their two or three shapes compile on demand faster than a
        # thread herd pays off. ``warmup`` forces it on/off (the dataset
        # pipeline warms once per process, not once per batch).
        if warmup is None:
            warmup = (
                mesh is None
                and state is not None
                and state.uids.shape[0] >= 16384
                and resolve_impl("auto", configs.position) == "pallas"
            )
        if warmup and state is not None:
            _warm_fused_round_compiles(
                key, configs, robot_wh, cfg, impl=impl,
                shape_noise=shape_noise, c0=state.uids.shape[0],
                acc_bins=acc_bins, bin_acc=bin_acc, poly_a_keep=poly_a_keep,
                ca=self_ca,
            )

        checkpoint_write = None
        if checkpoint_path is not None and checkpoint_every:
            def checkpoint_write(**kw):
                _save_checkpoint(
                    checkpoint_path, key_data, C,
                    cfg_type=type(configs).__name__, **kw
                )

        self.ops = _JaxOps(
            key, state, outs, robot_wh, cfg,
            impl=impl, acc_bins=acc_bins, bin_acc=bin_acc,
            round_mesh=round_mesh, shape_noise=shape_noise,
            poly_a_keep=poly_a_keep, ca=self_ca, shard=_shard,
            progress=progress, checkpoint_write=checkpoint_write,
        )
        self.scheduler = AdaptiveScheduler(
            cfg, self.ops,
            num_real=num_real, impl=impl, n_sample=n_sample,
            n_shards=n_shards, n_samples=n_samples,
            chunk_offset=chunk_offset, rnd=rnd,
            checkpoint_every=checkpoint_every,
        )

    def pipeline_ready(self) -> bool:
        """True once this run's initial phase has been DISPATCHED — the
        earliest point a pipelined driver should admit the next batch.

        The round-2 policy (admit when the pool shrinks below 25%) only
        flipped after the first bulk round's count RESOLVED — by then
        the host had just sat through a synchronous cliff resolve (the
        first 100k round is ~0.6 s of device work) and then built the
        next run's configs with an empty device queue. Admitting on
        dispatch instead means the big
        bulk rounds sit in the queue keeping the chip busy while the
        host samples/transfers the next batch. Purely a scheduling hint:
        admission timing never touches any run's keys, buffers, or round
        plan, so per-batch outputs stay bitwise identical (the
        test_dataset overlap A/B covers this driver path)."""
        s = self.scheduler
        return s.finished or s.n_samples >= max(1, s.cfg.initial_phase_samples)

    def prefetch_outputs(self) -> None:
        """Drain and start the device->host copy of the output buffers
        WITHOUT blocking, so a pipelined driver can overlap the ~30 ms
        tunnel readback with the next run's sync groups; the following
        materialize() then completes quickly."""
        self.scheduler.drain()
        if self._early_outs is None:
            for a in self.ops.outs:
                try:
                    a.copy_to_host_async()
                except AttributeError:  # plain numpy under fakes/tests
                    pass

    def materialize(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Drain if needed, read the device output buffers ONCE, delete a
        clean-finish checkpoint, and assemble the final host arrays
        (division happens here, bit-identical to per-repack host
        emission: same int32 numerators/denominators through the same
        float32 divide)."""
        self.scheduler.drain()
        out_cp = np.zeros((self.C,), np.float32)
        out_n = np.zeros((self.C,), np.int64)
        out_done = np.zeros((self.C,), bool)
        if self._pruned_done is not None:
            out_done[self._pruned_done] = True  # cp 0, n_used 0
        if self.checkpoint_path is not None:
            import os

            try:
                os.remove(self.checkpoint_path)  # labeling finished cleanly
            except OSError:
                pass
        if self._early_outs is not None:
            return out_cp, out_n, out_done
        k_np, n_np, f_np = (
            np.asarray(x) for x in jax.device_get(self.ops.outs)
        )
        written = n_np > 0
        out_cp[written] = k_np[written].astype(np.float32) / n_np[
            written
        ].astype(np.float32)
        out_n[written] = n_np[written]
        out_done |= f_np
        return out_cp, out_n, out_done


def run_interleaved(makers, overlap: int, on_done, *,
                    eager_resolve: bool = True) -> None:
    """Drive several `AdaptiveRun`s with their sync groups interleaved.

    ``makers``: ordered zero-arg callables, each creating a fresh
    ``(tag, run)`` pair when the pipeline is ready to admit it (so e.g.
    config sampling happens lazily); ``overlap``: max runs in flight;
    ``on_done(tag, run)``: called as runs complete, in submission order.

    A new run is admitted once the NEWEST in-flight run has DISPATCHED
    its initial phase (`AdaptiveRun.pipeline_ready`): its bulk rounds
    then hold the device busy while the host builds the next run, and
    the new run's big rounds go on to interleave with the older run's
    small convergence-tail rounds — the cross-batch pipelining the
    reference's strictly serial loop lacks (generate_dataset.cu:418-505).
    Each admitted run's scheduler switches to EAGER count resolution
    (``AdaptiveScheduler.eager_resolve``): its repacks land one group
    earlier than the serial pipelined default, and the resolve stalls
    that would idle a solo run are covered by the sibling runs' queued
    groups (``eager_resolve=False`` restores round-2 behavior).
    Three pieces of host work are additionally taken off the critical
    path (each measured 0.05-0.15 s/batch of device idle on the tunnel):
    the NEXT maker runs on a prefetch thread as soon as the previous
    admission happens; a finished run's output readback starts
    asynchronously (`prefetch_outputs`); and its ``on_done`` (pack/
    shuffle/write submit) is deferred by one iteration so the copy
    overlaps younger runs' sync groups. Label parity vs the serial loop:
    the threefry path is BITWISE identical — its streams are keyed by
    (batch key, uid, step tag), so neither the interleaving nor the
    eager repack timing can move a single draw; the Pallas path's
    block-tied streams see the eager mode's earlier repacks, so it keeps
    its usual statistical-only contract (labels remain deterministic and
    reproducible for a given seed + overlap + eager setting; pass
    ``eager_resolve=False`` for dispatch-order-only interleaving, which
    is bitwise for BOTH paths vs serial).
    """
    import threading

    pending = list(makers)
    runs: list[tuple] = []
    finished: list[tuple] = []
    prefetch: dict = {"thread": None, "box": None}

    def start_prefetch():
        if pending and prefetch["thread"] is None:
            maker, box = pending[0], {}

            def work():
                try:
                    box["made"] = maker()
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    box["error"] = e

            t = threading.Thread(target=work, daemon=True)
            t.start()
            prefetch.update(thread=t, box=box)

    while runs or pending or finished:
        if pending and (
            not runs
            or (len(runs) < max(1, overlap) and runs[-1][1].pipeline_ready())
        ):
            if prefetch["thread"] is None:
                maker = pending.pop(0)
                runs.append(maker())
            else:
                pending.pop(0)
                prefetch["thread"].join()
                box = prefetch["box"]
                prefetch.update(thread=None, box=None)
                if "error" in box:  # maker failed on the prefetch thread:
                    raise box["error"]  # surface the REAL traceback here
                runs.append(box["made"])
            runs[-1][1].scheduler.eager_resolve = bool(eager_resolve)
            start_prefetch()
        # Step the OLDEST run first (runs complete in order), then give
        # every younger run one sync group so its rounds queue behind the
        # tail's on the device.
        alive = runs[0][1].scheduler.step() if runs else False
        for _, r in runs[1:]:
            r.scheduler.step()
        if finished:
            # The async output copy kicked off last iteration has had a
            # full round of sync groups to complete — hand over now.
            on_done(*finished.pop(0))
        if runs and not alive:
            tag, r = runs.pop(0)
            r.prefetch_outputs()
            finished.append((tag, r))


def _save_checkpoint(
    path, key_data, n_configs, *, active, cfg_type: str, **state
) -> None:
    import os

    # Ends in .npz so np.savez won't rename it; PID-suffixed so two
    # processes checkpointing the same path (e.g. a --resume rerun
    # racing a stuck first run) can't os.replace each other's temp file
    # mid-write — the same race utils.io_npy.save_npy documents.
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    np.savez(
        tmp,
        key_data=key_data,
        n_configs=n_configs,
        cfg_type=np.str_(cfg_type),
        # EVERY config field, by position: trajectory types
        # (MovingConfigs / MovingPolygonConfigs) carry 7 fields, not the
        # rectangle Configs' 4 — a fixed-name subset would silently drop
        # the motion fields and crash the resume reconstruction.
        active_len=np.int64(len(active)),
        **{f"active_{i}": a for i, a in enumerate(active)},
        **state,
    )
    os.replace(tmp, path)  # atomic publish


def _load_checkpoint(path, key_data, n_configs, cfg_type: str = "Configs"):
    import os

    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if (
                z["n_configs"] != n_configs
                or z["key_data"].shape != key_data.shape
                or not (z["key_data"] == key_data).all()
                # A rectangle checkpoint must never resume into a polygon
                # run (same key + C is plausible in a reused driver
                # script); pre-cfg_type checkpoints are ignored via the
                # KeyError path like any other stale format.
                or str(z["cfg_type"]) != cfg_type
            ):
                return None  # stale checkpoint from a different run
            return {
                # Integer emission buffers (new format; an old-format
                # checkpoint lacks these keys -> KeyError -> None, i.e.
                # it is ignored like any other stale checkpoint).
                "out_k": z["out_k"],
                "out_nn": z["out_nn"],
                "out_flag": z["out_flag"],
                "uids": z["uids"],
                "n_true": z["n_true"],
                "done": z["done"],
                "k_frozen": z["k_frozen"],
                "n_frozen": z["n_frozen"],
                "active": (
                    [
                        z[f"active_{i}"]
                        for i in range(int(z["active_len"]))
                    ]
                    if "active_len" in z
                    # Pre-trajectory checkpoint format (4 fixed names);
                    # only 4-field config types ever wrote it, so the
                    # positional reconstruction stays correct.
                    else [
                        z["active_position"],
                        z["active_pose_theta"],
                        z["active_obstacle_wh"],
                        z["active_std_dev"],
                    ]
                ),
                "n_samples": z["n_samples"],
                "chunk_offset": z["chunk_offset"],
                "num_real": z["num_real"],
                "round": z["round"],
            }
    except (OSError, KeyError, ValueError):
        return None
