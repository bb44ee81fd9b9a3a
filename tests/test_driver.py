"""AdaptiveScheduler state-machine branches, driven deterministically.

Round-2 review: the pipelined driver loop was proven only end-to-end —
bitwise A/B tests catch label corruption but not WASTE regressions (a
cliff-resolution bug silently re-running a 100k round on a 95%-done
buffer), and no test drove the stale/repack/cliff/drain branches
individually. These tests inject a scripted fake device-ops object and
pin each branch: dispatch/resolve interleaving (pipelining), stale-count
repack sizing, REPACKED-count discard, schedule-cliff synchronous
resolution, the three drain paths, and mid-run resume counters.
"""

import numpy as np
import pytest

from collide2d_tpu.mc.driver import AdaptiveScheduler
from collide2d_tpu.mc.estimator import AdaptiveConfig


class FakeOps:
    """Scripted device: rounds are tagged handles; `done_script` maps the
    round index (1-based, cumulative) to the done count that a resolve of
    that round's handle returns. Logs every call for order assertions."""

    def __init__(self, buffer_len, done_for=None, active_for=None):
        self._len = buffer_len
        self.done_for = done_for or (lambda rnd, n_samples: 0)
        # exact active count a pack's async handle resolves to
        self.active_for = active_for or (lambda bucket: ("active", bucket))
        self.log = []
        self.resolved = []          # handles actually resolved
        self.dispatched = []        # handles created

    def buffer_len(self):
        return self._len

    def run_rounds(self, nb, step, n_rounds, n_samples_first, chunk_offset):
        # one FUSED dispatch covering n_rounds same-plan rounds; the
        # handle's count resolves to the state after the LAST round
        n_last = n_samples_first + (n_rounds - 1) * nb
        handle = ("round", len(self.dispatched), nb, n_last, n_rounds)
        self.dispatched.append(handle)
        self.log.append(("run_round", nb, n_last, n_rounds))
        return handle

    def start_transfer(self, handle):
        self.log.append(("start_transfer", handle[1]))

    def resolve(self, handle):
        self.resolved.append(handle)
        val = self.done_for(handle[1], handle[3])
        self.log.append(("resolve", handle[1], val))
        return val

    def resolve_active(self, handle):
        self.log.append(("resolve_active", handle))
        return handle[1]  # ("active", count)

    def emit(self):
        self.log.append(("emit",))

    def flush(self, n_samples):
        self.log.append(("flush", n_samples))

    def pack(self, bucket):
        self.log.append(("pack", bucket))
        self._len = bucket
        return self.active_for(bucket)

    def progress(self, num_left, n_samples, rnd):
        self.log.append(("progress", num_left, n_samples))

    def bookkeeping(self, n_samples, chunk_offset, num_real, rnd):
        self.log.append(("bookkeeping", n_samples))


def _cfg(**kw):
    kw.setdefault("fixed_batch", 1000)
    kw.setdefault("max_samples", 10_000)
    kw.setdefault("min_active", 64)
    kw.setdefault("step_samples", 100)
    return AdaptiveConfig(**kw)


def _sched(cfg, ops, **kw):
    kw.setdefault("num_real", ops.buffer_len())
    kw.setdefault("impl", "jnp")
    return AdaptiveScheduler(cfg, ops, **kw)


def test_pipelined_resolve_is_one_group_stale():
    # Small groups (work < pipeline_work): group k's count must resolve
    # AFTER group k+1 dispatches — the readback overlaps compute.
    ops = FakeOps(buffer_len=1000)
    s = _sched(
        _cfg(), ops,
        sync_samples=1000 * 1000,        # one round per group
        pipeline_work=100 * 1000 * 1000,  # never resolve synchronously
    )
    s.run()
    events = [e for e in ops.log if e[0] in ("run_round", "resolve")]
    # rounds at 1000..10000; resolve of round i lands after dispatch i+1
    kinds = [e[0] for e in events]
    assert kinds[:5] == [
        "run_round", "run_round", "resolve", "run_round", "resolve"
    ]
    resolved_ids = [e[1] for e in ops.log if e[0] == "resolve"]
    assert resolved_ids == sorted(resolved_ids)
    # The LAST group's count is never read: its resolve would land at the
    # cap, where the handler emits + flushes straight from the (fresh)
    # device state — the readback is unnecessary.
    assert ops.dispatched[-1] not in ops.resolved
    assert ops.dispatched[-2] in ops.resolved
    assert [e for e in ops.log if e[0] == "flush"] == [("flush", 10_000)]


def test_big_groups_resolve_synchronously():
    # work >= pipeline_work: the count resolves in the same iteration (no
    # inflight carry), so a repack can land before the next group.
    ops = FakeOps(buffer_len=1000)
    s = _sched(
        _cfg(), ops,
        sync_samples=1000 * 1000,
        pipeline_work=1000 * 1000,  # every group is "big"
    )
    s.run()
    events = [e[0] for e in ops.log if e[0] in ("run_round", "resolve")]
    assert events == ["run_round", "resolve"] * (len(events) // 2)


def test_stale_count_can_only_oversize_bucket():
    # The pipelined count is one group stale (UNDERCOUNTS done rows), so
    # the bucket sized from it can only be >= the true active count.
    true_active = {1: 1000, 2: 700, 3: 120, 4: 40, 5: 10, 6: 0}
    done_at = {k: 1000 - v for k, v in true_active.items()}

    ops = FakeOps(
        buffer_len=1000,
        done_for=lambda rnd, n: done_at.get(rnd + 1, 0),  # rnd is 0-based
    )
    s = _sched(
        _cfg(), ops,
        sync_samples=1000 * 1000,
        pipeline_work=100 * 1000 * 1000,
    )
    s.run()
    for e in ops.log:
        if e[0] == "pack":
            bucket = e[1]
            # at pack time the freshest dispatched round is len(dispatched)
            latest = max(
                (i + 1 for i, h in enumerate(ops.dispatched)), default=0
            )
            assert bucket >= true_active.get(latest, 0)


def test_repacked_discards_next_group_count():
    # After a repack, the group dispatched just before handling refers to
    # the pre-repack buffer: its count must never be resolved.
    # Script: round 1 reports 90% done -> repack on handling it.
    ops = FakeOps(
        buffer_len=1000,
        done_for=lambda rnd, n: 900 if rnd == 0 else 0,
    )
    s = _sched(
        _cfg(max_samples=5000), ops,
        sync_samples=1000 * 1000,
        pipeline_work=100 * 1000 * 1000,
    )
    s.run()
    packs = [i for i, e in enumerate(ops.log) if e[0] == "pack"]
    assert packs, "scripted 90% done must trigger a repack"
    # handle 1 (the group dispatched while handle 0's count was inflight)
    # was discarded: never resolved.
    resolved_ids = {h[1] for h in ops.resolved}
    assert 0 in resolved_ids and 1 not in resolved_ids
    # and the run still completes every remaining round + drain
    assert s.finished


def test_eager_resolve_handles_count_before_next_dispatch():
    # Eager mode (run_interleaved's default): the in-flight count is
    # consumed at the TOP of the next step, so after the first group
    # every resolve precedes the next dispatch — even for groups the
    # pipelined default would have carried one group stale.
    ops = FakeOps(buffer_len=1000)
    s = _sched(
        _cfg(), ops,
        sync_samples=1000 * 1000,
        pipeline_work=100 * 1000 * 1000,  # pipelined mode would never sync
        eager_resolve=True,
    )
    s.run()
    events = [e[0] for e in ops.log if e[0] in ("run_round", "resolve")]
    assert events == ["run_round", "resolve"] * (len(events) // 2)
    resolved_ids = [h[1] for h in ops.resolved]
    assert resolved_ids == sorted(resolved_ids)


def test_eager_repack_lands_before_next_group_and_discards_nothing():
    # Same 90%-done script as test_repacked_discards_next_group_count:
    # eager mode repacks BEFORE dispatching the next group, so the group
    # runs on the packed buffer and no resolved count is ever discarded.
    ops = FakeOps(
        buffer_len=1000,
        done_for=lambda rnd, n: 900 if rnd == 0 else 0,
    )
    s = _sched(
        _cfg(max_samples=5000), ops,
        sync_samples=1000 * 1000,
        pipeline_work=100 * 1000 * 1000,
        eager_resolve=True,
    )
    s.run()
    pack_i = next(i for i, e in enumerate(ops.log) if e[0] == "pack")
    bucket = ops.log[pack_i][1]
    assert bucket < 1000
    # every dispatch after the pack ran on the packed buffer: FakeOps
    # mutates _len at pack, and plan_group reads it per group — verify via
    # the dispatch log positions.
    dispatches_after = [
        e for e in ops.log[pack_i + 1:] if e[0] == "run_round"
    ]
    assert dispatches_after, "remaining rounds must still run"
    # no discarded counts: EVERY dispatched handle resolves (the final
    # one at drain time) — pipelined mode discards the group dispatched
    # while the repacking count was in flight.
    resolved_ids = {h[1] for h in ops.resolved}
    assert resolved_ids == {h[1] for h in ops.dispatched}


def test_eager_beats_pipelined_slot_efficiency_on_profile():
    # Offline replay of the production scheduler on a synthetic freeze
    # profile: eager resolution must strictly reduce ride+padding slots.
    from collide2d_tpu.mc.schedule_sim import simulate_schedule

    rng = np.random.default_rng(0)
    # bimodal profile: 60% freeze early, the rest spread to the cap
    n_frozen = np.where(
        rng.random(4096) < 0.6,
        2000,
        rng.choice([4000, 6000, 8000, 10_000], size=4096),
    )
    cfg = _cfg()
    kw = dict(  # one round per sync group, pipelining unrestricted
        sync_samples=4096 * 1000, pipeline_work=100 * 4096 * 1000
    )
    lazy = simulate_schedule(n_frozen, cfg, **kw)
    eager = simulate_schedule(n_frozen, cfg, eager_resolve=True, **kw)
    assert eager["efficiency"] > lazy["efficiency"]
    assert eager["used"] == lazy["used"]  # labels use identical samples
    assert eager["slots"] < lazy["slots"]


def test_schedule_cliff_resolves_before_big_round():
    # A cheap group right before an expensive round must resolve its
    # count synchronously (pipelining would run the big round on a stale,
    # mostly-done buffer).
    cfg = AdaptiveConfig(
        initial_batch=1000, initial_phase_samples=2000, later_batch=100_000,
        max_samples=202_000, min_active=64, step_samples=100,
    )
    ops = FakeOps(buffer_len=1000, done_for=lambda rnd, n: 0)
    s = _sched(
        cfg, ops,
        sync_samples=1000 * 1000,       # each 1000-round is its own group
        pipeline_work=50 * 1000 * 1000,  # 1000-rounds are "small"...
    )
    # ...but the 100k round that follows the 2000-sample initial phase
    # clears pipeline_work (100_000 * 1000 >= 5e7), forcing sync resolve.
    s.run()
    events = [e for e in ops.log if e[0] in ("run_round", "resolve")]
    # The last cheap round (reaching 2000 samples) sits right before the
    # 100k cliff: ITS OWN count (handle 1) must resolve before the next
    # dispatch, not ride inflight into the big round.
    idx = [i for i, e in enumerate(events)
           if e[0] == "run_round" and e[2] == 2000]
    assert idx, events
    next_dispatch = next(
        (i for i in range(idx[0] + 1, len(events))
         if events[i][0] == "run_round"), len(events)
    )
    between = events[idx[0] + 1: next_dispatch]
    assert ("resolve", 1, 0) in between, (
        "the group before the 100k cliff must resolve synchronously, got "
        f"{events[: next_dispatch + 1]}"
    )


def test_at_cap_stop_emits_and_flushes_once():
    # Reaching the cap while a count is inflight: the resolve of the
    # previous group lands at n_samples == max -> emit + tail flush from
    # the fresh device state, exactly once, and the loop STOPs (the final
    # group's own count is never needed).
    ops = FakeOps(buffer_len=1000, done_for=lambda rnd, n: 0)
    s = _sched(
        _cfg(max_samples=3000), ops,
        sync_samples=1000 * 1000,
        pipeline_work=100 * 1000 * 1000,
    )
    s.run()
    assert [e for e in ops.log if e[0] == "emit"] == [("emit",)]
    assert [e for e in ops.log if e[0] == "flush"] == [("flush", 3000)]
    assert s.finished and s.num_real == 0
    # drain() after the STOP is a no-op (idempotent)
    log_len = len(ops.log)
    s.drain()
    assert len(ops.log) == log_len


def test_drain_after_pack_consumed_last_count():
    # A repack right at the end consumes the pipeline; drain must still
    # run bookkeeping once (emit + at-cap flush) via the num_real path.
    ops = FakeOps(
        buffer_len=1000,
        # round 2's count (resolved while round 3 is inflight) repacks;
        # round 3's count is discarded; nothing else resolves in-loop.
        done_for=lambda rnd, n: 900 if rnd == 1 else 0,
    )
    s = _sched(
        _cfg(max_samples=3000), ops,
        sync_samples=1000 * 1000,
        pipeline_work=100 * 1000 * 1000,
    )
    s.run()
    assert 2 not in {h[1] for h in ops.resolved}  # discarded post-repack
    flushes = [e for e in ops.log if e[0] == "flush"]
    assert flushes == [("flush", 3000)]  # drain reached the at-cap flush


def test_stop_when_active_pool_empties():
    # pack's async exact count resolving to 0 must STOP the loop (the
    # buffer is pure padding; everything already emitted) without a
    # tail flush.
    ops = FakeOps(
        buffer_len=1000,
        done_for=lambda rnd, n: 1000 if rnd == 0 else 0,
        active_for=lambda bucket: ("active", 0),
    )
    s = _sched(
        _cfg(), ops,
        sync_samples=1000 * 1000,
        pipeline_work=100 * 1000 * 1000,
    )
    s.run()
    assert s.finished and s.num_real == 0
    assert not [e for e in ops.log if e[0] == "flush"]
    # far fewer rounds dispatched than the 10-round schedule
    assert len(ops.dispatched) <= 3


def test_resume_counters_continue_schedule():
    # Mid-run resume: the first planned round must continue the schedule
    # from the checkpointed n_samples, not restart it.
    cfg = AdaptiveConfig(
        initial_batch=1000, initial_phase_samples=20_000, later_batch=100_000,
        max_samples=220_000, min_active=64, step_samples=100,
    )
    ops = FakeOps(buffer_len=512, done_for=lambda rnd, n: 0)
    s = _sched(
        cfg, ops,
        n_samples=120_000, chunk_offset=1200, rnd=30,
        sync_samples=10**12, pipeline_work=10**13,
    )
    s.run()
    first = next(e for e in ops.log if e[0] == "run_round")
    assert first[1] == 100_000 and first[2] == 220_000
    assert s.rnd == 31  # exactly one more round to the cap


def test_checkpoint_cadence_bounds_group_length():
    # checkpoint_every caps rounds per sync group, and bookkeeping fires
    # once per handled count.
    ops = FakeOps(buffer_len=10, done_for=lambda rnd, n: 0)
    s = _sched(
        _cfg(max_samples=6000), ops,
        checkpoint_every=2,
        sync_samples=10**12,  # without the cap, one giant group
        pipeline_work=10**13,
    )
    s.run()
    # group boundaries = start_transfer calls: no group exceeds the cap
    # (a fused dispatch counts as its n_rounds)
    per_group = []
    count = 0
    for e in ops.log:
        if e[0] == "run_round":
            count += e[3]
        elif e[0] == "start_transfer":
            per_group.append(count)
            count = 0
    assert per_group and all(r <= 2 for r in per_group), per_group
    # bookkeeping fires once per handled count (one per group, one group
    # pipelined + the at-cap group handled via STOP without bookkeeping)
    books = [e for e in ops.log if e[0] == "bookkeeping"]
    assert len(books) >= len(per_group) - 2


def test_progress_reports_stale_safe_num_left():
    seen = []
    # min_active=128 > buffer: the bucket can never shrink, so no repack
    # fires and every progress line reports the same stale-safe estimate.
    ops = FakeOps(buffer_len=100, done_for=lambda rnd, n: 30)
    ops.progress = lambda num_left, n_samples, rnd: seen.append(num_left)
    s = _sched(
        _cfg(max_samples=2000, min_active=128), ops,
        sync_samples=10**12, pipeline_work=10**13,
    )
    s.run()
    assert seen and all(v == 70 for v in seen)


def test_repack_fires_exactly_when_bucket_shrinks():
    # The repack policy: emit+repack at the FIRST handled count whose
    # remaining-active ladder bucket is smaller than the current buffer —
    # not earlier (a same-size repack saves no slots) and not later
    # (riding converged rows past a rung boundary wastes whole groups).
    done_at = {0: 50, 1: 200, 2: 824}
    ops = FakeOps(
        buffer_len=1024,
        done_for=lambda rnd, n: done_at.get(rnd, 0),
        active_for=lambda bucket: ("active", 824),
    )
    s = _sched(
        _cfg(), ops,
        sync_samples=1000 * 1024,
        pipeline_work=1,  # every group resolves synchronously
    )
    s.run()
    packs = [e for e in ops.log if e[0] == "pack"]
    # 50 done (est 974 -> eighth rung 1024 == buffer): no repack yet;
    # 200 done (est 824 -> rung 832 < 1024): repack fires, exactly once.
    assert packs == [("pack", 832)], ops.log
    # the exact active count (824) then empties the pool via done=824
    assert s.finished and s.num_real == 0
    assert not [e for e in ops.log if e[0] == "flush"]


# ---------------------------------------------------------------------------
# run_interleaved (fake runs; no JAX)
# ---------------------------------------------------------------------------


class FakeRun:
    """Quacks like AdaptiveRun for run_interleaved: a scripted number of
    sync groups, pipeline_ready after `ready_after` of them."""

    def __init__(self, tag, groups, ready_after, log):
        self.tag = tag
        self._left = groups
        self._ready_after = ready_after
        self._groups = groups
        self._log = log
        self.prefetched = False
        run = self

        class _Sched:
            def step(self):
                run._log.append(("step", run.tag))
                run._left -= 1
                return run._left > 0

        self.scheduler = _Sched()

    def pipeline_ready(self):
        return (self._groups - self._left) >= self._ready_after

    def prefetch_outputs(self):
        self.prefetched = True
        self._log.append(("prefetch", self.tag))


def test_interleaved_admission_on_pipeline_ready():
    from collide2d_tpu.mc.driver import run_interleaved

    log, done = [], []
    runs = {}

    def make(i):
        def m():
            log.append(("make", i))
            runs[i] = FakeRun(i, groups=6, ready_after=2, log=log)
            return i, runs[i]
        return m

    run_interleaved([make(0), make(1), make(2)], 2,
                    lambda tag, r: done.append(tag))
    # completion order preserved, everyone ran to completion
    assert done == [0, 1, 2]
    assert all(r._left == 0 for r in runs.values())
    assert all(r.prefetched for r in runs.values())
    # batch 1 was ADMITTED (first stepped) once batch 0 had dispatched
    # ready_after=2 groups — NOT after batch 0 finished. (Its make() runs
    # earlier on the prefetch thread; that is the point of the prefetch.)
    i_step1 = log.index(("step", 1))
    steps0_before = sum(1 for e in log[:i_step1] if e == ("step", 0))
    assert 2 <= steps0_before < 6, log
    # overlap cap 2: batch 2's first step comes after batch 0 finished
    i_first_step2 = log.index(("step", 2))
    assert sum(1 for e in log[:i_first_step2] if e == ("step", 0)) == 6


def test_interleaved_on_done_deferred_past_next_group():
    from collide2d_tpu.mc.driver import run_interleaved

    log, done = [], []

    def make(i):
        def m():
            return i, FakeRun(i, groups=4, ready_after=1, log=log)
        return m

    def on_done(tag, r):
        done.append(tag)
        log.append(("done", tag))

    run_interleaved([make(0), make(1)], 2, on_done)
    assert done == [0, 1]
    # the async output copy gets one iteration of younger-run groups
    # between prefetch (copy start) and on_done (copy consume)
    i_pref = log.index(("prefetch", 0))
    i_done = log.index(("done", 0))
    assert any(e == ("step", 1) for e in log[i_pref:i_done]), log


def test_interleaved_single_run_no_overlap():
    from collide2d_tpu.mc.driver import run_interleaved

    log, done = [], []

    def m():
        return "only", FakeRun("only", groups=3, ready_after=1, log=log)

    run_interleaved([m], 1, lambda tag, r: done.append(tag))
    assert done == ["only"]


def test_interleaved_prefetch_maker_error_propagates():
    # A maker that fails on the prefetch thread must surface its REAL
    # exception on the main thread, not an opaque KeyError from the
    # prefetch box (review r3 finding).
    from collide2d_tpu.mc.driver import run_interleaved

    log = []

    def ok():
        return 0, FakeRun(0, groups=3, ready_after=1, log=log)

    def boom():
        raise ValueError("malformed poses table")

    with pytest.raises(ValueError, match="malformed poses table"):
        run_interleaved([ok, boom], 2, lambda tag, r: None)


# ---------------------------------------------------------------------------
# Compile-warmup thread gate
# ---------------------------------------------------------------------------


def test_warmup_gate_bounds_herd_and_completes(monkeypatch):
    # The eighth ladder warms ~65 shapes; the semaphore must bound how
    # many compile at once (so the herd cannot starve the driver's own
    # on-demand compiles at the tunnel) while still completing EVERY
    # target — a gate that acquires without releasing would warm exactly
    # 8 shapes and silently bring the multi-minute cold-start bill back.
    import threading
    import time
    from typing import NamedTuple

    from collide2d_tpu.mc import driver
    from collide2d_tpu.mc import estimator as est

    N = 24
    state = {"cur": 0, "peak": 0}
    lock = threading.Lock()

    class FakeLowered:
        def compile(self):
            with lock:
                state["cur"] += 1
                state["peak"] = max(state["peak"], state["cur"])
            time.sleep(0.01)  # long enough that an unbounded herd piles up
            with lock:
                state["cur"] -= 1

    class FakeFused:
        def lower(self, *a, **k):
            return FakeLowered()

    class Cfgs(NamedTuple):
        x: np.ndarray
        y: np.ndarray

    monkeypatch.setattr(est, "_fused_round", FakeFused())
    monkeypatch.setattr(
        driver, "_warm_targets",
        lambda cfg, impl, c0: [(64 * (i + 1), 100, 0) for i in range(N)],
    )
    stats = driver._warm_fused_round_compiles(
        None,
        Cfgs(np.zeros((4, 2), np.float32), np.zeros((4,), np.float32)),
        np.asarray([4.07, 1.74], np.float32),
        _cfg(), impl="jnp", shape_noise=True, c0=1024,
        acc_bins=(0.0, 1.0), bin_acc=(1e-3,),
    )
    deadline = time.time() + 20
    while stats["ok"] + stats["failed"] < N and time.time() < deadline:
        time.sleep(0.01)
    assert stats["ok"] == N and stats["failed"] == 0, stats
    assert 1 <= state["peak"] <= 8, state


def test_dispatched_slot_accounting_real_ops(rng):
    # _JaxOps.dispatched_slots counts every device sample-slot the run
    # dispatched (n_batch x rounds x buffer rows). Invariants: it is at
    # least the sum of frozen per-config denominators (every used sample
    # was dispatched; padding/ride waste only adds), and at most the
    # no-repack upper bound n_samples x initial buffer.
    import jax

    from collide2d_tpu.mc.driver import AdaptiveRun
    from tests.conftest import random_configs

    cfgs = random_configs(rng, 64)
    run = AdaptiveRun(
        jax.random.PRNGKey(3), cfgs, np.asarray([4.07, 1.74], np.float32),
        AdaptiveConfig(
            max_samples=4096, fixed_batch=512,
            bin_accuracy=(0.002, 0.002, 0.005), min_active=8, impl="jnp",
        ),
        warmup=False,
    )
    run.scheduler.run()
    cp, n_used, done = run.materialize()
    slots = run.ops.dispatched_slots
    assert slots >= int(np.asarray(n_used, np.int64).sum()) > 0
    assert slots <= run.scheduler.n_samples * 64
