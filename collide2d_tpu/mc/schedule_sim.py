"""Offline waste/throughput simulator for the adaptive driver.

Drives the REAL :class:`~collide2d_tpu.mc.driver.AdaptiveScheduler` with
a synthetic device whose convergence behavior comes from a per-row
freeze-point profile, so schedule/ladder/policy questions ("where do the
dispatched sample-slots go?", "would a sixteenth ladder pay?") can be
answered exactly — same planner, same pipelined-readback state machine,
same repack policy as production — without touching hardware.

Two ways to get a profile:

- :func:`simulate_convergence` draws binomial k-trajectories for given
  true collision probabilities and replays the reference CI criterion
  (generate_dataset.cu:243-252 semantics via a NumPy mirror of
  ``mc.stats``) at every round boundary of the configured schedule.
- Feed the ``n_used`` column of a REAL run (``AdaptiveRun.materialize``
  or a dataset artifact) straight in: the simulator then reproduces that
  run's dispatch sequence and slot totals exactly (see
  tests/test_schedule_sim.py for the equivalence proof against the live
  jnp driver).

The report splits every dispatched slot into
``used`` (sample slots the frozen labels actually consumed),
``ride``  (slots spent on rows that had already frozen but had not been
          repacked out yet — bounded by the ladder's rung spacing), and
``padding`` (slots on pad rows that exist only to round the buffer up to
          a ladder bucket),
plus dispatch/repack counts and an optional wall-clock model
(per-dispatch overhead + a buffer-size-dependent streaming rate), which
is what makes tail effects visible: small buckets stream slower, so a
policy that minimizes slots can still lose wall-clock.
"""

from __future__ import annotations

import numpy as np

from collide2d_tpu.mc import estimator as est
from collide2d_tpu.mc.driver import AdaptiveScheduler
from collide2d_tpu.mc.stats import _LOG_INV_ALPHA, Z_SCORE

__all__ = [
    "round_boundaries",
    "simulate_convergence",
    "ProfileOps",
    "simulate_schedule",
]


def round_boundaries(cfg, impl: str = "pallas", n_sample: int = 1):
    """Cumulative sample counts at every convergence checkpoint of
    ``cfg``'s schedule (the round ends of ``estimator._plan_round``,
    replayed to the cap). Deterministic: the plan depends only on the
    cumulative position, never on convergence."""
    out = []
    n = 0
    while n < cfg.max_samples:
        nb, _ = est._plan_round(cfg, n, n_sample, impl)
        n += nb
        out.append(n)
    return np.asarray(out, np.int64)


def _is_converged_np(n, k, accuracy_bins, bin_accuracy):
    """NumPy float32 mirror of mc.stats.is_converged (same dtypes so bin
    boundaries and degenerate cases agree bit for bit)."""
    n = np.asarray(n, np.float32)
    k = np.asarray(k, np.float32)
    degenerate = (k == n) | (k == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        rot = np.float32(_LOG_INV_ALPHA) / n
        wald = np.float32(Z_SCORE) / n * np.sqrt(
            np.maximum(k - k * k / n, np.float32(0.0))
        )
    slack = np.where(degenerate, rot, wald)
    p = k / n
    bins = np.asarray(accuracy_bins, np.float32)
    match = (p[..., None] >= bins[:-1]) & (p[..., None] <= bins[1:])
    n_bins = len(bins) - 1
    last = (n_bins - 1) - np.argmax(match[..., ::-1], axis=-1)
    bin_idx = np.where(match.any(axis=-1), last, 0)
    target = np.asarray(bin_accuracy, np.float32)[bin_idx]
    return slack <= target


def simulate_convergence(cp, cfg, seed: int = 0, impl: str = "pallas"):
    """Per-config freeze points for true probabilities ``cp``.

    Draws one binomial k-trajectory per config and returns the first
    round boundary (cumulative samples) at which the CI criterion holds;
    rows that never converge get the final boundary (where the at-cap
    flush freezes them)."""
    rng = np.random.default_rng(seed)
    cp = np.asarray(cp, np.float64)
    bounds = round_boundaries(cfg, impl=impl)
    k = np.zeros(cp.shape, np.int64)
    n_frozen = np.full(cp.shape, bounds[-1], np.int64)
    open_ = np.ones(cp.shape, bool)
    n_prev = 0
    for n_now in bounds:
        idx = np.flatnonzero(open_)
        if idx.size == 0:
            break
        k[idx] += rng.binomial(int(n_now - n_prev), cp[idx])
        conv = _is_converged_np(
            n_now, k[idx], cfg.accuracy_bins, cfg.bin_accuracy
        )
        newly = idx[conv]
        n_frozen[newly] = n_now
        open_[newly] = False
        n_prev = n_now
    return n_frozen


class ProfileOps:
    """AdaptiveScheduler device ops driven by a freeze-point profile.

    ``rows`` holds the freeze point of every REAL row currently in the
    buffer (frozen rows ride until a pack removes them, exactly like the
    device buffer); padding is the buffer tail beyond ``len(rows)``.
    Slot accounting happens at dispatch time: a row's slots in a round
    count as ``used`` while the round's end is <= its freeze point and as
    ``ride`` after; pad-row slots count as ``padding``.
    """

    def __init__(
        self,
        n_frozen,
        *,
        t_dispatch: float = 0.0,
        rate=None,
        buffer_len: int | None = None,
    ) -> None:
        self.rows = np.asarray(n_frozen, np.int64).copy()
        self._len = int(buffer_len) if buffer_len else self.rows.size
        if self._len < self.rows.size:
            raise ValueError("buffer_len smaller than the profile")
        self.t_dispatch = float(t_dispatch)
        self.rate = rate  # callable buffer_len -> samples/s, or None
        self._n_device = 0  # samples covered by dispatched rounds
        self.used = 0
        self.ride = 0
        self.padding = 0
        self.dispatched_slots = 0
        self.slots_by_bucket: dict[int, int] = {}
        self.n_dispatches = 0
        self.n_repacks = 0
        self.time = 0.0

    def buffer_len(self) -> int:
        return self._len

    def run_rounds(self, nb, step, n_rounds, n_samples_first, chunk_offset):
        nb, n_rounds = int(nb), int(n_rounds)
        ends = int(n_samples_first) + nb * np.arange(n_rounds, dtype=np.int64)
        # used rounds per row: boundaries at or before its freeze point
        used_rounds = np.searchsorted(ends, self.rows, side="right")
        self.used += int(nb * used_rounds.sum())
        self.ride += int(nb * (n_rounds * self.rows.size - used_rounds.sum()))
        self.padding += nb * n_rounds * (self._len - self.rows.size)
        slots = nb * n_rounds * self._len
        self.dispatched_slots += slots
        self.slots_by_bucket[self._len] = (
            self.slots_by_bucket.get(self._len, 0) + slots
        )
        self.n_dispatches += 1
        self.time += self.t_dispatch + (
            slots / self.rate(self._len) if self.rate else 0.0
        )
        self._n_device = int(ends[-1])
        return ("count", self._n_device)

    def start_transfer(self, handle) -> None:
        pass

    def resolve(self, handle) -> int:
        # done among real rows at the handle's boundary (the device sums
        # done&real after the run's LAST round — estimator.py num_done)
        return int((self.rows <= handle[1]).sum())

    def resolve_active(self, handle) -> int:
        return int(handle[1])

    def emit(self) -> None:
        pass

    def flush(self, n_samples) -> None:
        pass

    def pack(self, bucket):
        # The device packs on its CURRENT done flags (all dispatched
        # rounds have executed), not on the possibly-stale resolved count.
        bucket = int(bucket)
        active = self.rows[self.rows > self._n_device]
        if active.size > bucket:
            raise AssertionError(
                f"pack bucket {bucket} < active {active.size}: the "
                "stale-safe overestimate should make this impossible"
            )
        self.rows = active
        self._len = bucket
        self.n_repacks += 1
        return ("active", active.size)

    def progress(self, num_left, n_samples, rnd) -> None:
        pass

    def bookkeeping(self, n_samples, chunk_offset, num_real, rnd) -> None:
        pass


def simulate_schedule(
    n_frozen,
    cfg,
    *,
    impl: str = "pallas",
    t_dispatch: float = 0.0,
    rate=None,
    sync_samples: int | None = None,
    pipeline_work: int | None = None,
    eager_resolve: bool = False,
) -> dict:
    """Replay the production scheduler over a freeze-point profile.

    Returns a report dict: total dispatched ``slots`` and their
    used/ride/padding split, ``efficiency`` (used/slots), dispatch and
    repack counts, per-bucket slot histogram, and the modeled ``time``
    (0.0 unless ``t_dispatch``/``rate`` are given)."""
    ops = ProfileOps(n_frozen, t_dispatch=t_dispatch, rate=rate)
    kw = {}
    if sync_samples is not None:
        kw["sync_samples"] = sync_samples
    if pipeline_work is not None:
        kw["pipeline_work"] = pipeline_work
    sched = AdaptiveScheduler(
        cfg, ops, num_real=ops.rows.size, impl=impl,
        eager_resolve=eager_resolve, **kw
    )
    sched.run()
    return {
        "slots": ops.dispatched_slots,
        "used": ops.used,
        "ride": ops.ride,
        "padding": ops.padding,
        "efficiency": ops.used / ops.dispatched_slots
        if ops.dispatched_slots
        else 0.0,
        "dispatches": ops.n_dispatches,
        "repacks": ops.n_repacks,
        "slots_by_bucket": dict(sorted(ops.slots_by_bucket.items())),
        "time": ops.time,
        "n_samples": sched.n_samples,
    }
