"""The labeled-dataset pipeline: generate / relabel / ztest in ONE driver.

The reference ships three binaries whose device kernels are byte-identical
(diff-verified, SURVEY.md §2 #9) and whose mains differ only in where
configurations come from and where labels go:

  generate  (generate_dataset.cu:255-524)            sample configs, label, emit
  relabel   (compute_collision_probability.cu:152-379) load configs, re-label
  ztest     (ztest.cu:168-444)                        single file, fixed 10k/round

Here they are three thin entry points over one `_label_batch` core. Flag
names and defaults mirror the reference CLI exactly (SURVEY.md §2 #15).

TPU-first differences from the reference (all documented divergences):
- adaptive loop uses masked accumulation + halving-bucket repacking
  instead of thrust compaction (see mc.estimator);
- randomness is threefry (labels match statistically, not bitwise);
- the relabel first-round uninitialized-memory read
  (compute_collision_probability.cu:119 with d_cp never zeroed) and the
  double-normalization of the tail flush
  (compute_collision_probability.cu:325, ztest.cu:379) are fixed;
- the ztest shuffle flag shuffles what is actually written (the reference
  inverts the condition at ztest.cu:408-413, so its shuffle never affects
  the output; our default is therefore shuffle=False for ztest).
- host table sampling defaults to numpy RNG; `refcompat_tables=True`
  reproduces the reference's libstdc++ streams bit-for-bit via the native
  runtime (utils.native), yielding byte-identical poses.npy/variances.npy.
"""

from __future__ import annotations

import functools
import json
import math
import time
from dataclasses import dataclass, replace as _dc_replace
from pathlib import Path
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from collide2d_tpu.data import schemas
from collide2d_tpu.mc.estimator import (
    AdaptiveConfig,
    Configs,
    adaptive_collision_probabilities,
)
from collide2d_tpu.mc.noise import sample_configuration_batch
from collide2d_tpu.utils import native
from collide2d_tpu.utils.profiling import StepTimer, trace
from collide2d_tpu.utils.io_npy import (
    batch_path,
    get_num_batches_in_dir,
    load_npy,
    mkdirs,
    save_npy,
)

TWO_PI = 2.0 * math.pi


@dataclass(frozen=True)
class GenerateConfig:
    """Knobs of the dataset generator — names/defaults per
    generate_dataset.cu:44-64 (the reference's complete public API)."""

    data_dir: str = "./data/"
    pose_dir: str = ""
    variance_dir: str = ""
    num_batches: int = 100
    batch_size: int = 100_000
    start_batch_count: int = 0
    num_poses: int = 64**4
    num_variances: int = 64**4
    max_samples: int = 4_000_000
    min_variance: Sequence[float] = (0.0, 0.0, 0.0, 0.0, 0.0)
    max_variance: Sequence[float] = (0.3, 0.3, 0.3, 0.3, 0.3)
    min_pose: Sequence[float] = (0.1, 0.1, 0.0)
    max_pose: Sequence[float] = (5.0, 5.0, TWO_PI)
    accuracy_bins: Sequence[float] = (0.0, 0.01, 0.1, 1.0)
    bin_accuracy: Sequence[float] = (0.0001, 0.001, 0.01)
    robot_width: float = 4.07
    robot_height: float = 1.74
    spread: float = 4.0
    shape_variance: bool = False
    # --- extensions beyond the reference CLI ---
    seed: int | None = None  # device-PRNG seed (reference: time(0)-seeded curand)
    table_seed: int = 0  # host table RNG seed (reference: default-seeded engine)
    refcompat_tables: bool = False  # bit-identical libstdc++ table sampling
    shuffle: bool = True
    verbose: bool = True
    adaptive: AdaptiveConfig | None = None  # schedule override (tests)
    checkpoint_every: int = 0  # rounds between mid-batch checkpoints (0 = off)
    resume: bool = False  # skip batches whose files exist; resume mid-batch
    #   from checkpoint_{abs_batch}.npz, one per in-flight pipelined batch
    #   (requires a fixed --seed so keys reproduce)
    data_parallel: bool = False  # shard the config axis across all chips
    mesh: object = None  # explicit Mesh override (tests / custom topologies)
    schedule: object = None  # None = reference schedule | "tuned" | explicit tuple
    trace_dir: str = ""  # capture a jax.profiler trace of the run here
    # 0 = off (reference parity). >0: configurations that cannot collide
    # within this many noise std-devs are labeled cp=0 without sampling
    # (AdaptiveConfig.prune_sigma; label error ~1e-8 at 6.0) — skips the
    # ~37k-sample rule-of-three cost of every zero-probability row.
    prune_sigma: float = 0.0
    # 'auto' (pallas on TPU, jnp elsewhere; jnp under a mesh for bitwise
    # DP) | 'jnp' | 'pallas' — see AdaptiveConfig.impl.
    impl: str = "auto"
    # Repack bucket ladder: "eighth" (default; finest rungs — least
    # padding and the tightest converged-row-riding bound) | "quarter" |
    # "half" (fewer compiled shapes) — AdaptiveConfig.ladder.
    ladder: str = "eighth"
    # Cross-batch pipelining: up to this many batches labeled in flight
    # at once. When batch i's active pool shrinks into its tail, batch
    # i+1's configurations are sampled and its (big, efficient) rounds
    # interleave with the tail's — the device never idles across the
    # batch boundary. Results are BITWISE identical to the serial loop
    # (each batch keeps its own fold_in key and an untouched scheduler
    # trajectory; interleaving only reorders dispatch). 3 (measured
    # best: a third in-flight batch hides the stalls the second cannot,
    # +1-2% over 2) | 1 = the reference's strictly serial batch loop
    # (generate_dataset.cu:418-505).
    overlap_batches: int = 3

    @property
    def robot_wh(self) -> tuple[float, float]:
        return (self.robot_width, self.robot_height)

    @property
    def r_offset(self) -> float:
        # generate_dataset.cu:398
        return (self.robot_width + self.robot_height) / 4.0


@dataclass(frozen=True)
class RelabelConfig:
    """compute_collision_probability.cu:35-42 flag set."""

    data_in: str = "./data_in/"
    data_out: str = "./data_out/"
    max_samples: int = 4_000_000
    robot_width: float = 4.07
    robot_height: float = 1.74
    shuffle: bool = True
    seed: int | None = None
    verbose: bool = True
    adaptive: AdaptiveConfig | None = None
    data_parallel: bool = False
    trace_dir: str = ""  # capture a jax.profiler trace of the run here
    # Shard each configuration's sample budget across this many devices
    # (same semantics as ZTestConfig.sample_parallel: bitwise-identical
    # labels; builds a (1, s) mesh; ignored when data_parallel/mesh set).
    sample_parallel: int = 0
    mesh: object = None  # explicit Mesh override (tests / custom topologies)
    impl: str = "auto"
    # Full AdaptiveConfig capability parity with generate (review r2
    # finding: a 100-batch relabel used to be stuck with the untuned
    # schedule, no pruning, and batch-level resume only):
    schedule: object = None  # None = reference schedule | "tuned" | tuple
    prune_sigma: float = 0.0  # see GenerateConfig.prune_sigma
    ladder: str = "eighth"  # see GenerateConfig.ladder
    checkpoint_every: int = 0  # rounds between mid-batch checkpoints
    resume: bool = False  # skip already-written output batches + resume
    #   mid-batch from per-batch checkpoint files (named by the ABSOLUTE
    #   output index: checkpoint_{start_batch_count + i}.npz; requires a
    #   fixed --seed; output numbering is pinned by a .relabel_start
    #   marker so a resumed run continues the SAME append window instead
    #   of appending again)
    # Cross-batch pipelining depth (same contract as
    # GenerateConfig.overlap_batches): batch i+1's big rounds interleave
    # with batch i's convergence tail. Threefry labels are bitwise-
    # independent of the depth (per-batch fold_in keys).
    overlap_batches: int = 3

    @property
    def robot_wh(self) -> tuple[float, float]:
        return (self.robot_width, self.robot_height)


@dataclass(frozen=True)
class ZTestConfig:
    """ztest.cu:37-47 flag set. NOTE: shuffle defaults to False here —
    the reference's inverted shuffle (ztest.cu:408-413) never shuffles
    the written artifact, and an unshuffled output preserves the row
    correspondence the z-test comparison needs."""

    data_dir: str = "./data/"
    data_file_in: str = ""
    data_file_out: str = ""
    max_samples: int = 4_000_000
    robot_width: float = 4.07
    robot_height: float = 1.74
    shuffle: bool = False
    cps_only: bool = False
    meta_dir: str = ""
    seed: int | None = None
    verbose: bool = True
    n_batch: int = 10_000  # fixed per-round budget (ztest.cu:332)
    adaptive: AdaptiveConfig | None = None
    # Shard the per-config sample budget (up to max_samples=4e6/pair,
    # ztest.cu:332 + generate_dataset.cu:53) across this many devices:
    # sample STEPS round-robin over a (1, sample_parallel) mesh and the
    # per-round psum'd counts are BITWISE equal to single-device labels
    # (estimator._sample_sharded_counts). Must divide n_batch. 0 = off.
    sample_parallel: int = 0
    mesh: object = None  # explicit Mesh override (tests / custom topologies)
    trace_dir: str = ""  # capture a jax.profiler trace of the run here
    impl: str = "auto"
    # AdaptiveConfig capability parity with generate (review r2 finding):
    schedule: object = None  # None = reference (fixed n_batch) | "tuned" | tuple
    prune_sigma: float = 0.0  # see GenerateConfig.prune_sigma
    ladder: str = "eighth"  # see GenerateConfig.ladder
    # Mid-run checkpoints every N rounds to data_dir/ztest_checkpoint.npz;
    # a rerun with the same --seed auto-resumes from it (key-validated).
    checkpoint_every: int = 0

    @property
    def robot_wh(self) -> tuple[float, float]:
        return (self.robot_width, self.robot_height)


def _log(cfg, *msg):
    if cfg.verbose:
        print(*msg, flush=True)


def _progress_logger(cfg, total: int):
    """A StepTimer-backed progress callback for the adaptive driver.

    Emits one structured line per host sync — round, active set, done
    count, cumulative sampling throughput — the structured upgrade of the
    reference's printf progress (generate_dataset.cu:501-504). Returns
    None when not verbose (zero overhead)."""
    if not cfg.verbose:
        return None
    timer = StepTimer(log_every=1)
    last = {"n_samples": 0, "active": total}

    def cb(*, num_left: int, n_samples: int, round: int) -> None:
        timer.rounds = round - 1  # StepTimer increments to the true count
        timer.round_done(
            n_batch=n_samples - last["n_samples"],
            active=last["active"],
            done_total=total - num_left,
        )
        last["n_samples"] = n_samples
        last["active"] = num_left

    return cb


def _mesh_for(cfg) -> "object | None":
    """The mesh a driver config asks for: explicit > data-parallel
    (all-config) > sample-parallel ((1, s), bitwise-equal labels)."""
    if getattr(cfg, "mesh", None) is not None:
        return cfg.mesh
    from collide2d_tpu.parallel import make_mesh

    if getattr(cfg, "data_parallel", False):
        if len(jax.devices()) < 2:
            return None
        return make_mesh()
    s = getattr(cfg, "sample_parallel", 0)
    if s and s > 1:
        devices = jax.devices()
        if len(devices) < s:
            raise ValueError(
                f"sample_parallel={s} needs that many devices, have "
                f"{len(devices)}"
            )
        return make_mesh(devices[:s], sample_axis=s)
    return None


def _master_key(seed: int | None) -> jax.Array:
    if seed is None:
        seed = int(time.time_ns() % (2**31))  # reference: srand(time(0))
    return jax.random.PRNGKey(seed)


def _sample_tables(cfg: GenerateConfig) -> tuple[np.ndarray, np.ndarray]:
    """Host-side pose/variance table sampling (generate_dataset.cu:282-336)."""
    min_var = np.asarray(cfg.min_variance, np.float32).copy()
    max_var = np.asarray(cfg.max_variance, np.float32).copy()
    if not cfg.shape_variance:
        # generate_dataset.cu:285-290: zero the width/height noise dims.
        min_var[3:5] = 0.0
        max_var[3:5] = 0.0
    if cfg.refcompat_tables and native.available():
        # One shared engine, variances first then poses — the exact
        # stream interleaving of the reference main.
        eng = native.RefEngine(None if cfg.table_seed == 0 else cfg.table_seed)
        variances = eng.uniform_table(cfg.num_variances, min_var, max_var)
        poses = eng.uniform_table(cfg.num_poses, cfg.min_pose, cfg.max_pose)
    else:
        rng = np.random.default_rng(cfg.table_seed)
        variances = rng.uniform(
            min_var, max_var, (cfg.num_variances, 5)
        ).astype(np.float32)
        poses = rng.uniform(
            np.asarray(cfg.min_pose, np.float32),
            np.asarray(cfg.max_pose, np.float32),
            (cfg.num_poses, 3),
        ).astype(np.float32)
    return poses, variances


def _adaptive_config(cfg, fixed_batch=None) -> AdaptiveConfig:
    if cfg.adaptive is not None:
        return cfg.adaptive
    if getattr(cfg, "schedule", None) == "opt":
        raise ValueError(
            "schedule='opt' must be resolved to explicit checkpoints "
            "before AdaptiveConfig construction — the generate and "
            "relabel drivers do this with a cp-distribution probe of "
            "their workload; other callers should pass an explicit "
            "checkpoint tuple or 'tuned'"
        )
    kwargs = dict(max_samples=cfg.max_samples)
    if hasattr(cfg, "accuracy_bins"):
        kwargs["accuracy_bins"] = tuple(cfg.accuracy_bins)
        kwargs["bin_accuracy"] = tuple(cfg.bin_accuracy)
    if getattr(cfg, "schedule", None) is not None:
        kwargs["schedule"] = cfg.schedule
    if getattr(cfg, "prune_sigma", 0.0):
        kwargs["prune_sigma"] = cfg.prune_sigma
    kwargs["ladder"] = getattr(cfg, "ladder", "eighth")
    if getattr(cfg, "impl", "auto") != "auto":
        kwargs["impl"] = cfg.impl
    if fixed_batch is not None:
        kwargs["fixed_batch"] = fixed_batch
    return AdaptiveConfig(**kwargs)


def _check_table_idx(idx, table_len: int, name: str) -> None:
    """Loud host-side bounds check before a device gather: jnp.take
    fills out-of-range indices with NaN instead of raising (unlike the
    numpy fancy-index it replaced), which would flow NaN rows through
    the sampler and write silently-wrong labels for table-mismatched or
    corrupt relabel inputs."""
    idx = np.asarray(idx)
    if idx.size and (idx.min() < 0 or idx.max() >= table_len):
        raise ValueError(
            f"{name} index out of range [0, {table_len}): input rows "
            f"reference rows {idx.min()}..{idx.max()} — the input was "
            "generated against different tables than data_out's?"
        )


def _batch_configs(positions, pose_idx, var_idx, poses, std_devs) -> Configs:
    """Device-resident Configs assembly for the pipelined relabel.

    Gathers the table rows ON DEVICE (bit-identical float32 rows; a
    gather computes nothing): at the production 64^4 table sizes the
    host fancy-index alternative costs ~1.5 s per 100k batch of
    GIL-holding work. Callers pass device-resident tables (jnp.asarray
    once per run) to avoid re-uploading 536 MB per batch, and must
    bounds-check the indices first (`_check_table_idx`).
    """
    pose_cols = jnp.take(
        jnp.asarray(poses, jnp.float32),
        jnp.asarray(pose_idx, jnp.int32), axis=0)
    return Configs(
        position=jnp.asarray(positions, jnp.float32),
        pose_theta=pose_cols[:, 2],
        obstacle_wh=pose_cols[:, 0:2],
        std_dev=jnp.take(
            jnp.asarray(std_devs, jnp.float32),
            jnp.asarray(var_idx, jnp.int32), axis=0),
    )


def _label_batch(
    key: jax.Array,
    positions: np.ndarray,
    pose_idx: np.ndarray,
    var_idx: np.ndarray,
    poses: np.ndarray,
    std_devs: np.ndarray,
    robot_wh,
    adaptive: AdaptiveConfig,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    mesh=None,
    progress=None,
) -> np.ndarray:
    """Label one batch of configurations (ztest's single-file core;
    relabel streams its batches through `run_interleaved` instead).

    Output rows come back in INPUT order (the uid bookkeeping inside
    `adaptive_collision_probabilities` plays the role of the reference's
    device-side index column, compute_collision_probability.cu:337-344).

    Tables are gathered on the HOST here: ztest labels ONE file, so a
    host fancy-index of its rows (<= ~1.5 s even at 100k rows) beats
    uploading the full 536 MB production tables to gather a sliver.
    The many-batch relabel path amortizes a one-time device upload
    instead (`_batch_configs`). Bounds are checked explicitly: numpy
    raises only for indices >= len, while NEGATIVE decoded indices
    (corrupt/table-mismatched input) would silently wrap to the tail
    rows and label the wrong configurations.
    """
    pose_idx = np.asarray(pose_idx, np.int64)
    var_idx = np.asarray(var_idx, np.int64)
    poses = np.asarray(poses, np.float32)
    std_devs = np.asarray(std_devs, np.float32)
    _check_table_idx(pose_idx, len(poses), "pose_idx")
    _check_table_idx(var_idx, len(std_devs), "var_idx")
    pose_rows = poses[pose_idx]
    configs = Configs(
        position=jnp.asarray(positions, jnp.float32),
        pose_theta=jnp.asarray(pose_rows[:, 2]),
        obstacle_wh=jnp.asarray(pose_rows[:, 0:2]),
        std_dev=jnp.asarray(std_devs[var_idx]),
    )
    cp, _, _ = adaptive_collision_probabilities(
        key, configs, robot_wh, adaptive,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        mesh=mesh, progress=progress,
    )
    return schemas.pack_dataset_rows(positions, cp, var_idx, pose_idx)


def _shuffle_rows(rows: np.ndarray, enabled: bool) -> np.ndarray:
    """Batch shuffle with the reference's fixed seed-0 engine
    (generate_dataset.cu:496) — bit-identical order via the native
    runtime when available."""
    if not enabled:
        return rows
    return rows[native.std_shuffle_perm(len(rows), 0)]


def _pending_batches(cfg, num_batches: int, target_of) -> list[int]:
    """Batch indices still to label (resume skips existing outputs)."""
    pending = []
    for batch_index in range(num_batches):
        target = target_of(batch_index)
        if cfg.resume and target.exists():
            _log(cfg, f"resume: skipping existing {target.name}")
            continue
        pending.append(batch_index)
    return pending


def _interleaved_finish(cfg, writer, state, num_batches: int, begin: float):
    """The shared `run_interleaved` on_done callback of generate and
    relabel: materialize -> pack (input order) -> shuffle -> async write
    -> progress line. ``state['done']`` counts completed batches."""
    def _finish(tag, run):
        cp, _, _ = run.materialize()
        rows = schemas.pack_dataset_rows(
            tag["positions"], cp, tag["var_idx"], tag["pose_idx"]
        )
        rows = _shuffle_rows(rows, cfg.shuffle)
        writer.submit(tag["target"], rows)
        state["done"] += 1
        mins = (time.monotonic() - begin) / 60.0
        _log(cfg, f"batches generated: {state['done']}/{num_batches}, "
                  f"Time: {mins:.1f} [min]")
    return _finish


# ---------------------------------------------------------------------------
# Mode 1: generate (generate_dataset.cu main)
# ---------------------------------------------------------------------------

def generate_dataset(cfg: GenerateConfig) -> None:
    data_dir = mkdirs(cfg.data_dir)
    _log(cfg, f"data dir: {cfg.data_dir}")
    _log(cfg, f"num batches: {cfg.num_batches}")
    _log(cfg, f"num batch: {cfg.batch_size}")
    _log(cfg, f"start batch count: {cfg.start_batch_count}")

    # Pose/variance tables: sample or reuse (generate_dataset.cu:282-336).
    if cfg.variance_dir:
        variances = schemas.validate_variances(load_npy(cfg.variance_dir))
    else:
        variances = None
    if cfg.pose_dir:
        poses = schemas.validate_poses(load_npy(cfg.pose_dir))
    else:
        poses = None
    if poses is None or variances is None:
        sampled_poses, sampled_variances = _sample_tables(cfg)
        if variances is None:
            variances = sampled_variances
            save_npy(data_dir / "variances.npy", variances)
        if poses is None:
            poses = sampled_poses
            save_npy(data_dir / "poses.npy", poses)
    std_devs = np.sqrt(variances)  # generate_dataset.cu:310-317

    _log(cfg, f"num poses: {len(poses)}")
    _log(cfg, f"num variances: {len(variances)}")

    # Meta artifacts (generate_dataset.cu:346-352).
    save_npy(data_dir / "meta" / "accuracy_bins.npy",
             np.asarray(cfg.accuracy_bins, np.float32))
    save_npy(data_dir / "meta" / "bin_accuracy.npy",
             np.asarray(cfg.bin_accuracy, np.float32))

    key = _master_key(cfg.seed)
    poses_j = jnp.asarray(poses)
    std_devs_j = jnp.asarray(std_devs)

    if getattr(cfg, "schedule", None) == "opt":
        # Measured-distribution schedule: probe the workload's cps with
        # one cheap fixed-budget pass, then DP-optimize checkpoint
        # placement (mc.schedule_sim). Checkpoints only move WHERE the
        # per-bin CI criterion is tested — labels keep the exact same
        # guarantee as 'reference'/'tuned'.
        from collide2d_tpu.mc.estimator import collision_probability
        from collide2d_tpu.mc.schedule_sim import (
            min_convergence_points,
            optimize_checkpoints,
        )

        probe_key = jax.random.fold_in(key, 0x5EED)
        n_probe = int(min(16384, cfg.batch_size))
        positions, _, _, pose_cols, sd_rows = sample_configuration_batch(
            probe_key, poses_j, std_devs_j, num_configs=n_probe,
            r_offset=cfg.r_offset, spread=cfg.spread,
        )
        probe_cfgs = Configs(
            position=positions,
            pose_theta=pose_cols[:, 2],
            obstacle_wh=pose_cols[:, 0:2],
            std_dev=sd_rows,
        )
        est_cp = np.asarray(jax.device_get(collision_probability(
            jax.random.fold_in(probe_key, 1), probe_cfgs,
            jnp.asarray([cfg.robot_width, cfg.robot_height], jnp.float32),
            1 << 14,
        )), np.float64)
        base = _adaptive_config(_dc_replace(cfg, schedule=None))
        n_min, _ = min_convergence_points(est_cp, base, seed=0)
        pts = optimize_checkpoints(n_min, base)
        _log(cfg, f"opt schedule: {len(pts)} checkpoints from a "
                  f"{n_probe}-config cp probe: {list(pts)[:8]}...")
        cfg = _dc_replace(cfg, schedule=tuple(pts))

    adaptive = _adaptive_config(cfg)

    _log(cfg, f"Total number of configurations: {cfg.batch_size * cfg.num_batches}")
    _log(cfg, "Begin computation...")
    begin = time.monotonic()
    overlap = max(1, int(getattr(cfg, "overlap_batches", 1) or 1))
    mesh = _mesh_for(cfg)
    from collide2d_tpu.mc.driver import AdaptiveRun, run_interleaved

    pending = _pending_batches(
        cfg, cfg.num_batches,
        lambda i: batch_path(data_dir, cfg.start_batch_count + i),
    )
    progress_state = {"done": cfg.num_batches - len(pending), "first": True}

    def _start(batch_index: int):
        abs_index = cfg.start_batch_count + batch_index
        bkey = jax.random.fold_in(key, abs_index)
        k_init, k_mc = jax.random.split(bkey)
        # Device-resident config assembly, ONE compiled program: draws,
        # the 16.7M-row table gathers, and the Configs columns never
        # leave the device (a gather computes nothing, so the rows are
        # bit-identical to a host-numpy fancy-index). The previous eager
        # path measured ~1.5 s per 100k batch: host fancy-indexes of the
        # 201 MB poses + 335 MB std_devs production tables, D2H/H2D
        # round trips of the sampled columns, and ~12 op-by-op remote
        # dispatches. The host only needs positions/indices at PACK
        # time: start that copy asynchronously and consume it in
        # _finish, off the critical path.
        positions, pose_idx, var_idx, pose_cols, sd_rows = (
            sample_configuration_batch(
                k_init, poses_j, std_devs_j, num_configs=cfg.batch_size,
                r_offset=cfg.r_offset, spread=cfg.spread,
            )
        )
        configs = Configs(
            position=positions,
            pose_theta=pose_cols[:, 2],
            obstacle_wh=pose_cols[:, 0:2],
            std_dev=sd_rows,
        )
        for a in (positions, pose_idx, var_idx):
            try:
                a.copy_to_host_async()
            except AttributeError:  # plain numpy under tests/fakes
                pass
        run = AdaptiveRun(
            k_mc, configs, cfg.robot_wh, adaptive,
            checkpoint_path=(
                # One checkpoint file PER in-flight batch (numeric batch
                # stems are unaffected: get_num_batches_in_dir counts
                # numeric names only, and balance skips checkpoint*).
                data_dir / f"checkpoint_{abs_index}.npz"
                if cfg.checkpoint_every else None
            ),
            checkpoint_every=cfg.checkpoint_every,
            mesh=mesh,
            progress=_progress_logger(cfg, cfg.batch_size),
            # Warm the compile ladder once per process, not once per
            # batch (every batch shares the same bucket shapes).
            warmup=None if progress_state["first"] else False,
        )
        progress_state["first"] = False
        tag = dict(
            target=batch_path(data_dir, abs_index),
            positions=positions, pose_idx=pose_idx, var_idx=var_idx,
        )
        return tag, run

    with native.AsyncNpyWriter() as writer, trace(cfg.trace_dir or None):
        run_interleaved(
            [functools.partial(_start, i) for i in pending], overlap,
            _interleaved_finish(cfg, writer, progress_state,
                                cfg.num_batches, begin),
        )
        errors = writer.flush()
        if errors:
            raise IOError(f"{errors} batch file(s) failed to write")
    _log(cfg, "Finished computation")


# ---------------------------------------------------------------------------
# Mode 2: relabel (compute_collision_probability.cu main)
# ---------------------------------------------------------------------------

def relabel_dataset(cfg: RelabelConfig) -> None:
    data_in = Path(cfg.data_in)
    data_out = mkdirs(cfg.data_out)
    # Output numbering resumes after existing batches
    # (compute_collision_probability.cu:157). With --resume the first
    # run's append window is pinned in a marker file: a rerun must SKIP
    # its already-written outputs, not append a second copy after them
    # (get_num_batches_in_dir would otherwise count them as preexisting).
    start_batch_count = get_num_batches_in_dir(data_out)
    num_batches = get_num_batches_in_dir(data_in)
    # The marker carries the run's identity: a marker left by a killed
    # resume run against a DIFFERENT input/seed must not pin this run's
    # append window (it would skip every output batch as "already
    # written" — silent data loss). Stale/foreign markers are ignored
    # and overwritten; ANY clean finish removes the marker.
    marker = data_out / ".relabel_start"
    identity = {"data_in": str(Path(cfg.data_in).resolve()),
                "seed": int(cfg.seed), "num_batches": int(num_batches)}
    if cfg.resume:
        pinned = None
        if marker.exists():
            try:
                saved = json.loads(marker.read_text())
                if (isinstance(saved, dict)
                        and {k: saved.get(k) for k in identity} == identity):
                    pinned = int(saved["start"])
            except (ValueError, KeyError, OSError):
                pinned = None  # pre-identity or corrupt marker: stale
        if pinned is None:
            marker.write_text(json.dumps({"start": start_batch_count,
                                          **identity}))
        else:
            start_batch_count = pinned

    _log(cfg, "Reading data...")
    poses = schemas.validate_poses(load_npy(data_out / "poses.npy"))
    variances = schemas.validate_variances(load_npy(data_out / "variances.npy"))
    accuracy_bins = load_npy(data_out / "meta" / "accuracy_bins.npy")
    bin_accuracy = load_npy(data_out / "meta" / "bin_accuracy.npy")
    std_devs = np.sqrt(variances)

    _log(cfg, f"num poses: {len(poses)}")
    _log(cfg, f"num variances: {len(variances)}")

    if cfg.schedule == "opt":
        # Measured-distribution DP schedule, relabel flavor: the input
        # rows ARE the workload, so the cp probe runs on the first
        # input batch's configurations (same criterion-preserving
        # contract as generate's 'opt').
        from collide2d_tpu.mc.estimator import collision_probability
        from collide2d_tpu.mc.schedule_sim import (
            min_convergence_points,
            optimize_checkpoints,
        )

        rows0 = load_npy(batch_path(data_in, 0))
        pos0, vidx0, pidx0 = schemas.unpack_relabel_rows(rows0)
        n_probe = int(min(16384, len(pos0)))
        pidx0 = np.asarray(pidx0, np.int64)[:n_probe]
        vidx0 = np.asarray(vidx0, np.int64)[:n_probe]
        _check_table_idx(pidx0, len(poses), "pose_idx")
        _check_table_idx(vidx0, len(std_devs), "var_idx")
        probe_cfgs = _batch_configs(
            pos0[:n_probe], pidx0, vidx0,
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(std_devs, jnp.float32),
        )
        est_cp = np.asarray(jax.device_get(collision_probability(
            jax.random.fold_in(_master_key(cfg.seed), 0x5EED), probe_cfgs,
            jnp.asarray(cfg.robot_wh, jnp.float32), 1 << 14,
        )), np.float64)
        base = AdaptiveConfig(
            accuracy_bins=tuple(float(x) for x in accuracy_bins),
            bin_accuracy=tuple(float(x) for x in bin_accuracy),
            max_samples=cfg.max_samples,
        )
        n_min, _ = min_convergence_points(est_cp, base, seed=0)
        pts = optimize_checkpoints(n_min, base)
        _log(cfg, f"opt schedule: {len(pts)} checkpoints from a "
                  f"{n_probe}-row cp probe of the first input batch")
        cfg = _dc_replace(cfg, schedule=tuple(pts))

    adaptive = cfg.adaptive or AdaptiveConfig(
        accuracy_bins=tuple(float(x) for x in accuracy_bins),
        bin_accuracy=tuple(float(x) for x in bin_accuracy),
        max_samples=cfg.max_samples,
        impl=cfg.impl,
        schedule=cfg.schedule,
        prune_sigma=cfg.prune_sigma,
        ladder=cfg.ladder,
    )
    key = _master_key(cfg.seed)
    mesh = _mesh_for(cfg)
    overlap = max(1, int(getattr(cfg, "overlap_batches", 1) or 1))
    from collide2d_tpu.mc.driver import AdaptiveRun, run_interleaved

    pending = _pending_batches(
        cfg, num_batches,
        lambda i: batch_path(data_out, start_batch_count + i),
    )
    state = {"done": num_batches - len(pending), "first": True,
             "poses_j": None, "std_devs_j": None}

    def _start(batch_index: int):
        # Cross-batch pipelining, same shape as generate_dataset: batch
        # i+1's big rounds fill the chip while batch i's convergence
        # tail drains (the reference relabels batches strictly serially,
        # compute_collision_probability.cu:259-360). The input-file read
        # + device gathers below run on run_interleaved's prefetch
        # thread, off the device's critical path. Labels are keyed by
        # fold_in(key, batch_index) exactly like the serial path, so on
        # the threefry path they are bitwise-independent of the overlap
        # depth.
        if state["poses_j"] is None:  # device-resident tables, uploaded once
            state["poses_j"] = jnp.asarray(poses, jnp.float32)
            state["std_devs_j"] = jnp.asarray(std_devs, jnp.float32)
        abs_index = start_batch_count + batch_index
        rows_in = load_npy(batch_path(data_in, batch_index))
        positions, var_idx, pose_idx = schemas.unpack_relabel_rows(rows_in)
        pose_idx = np.asarray(pose_idx, np.int64)
        var_idx = np.asarray(var_idx, np.int64)
        _check_table_idx(pose_idx, len(poses), "pose_idx")
        _check_table_idx(var_idx, len(std_devs), "var_idx")
        configs = _batch_configs(
            positions, pose_idx, var_idx, state["poses_j"], state["std_devs_j"]
        )
        run = AdaptiveRun(
            jax.random.fold_in(key, batch_index), configs, cfg.robot_wh,
            adaptive,
            checkpoint_path=(
                # One checkpoint file PER in-flight batch, like generate
                # (numeric batch stems unaffected; balance skips
                # checkpoint*).
                data_out / f"checkpoint_{abs_index}.npz"
                if cfg.checkpoint_every else None
            ),
            checkpoint_every=cfg.checkpoint_every,
            mesh=mesh,
            progress=_progress_logger(cfg, len(positions)),
            # Warm the compile ladder once per process, not per batch.
            warmup=None if state["first"] else False,
        )
        state["first"] = False
        tag = dict(target=batch_path(data_out, abs_index),
                   positions=positions, pose_idx=pose_idx, var_idx=var_idx)
        return tag, run

    _log(cfg, "Begin computation...")
    begin = time.monotonic()
    with native.AsyncNpyWriter() as writer, trace(cfg.trace_dir or None):
        run_interleaved(
            [functools.partial(_start, i) for i in pending], overlap,
            _interleaved_finish(cfg, writer, state, num_batches, begin),
        )
        errors = writer.flush()
        if errors:
            raise IOError(f"{errors} batch file(s) failed to write")
    if marker.exists():
        marker.unlink()  # clean finish: next relabel appends afresh
    _log(cfg, "Finished computation")


# ---------------------------------------------------------------------------
# Mode 3: ztest (ztest.cu main) — high-precision validation of one file
# ---------------------------------------------------------------------------

def ztest(cfg: ZTestConfig) -> np.ndarray:
    data_dir = Path(cfg.data_dir)
    if not data_dir.exists():
        raise FileNotFoundError(f"data_dir {data_dir} does not exist")

    # Default meta bins written when absent (ztest.cu:186-194).
    if cfg.meta_dir:
        meta_dir = Path(cfg.meta_dir)
    else:
        meta_dir = data_dir / "meta"
        mkdirs(meta_dir)
        if not (meta_dir / "accuracy_bins.npy").exists():
            save_npy(meta_dir / "accuracy_bins.npy",
                     np.asarray([0.0, 0.01, 0.1, 1.0], np.float32))
            save_npy(meta_dir / "bin_accuracy.npy",
                     np.asarray([0.0001, 0.001, 0.01], np.float32))
    data_file_in = Path(cfg.data_file_in) if cfg.data_file_in else data_dir / "tmp" / "0.npy"
    data_file_out = Path(cfg.data_file_out) if cfg.data_file_out else data_dir / "0.npy"
    if not cfg.data_file_in:
        _log(cfg, f"Using default input file: {data_file_in}")
    if not cfg.data_file_out:
        _log(cfg, f"Using default output file: {data_file_out}")
    if data_file_out.exists():
        _log(cfg, f"Warning: {data_file_out} already exists, will be overwritten")

    poses = schemas.validate_poses(load_npy(data_dir / "poses.npy"))
    variances = schemas.validate_variances(load_npy(data_dir / "variances.npy"))
    accuracy_bins = load_npy(meta_dir / "accuracy_bins.npy")
    bin_accuracy = load_npy(meta_dir / "bin_accuracy.npy")
    std_devs = np.sqrt(variances)

    rows_in = load_npy(data_file_in)
    positions, var_idx, pose_idx = schemas.unpack_relabel_rows(rows_in)
    _log(cfg, f"num poses: {len(poses)}")
    _log(cfg, f"num variances: {len(variances)}")
    _log(cfg, f"num data points: {len(positions)}")

    # ztest.cu:332 fixes 10k samples per round; an explicit --schedule
    # replaces that fixed cadence with the adaptive one (fixed_batch wins
    # over schedule inside AdaptiveConfig.batch_for, so it must be
    # dropped here for the schedule to take effect).
    if cfg.schedule == "opt":
        raise ValueError(
            "schedule='opt' is a generate/relabel feature (they probe a "
            "whole workload's cp distribution); ztest validates ONE file "
            "at a fixed cadence — pass an explicit checkpoint tuple or "
            "'tuned' to change it"
        )
    adaptive = cfg.adaptive or AdaptiveConfig(
        accuracy_bins=tuple(float(x) for x in accuracy_bins),
        bin_accuracy=tuple(float(x) for x in bin_accuracy),
        max_samples=cfg.max_samples,
        fixed_batch=None if cfg.schedule is not None else cfg.n_batch,
        impl=cfg.impl,
        schedule=cfg.schedule,
        prune_sigma=cfg.prune_sigma,
        ladder=cfg.ladder,
    )
    mesh = cfg.mesh
    if mesh is None and cfg.sample_parallel and cfg.sample_parallel > 1:
        if cfg.n_batch % cfg.sample_parallel:
            raise ValueError(
                f"sample_parallel={cfg.sample_parallel} must divide "
                f"n_batch={cfg.n_batch}"
            )
        devices = jax.devices()
        if len(devices) < cfg.sample_parallel:
            raise ValueError(
                f"sample_parallel={cfg.sample_parallel} needs that many "
                f"devices, have {len(devices)}"
            )
        from collide2d_tpu.parallel import make_mesh

        # Pure sample sharding: a (config=1, sample=s) mesh — the deep
        # per-pair budget is the scaling axis here, and config=1 keeps
        # arbitrary row counts shardable.
        mesh = make_mesh(
            devices[: cfg.sample_parallel], sample_axis=cfg.sample_parallel
        )
    with trace(cfg.trace_dir or None):
        rows = _label_batch(
            _master_key(cfg.seed), positions, pose_idx, var_idx,
            poses, std_devs, cfg.robot_wh, adaptive, mesh=mesh,
            checkpoint_path=(
                data_dir / "ztest_checkpoint.npz" if cfg.checkpoint_every
                else None
            ),
            checkpoint_every=cfg.checkpoint_every,
            progress=_progress_logger(cfg, len(positions)),
        )
    if cfg.cps_only:
        out = rows[:, 2].copy()  # bare cp vector (ztest.cu:391-396,418-420)
    else:
        out = rows
    if cfg.shuffle:
        out = out[native.std_shuffle_perm(len(out), 0)]
    save_npy(data_file_out, out)
    _log(cfg, "Finished computation")
    return out
