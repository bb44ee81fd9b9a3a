"""Learned collision-probability model — the dataset's downstream purpose.

The reference exists to make TRAINING DATA for a learned model of
robot-vs-obstacle collision probability (its own header:
generate_dataset.cu:30-36 — "creates a dataset of collision
probabilities … using Monte Carlo sampling"); the reference repo stops
at the dataset. This module closes the loop TPU-natively:

  - **features** (13 per row): the physical quantities a dataset row
    references — robot position (x, y), obstacle (width, height),
    robot angle as (cos θ, sin θ), and the five noise std-devs — i.e.
    exactly the inputs the MC labeler consumed, with table indices
    resolved through poses.npy / variances.npy (schema:
    data/schemas.py) — PLUS the framework's own physics (round 4,
    review r3 #4): the exact signed distance between robot and
    obstacle at the MEAN pose (`ops.distance` closed form — one
    deterministic query per row, nearly a sufficient statistic for
    cp) and its σ-scaled margin (distance in units of the combined
    noise scale, the argument a Gaussian-tail approximation of cp
    would take). Standardized by train-set mean/std (stored with the
    model).
  - **model**: an MLP with bfloat16 matmuls accumulating in float32
    (`preferred_element_type`) — the MXU's native regime — and float32
    parameters/optimizer state. One logit out; sigmoid → cp.
  - **training**: soft-label binary cross-entropy (cp targets are
    probabilities, BCE is the proper scoring rule), optax AdamW, and
    ONE jit-compiled program per EPOCH: `lax.scan` over shuffled
    minibatches with donated (params, opt state). Per-step dispatch
    would cost ~10 ms/step through this image's tunnel; the scan makes
    an epoch a single device program.
  - **data parallelism**: batch axis sharded over local devices with a
    `NamedSharding`; parameters replicated; XLA inserts the gradient
    all-reduce. The same GSPMD story as the labeler's config axis.

`collide2d train` fits a model from a generated dataset directory;
`collide2d predict` writes a bare cps vector (the ztest `--cps_only`
schema, data/schemas.py) so `collide2d compare` can z-score the model
against MC labels — the model plugs into the same acceptance harness
as the labelers.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

NUM_FEATURES = 13
# The reference's default robot (generate_dataset.cu robot_width /
# robot_height defaults, mirrored by GenerateConfig) — the physics
# features are computed against this unless the caller passes its own.
ROBOT_WH = (4.07, 1.74)


# ---------------------------------------------------------------------------
# Features


def _physics_cols(x, y, cos_t, sin_t, obs_w, obs_h, sd, robot_wh):
    """The framework's own physics as features: (N, 2) jnp columns.

    Column 0 — EXACT signed distance between the robot box at its mean
    pose (center (x, y), angle theta) and the obstacle box at the
    origin (`ops.distance_pallas.obb_signed_distance_tile`, the same
    closed form the trajectory sampler advances on). Negative inside:
    the deterministic label's witness, and nearly a sufficient
    statistic for cp at small noise.

    Column 1 — the sigma-scaled margin: distance divided by the
    combined noise scale (positional sigmas in quadrature + the
    obstacle circumradius times sigma_theta + half the shape sigmas in
    quadrature — the first-order bound on how far noise moves the
    gap). This is the argument a Gaussian-tail approximation of cp
    would take; clipped to +-40 (beyond that cp is saturated and the
    raw value only skews standardization).

    Shared verbatim by `featurize` (tables path) and
    `LearnedCollisionModel.cp_from_configs` (surrogate path) so both
    produce bit-identical features.
    """
    rw = jnp.float32(abs(float(robot_wh[0])) * 0.5)
    rh = jnp.float32(abs(float(robot_wh[1])) * 0.5)
    from collide2d_tpu.ops.distance_pallas import obb_signed_distance_tile

    d = obb_signed_distance_tile(
        -x, -y, cos_t, sin_t, rw, rh,
        jnp.float32(1.0), jnp.float32(0.0),
        jnp.abs(obs_w) * 0.5, jnp.abs(obs_h) * 0.5,
    )
    r_obs = 0.5 * jnp.sqrt(obs_w * obs_w + obs_h * obs_h)
    s_eff = (
        jnp.sqrt(sd[:, 0] ** 2 + sd[:, 1] ** 2)
        + r_obs * sd[:, 2]
        + 0.5 * jnp.sqrt(sd[:, 3] ** 2 + sd[:, 4] ** 2)
    )
    margin = jnp.clip(d / jnp.maximum(s_eff, 1e-3), -40.0, 40.0)
    return jnp.stack([d, margin], axis=1)


def featurize(
    positions, var_idx, pose_idx, poses, std_devs, robot_wh=ROBOT_WH
) -> np.ndarray:
    """Dataset rows + tables -> (N, 13) float32 feature matrix.

    Columns: x, y, obstacle_w, obstacle_h, cos(theta), sin(theta),
    sigma_x, sigma_y, sigma_theta, sigma_w, sigma_h, signed distance
    at the mean pose, sigma-scaled margin (`_physics_cols`; computed
    against ``robot_wh``, default the reference robot). ``poses`` is
    the (P, 3) poses.npy table, ``std_devs`` the (V, 5) STD-DEV table
    (the on-disk variances.npy holds variances; take sqrt first, as
    the labeler does — generate_dataset.cu:310-317).
    """
    positions = np.asarray(positions, np.float32)
    poses = np.asarray(poses, np.float32)
    std_devs = np.asarray(std_devs, np.float32)
    vi = np.asarray(var_idx, np.int64)
    pi = np.asarray(pose_idx, np.int64)
    if vi.size and (vi.min() < 0 or vi.max() >= len(std_devs)):
        raise ValueError(
            f"var_idx out of range [0, {len(std_devs)}) — wrong tables?"
        )
    if pi.size and (pi.min() < 0 or pi.max() >= len(poses)):
        raise ValueError(
            f"pose_idx out of range [0, {len(poses)}) — wrong tables?"
        )
    pose = poses[pi]  # (N, 3) w, h, theta
    sd = std_devs[vi]  # (N, 5)
    cos_t = np.cos(pose[:, 2:3])
    sin_t = np.sin(pose[:, 2:3])
    phys = np.asarray(
        _physics_cols(
            jnp.asarray(positions[:, 0]), jnp.asarray(positions[:, 1]),
            jnp.asarray(cos_t[:, 0]), jnp.asarray(sin_t[:, 0]),
            jnp.asarray(pose[:, 0]), jnp.asarray(pose[:, 1]),
            jnp.asarray(sd), robot_wh,
        )
    )
    return np.concatenate(
        [positions[:, 0:2], pose[:, 0:2], cos_t, sin_t, sd, phys],
        axis=1,
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Model


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training knobs (defaults sized for the 1e7-row reference dataset)."""

    hidden: Sequence[int] = (256, 256, 256)
    epochs: int = 10
    batch_size: int = 8192
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    val_fraction: float = 0.05
    seed: int = 0
    compute_dtype: str = "bfloat16"  # matmul input dtype; f32 accumulate
    data_parallel: bool = False  # shard the batch axis over local devices
    verbose: bool = False


def init_params(key: Array, hidden: Sequence[int]) -> dict:
    """He-initialized MLP params: f32 pytree {'w0','b0',...,'wout','bout'}."""
    params = {}
    sizes = [NUM_FEATURES, *hidden]
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        scale = np.sqrt(2.0 / sizes[i])
        params[f"w{i}"] = (
            jax.random.normal(sub, (sizes[i], sizes[i + 1]), jnp.float32)
            * scale
        )
        params[f"b{i}"] = jnp.zeros((sizes[i + 1],), jnp.float32)
    key, sub = jax.random.split(key)
    params["wout"] = jax.random.normal(
        sub, (sizes[-1], 1), jnp.float32
    ) * np.sqrt(1.0 / sizes[-1])
    params["bout"] = jnp.zeros((1,), jnp.float32)
    return params


def _num_layers(params: dict) -> int:
    return sum(1 for k in params if k.startswith("w") and k != "wout")


def apply_model(params: dict, x: Array, compute_dtype=jnp.bfloat16) -> Array:
    """Logits (N,) for standardized features (N, NUM_FEATURES).

    Matmuls run with ``compute_dtype`` inputs and FLOAT32 accumulation
    (`preferred_element_type`) — bf16 ins + f32 out is the MXU's native
    mode; parameters stay f32 (casting per-use keeps the optimizer
    state exact).
    """
    h = x.astype(compute_dtype)
    for i in range(_num_layers(params)):
        h = jax.lax.dot_general(
            h,
            params[f"w{i}"].astype(compute_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = jax.nn.gelu(h + params[f"b{i}"])
        h = h.astype(compute_dtype)
    out = jax.lax.dot_general(
        h,
        params["wout"].astype(compute_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (out + params["bout"])[:, 0]


def _bce(logits: Array, targets: Array) -> Array:
    """Mean sigmoid BCE with soft targets, numerically stable in f32."""
    # log(1 + e^-|z|) + max(z, 0) - z*y
    return jnp.mean(
        jnp.logaddexp(0.0, -jnp.abs(logits))
        + jnp.maximum(logits, 0.0)
        - logits * targets
    )


# ---------------------------------------------------------------------------
# Training


def _epoch_body(tx, compute_dtype, batch_size: int, steps: int):
    """Un-jitted epoch function: shuffled-minibatch scan over the data.

    (params, opt_state, key, x, y) -> (params, opt_state, mean loss).
    `_make_epoch_fn` jits it with donation for training;
    `utils.benchmarks.bench_learned_train` wraps it in a traced-bound
    fori_loop for difference-quotient timing."""

    def loss_fn(params, xb, yb):
        return _bce(apply_model(params, xb, compute_dtype), yb)

    def epoch(params, opt_state, key, x, y):
        n = x.shape[0]
        perm = jax.random.permutation(key, n)[: steps * batch_size]
        idx = perm.reshape(steps, batch_size)

        def step(carry, batch_idx):
            params, opt_state = carry
            xb = jnp.take(x, batch_idx, axis=0)
            yb = jnp.take(y, batch_idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idx
        )
        return params, opt_state, jnp.mean(losses)

    return epoch


def _make_epoch_fn(tx, compute_dtype, batch_size: int, steps: int):
    """One donated, jit-compiled program: scan over an epoch's minibatches."""
    return jax.jit(
        _epoch_body(tx, compute_dtype, batch_size, steps),
        donate_argnums=(0, 1),
    )


@dataclasses.dataclass
class TrainResult:
    params: dict
    norm_mean: np.ndarray
    norm_std: np.ndarray
    history: list  # per-epoch mean train loss
    val_bce: float
    val_mae: float
    val_mae_per_bin: list  # aligned with accuracy_bins intervals
    # robot the physics feature columns were computed against (rides
    # into the saved artifact so predictions reuse the same geometry)
    robot_wh: tuple = ROBOT_WH


def train_model(
    features: np.ndarray,
    labels: np.ndarray,
    cfg: TrainConfig = TrainConfig(),
    *,
    accuracy_bins: Sequence[float] = (0.0, 0.01, 0.1, 1.0),
    devices=None,
    robot_wh=ROBOT_WH,
) -> TrainResult:
    """Fit the MLP on (N, NUM_FEATURES) features / (N,) cp labels.

    Standardizes features by train-split statistics, trains
    ``cfg.epochs`` one-program epochs, and reports validation BCE/MAE
    (overall and per reference accuracy bin, so model error reads in
    the same units as the labeler's CI targets).

    ``devices``: explicit device list for ``cfg.data_parallel`` (default
    ``jax.local_devices()``) — pass the CPU mesh devices in tests and
    dryruns so nothing dispatches through a remote backend.
    """
    features = np.asarray(features, np.float32)
    labels = np.asarray(labels, np.float32)
    if features.ndim != 2 or features.shape[1] != NUM_FEATURES:
        raise ValueError(f"features must be (N, {NUM_FEATURES})")
    if labels.shape != (features.shape[0],):
        raise ValueError("labels must be (N,) aligned with features")
    n = features.shape[0]
    rng = np.random.default_rng(cfg.seed)
    order = rng.permutation(n)
    n_val = int(n * cfg.val_fraction)
    val_idx, train_idx = order[:n_val], order[n_val:]
    if train_idx.size < cfg.batch_size:
        raise ValueError(
            f"need >= batch_size={cfg.batch_size} training rows, have "
            f"{train_idx.size}; shrink batch_size"
        )

    mean = features[train_idx].mean(axis=0)
    std = features[train_idx].std(axis=0)
    std = np.where(std < 1e-6, 1.0, std).astype(np.float32)
    xtr = (features[train_idx] - mean) / std
    ytr = labels[train_idx]

    compute_dtype = jnp.dtype(cfg.compute_dtype)
    params = init_params(jax.random.PRNGKey(cfg.seed), tuple(cfg.hidden))
    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    x_dev = jnp.asarray(xtr)
    y_dev = jnp.asarray(ytr)
    devs = list(devices) if devices is not None else jax.local_devices()
    if cfg.data_parallel and len(devs) > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        # the scan gathers global permutation indices, so rows must tile
        # evenly; drop the remainder (same rule as the minibatch cut)
        usable = (x_dev.shape[0] // len(devs)) * len(devs)
        x_dev, y_dev = x_dev[:usable], y_dev[:usable]
        mesh = Mesh(np.array(devs), ("batch",))
        row_sharded = NamedSharding(mesh, P("batch"))
        replicated = NamedSharding(mesh, P())
        x_dev = jax.device_put(x_dev, row_sharded)
        y_dev = jax.device_put(y_dev, row_sharded)
        params = jax.device_put(params, replicated)
        opt_state = jax.device_put(opt_state, replicated)

    # AFTER the DP truncation: n % batch_size can shrink below
    # n % n_devices, and the epoch's permutation reshape must match the
    # rows that actually remain on device.
    steps = x_dev.shape[0] // cfg.batch_size
    if steps == 0:
        raise ValueError(
            f"batch_size={cfg.batch_size} exceeds the {x_dev.shape[0]} "
            "training rows left after the data-parallel truncation"
        )
    epoch_fn = _make_epoch_fn(tx, compute_dtype, cfg.batch_size, steps)

    key = jax.random.PRNGKey(cfg.seed + 1)
    history = []
    for epoch in range(cfg.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = epoch_fn(params, opt_state, sub, x_dev, y_dev)
        history.append(float(loss))
        if cfg.verbose:
            print(f"[train] epoch {epoch + 1}/{cfg.epochs} "
                  f"bce {history[-1]:.5f}")

    params = jax.device_get(params)
    # validation on the held-out split (f32 features already on host)
    if n_val:
        xv = (features[val_idx] - mean) / std
        yv = labels[val_idx]
        logits = np.asarray(
            _predict_logits(params, xv, compute_dtype)
        )
        # numerically stable sigmoid (exp of the negative magnitude only)
        ex = np.exp(-np.abs(logits))
        p = np.where(logits >= 0, 1.0 / (1.0 + ex), ex / (1.0 + ex))
        val_bce = float(
            np.mean(
                np.logaddexp(0.0, -np.abs(logits))
                + np.maximum(logits, 0.0)
                - logits * yv
            )
        )
        val_mae = float(np.mean(np.abs(p - yv)))
        per_bin = []
        edges = list(accuracy_bins)
        for lo, hi in zip(edges[:-1], edges[1:]):
            m = (yv >= lo) & ((yv < hi) | (hi == edges[-1]))
            per_bin.append(float(np.mean(np.abs(p - yv)[m])) if m.any()
                           else float("nan"))
    else:
        val_bce = val_mae = float("nan")
        per_bin = []
    return TrainResult(
        params=params,
        norm_mean=np.asarray(mean, np.float32),
        norm_std=np.asarray(std, np.float32),
        history=history,
        val_bce=val_bce,
        val_mae=val_mae,
        val_mae_per_bin=per_bin,
        robot_wh=tuple(float(v) for v in robot_wh),
    )


def _predict_logits(params, x_std, compute_dtype, chunk: int = 1 << 20):
    """Chunked forward pass (keeps giant eval sets out of one buffer)."""
    outs = []
    for i in range(0, x_std.shape[0], chunk):
        outs.append(
            np.asarray(
                apply_model(
                    params, jnp.asarray(x_std[i : i + chunk]), compute_dtype
                )
            )
        )
    return np.concatenate(outs) if outs else np.zeros((0,), np.float32)


# ---------------------------------------------------------------------------
# Persistence + inference surface


def save_model(path, result: TrainResult, cfg: TrainConfig) -> None:
    """One .npz artifact: params + normalization + architecture metadata.

    Atomic publish (write-temp + rename, PID-suffixed temp name) — the
    same pattern as `utils.io_npy.save_npy`."""
    path = Path(path)
    meta = {
        "hidden": list(cfg.hidden),
        "compute_dtype": cfg.compute_dtype,
        "features": NUM_FEATURES,
        "robot_wh": list(getattr(result, "robot_wh", ROBOT_WH)),
        "val_bce": result.val_bce,
        "val_mae": result.val_mae,
    }
    arrays = {f"param_{k}": np.asarray(v) for k, v in result.params.items()}
    arrays["norm_mean"] = result.norm_mean
    arrays["norm_std"] = result.norm_std
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    if path.parent and not path.parent.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(f"{path.name}.tmp.{os.getpid()}")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


class LearnedCollisionModel:
    """Inference wrapper: cp predictions from a saved model artifact."""

    def __init__(self, params: dict, norm_mean, norm_std,
                 compute_dtype="bfloat16", robot_wh=ROBOT_WH):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.norm_mean = jnp.asarray(norm_mean, jnp.float32)
        self.norm_std = jnp.asarray(norm_std, jnp.float32)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.robot_wh = tuple(float(v) for v in robot_wh)

    @classmethod
    def load(cls, path) -> "LearnedCollisionModel":
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta_json"]).decode())
            n_feat = int(meta.get("features", z["norm_mean"].shape[0]))
            if n_feat != NUM_FEATURES:
                raise ValueError(
                    f"model artifact {path} was trained on {n_feat} "
                    f"features but this build featurizes "
                    f"{NUM_FEATURES} (physics features added round 4); "
                    "retrain with `collide2d train`"
                )
            params = {
                k[len("param_"):]: z[k]
                for k in z.files
                if k.startswith("param_")
            }
            return cls(
                params, z["norm_mean"], z["norm_std"],
                compute_dtype=meta.get("compute_dtype", "bfloat16"),
                robot_wh=meta.get("robot_wh", ROBOT_WH),
            )

    def cp_from_features(self, features) -> Array:
        """(N, NUM_FEATURES) raw features -> (N,) predicted cp. Jittable."""
        x = (jnp.asarray(features, jnp.float32) - self.norm_mean) / (
            self.norm_std
        )
        return jax.nn.sigmoid(
            apply_model(self.params, x, self.compute_dtype)
        )

    def cp_from_configs(self, configs) -> Array:
        """Predicted cp for a `mc.estimator.Configs` batch — the learned
        model as a drop-in SURROGATE for `CollisionProbabilityModel.
        forward` (same batch type in, (N,) cp out, no sampling).

        A Configs row carries exactly the 13 features the model trains
        on: position, obstacle w/h, cos/sin of the robot angle, the
        five noise std-devs, and the two physics columns
        (`_physics_cols`, computed against the model's stored
        ``robot_wh``). Jittable. The contract is the model's measured
        accuracy (README "Production validation"), not the MC
        estimator's CI guarantee — use it for cheap dense sweeps, keep
        the adaptive labeler for dataset-grade labels.
        """
        cos_t = jnp.cos(configs.pose_theta)
        sin_t = jnp.sin(configs.pose_theta)
        phys = _physics_cols(
            configs.position[:, 0], configs.position[:, 1],
            cos_t, sin_t,
            configs.obstacle_wh[:, 0], configs.obstacle_wh[:, 1],
            configs.std_dev, self.robot_wh,
        )
        feats = jnp.concatenate(
            [
                configs.position,
                configs.obstacle_wh,
                cos_t[:, None],
                sin_t[:, None],
                configs.std_dev,
                phys,
            ],
            axis=1,
        )
        return self.cp_from_features(feats)

    def cp(self, positions, var_idx, pose_idx, poses, std_devs) -> np.ndarray:
        """Dataset-row form: resolves tables then predicts. (N,) float32."""
        feats = featurize(positions, var_idx, pose_idx, poses, std_devs,
                          robot_wh=self.robot_wh)
        chunk = 1 << 20
        out = [
            np.asarray(self.cp_from_features(feats[i : i + chunk]))
            for i in range(0, feats.shape[0], chunk)
        ]
        return np.concatenate(out) if out else np.zeros((0,), np.float32)


# ---------------------------------------------------------------------------
# Dataset-directory plumbing (ties into the pipeline's artifacts)


def _load_tables(data_dir) -> tuple[np.ndarray, np.ndarray]:
    """poses.npy + variances.npy -> (poses, STD-DEV table)."""
    from collide2d_tpu.data import schemas
    from collide2d_tpu.utils.io_npy import load_npy

    data_dir = Path(data_dir)
    poses = schemas.validate_poses(load_npy(data_dir / "poses.npy"))
    variances = schemas.validate_variances(
        load_npy(data_dir / "variances.npy")
    )
    return poses, np.sqrt(variances).astype(np.float32)


def load_training_data(
    data_dir, balance_bins: Sequence[float] | None = None,
    robot_wh=ROBOT_WH,
) -> tuple[np.ndarray, np.ndarray]:
    """All labeled batches in a dataset dir -> ((N, 13) features, (N,) cp).

    Reads the generator's artifacts exactly as `balance.load_data` does
    (numeric batch files, skipping poses*/variance*/checkpoint*) and
    resolves table indices through poses.npy / variances.npy.

    ``balance_bins``: optional cp bin edges — truncates every bin to the
    smallest bin's row count before featurizing (`data.balance`, the
    reference's balance_datasets.py step), the standard counter to the
    annulus sampler's ~61% zero-probability mass dominating training."""
    from collide2d_tpu.data.balance import (
        balance_single,
        compute_bin_idx,
        load_data,
    )
    from collide2d_tpu.data.schemas import unpack_dataset_rows

    rows = load_data(data_dir)
    # BEFORE balance filtering: a NaN cp falls outside every balance
    # bin mask, so checking afterwards would silently DROP the corrupt
    # rows instead of raising (review r3 finding).
    if not np.isfinite(rows).all():
        bad = int((~np.isfinite(rows).all(axis=1)).sum())
        raise ValueError(
            f"{data_dir}: {bad} rows contain NaN/inf — corrupt batch "
            "file? (a non-finite feature would silently train the model "
            "to NaN)"
        )
    if balance_bins is not None:
        rows = balance_single(
            rows, compute_bin_idx(rows[:, 2], list(balance_bins))
        )
    positions, cp, var_idx, pose_idx = unpack_dataset_rows(rows)
    poses, std_devs = _load_tables(data_dir)
    return featurize(positions, var_idx, pose_idx, poses, std_devs,
                     robot_wh=robot_wh), cp


def predict_file(model_path, input_path, data_dir) -> np.ndarray:
    """Predict cps for one batch file; returns the bare (N,) cp vector.

    Accepts both the (N, 5) labeled-dataset schema and the (N, 4)
    relabel-input schema (data/schemas.py) — the same inputs the
    relabel/ztest drivers take, so a saved cps vector slots directly
    into `collide2d compare` / `data.validate.compare_labels` for
    z-scored acceptance against MC labels."""
    from collide2d_tpu.data.schemas import (
        unpack_dataset_rows,
        unpack_relabel_rows,
    )
    from collide2d_tpu.utils.io_npy import load_npy

    rows = np.asarray(load_npy(input_path), np.float32)
    if rows.ndim != 2 or rows.shape[1] not in (4, 5):
        raise ValueError(
            f"{input_path}: expected (N, 5) dataset rows or (N, 4) relabel "
            f"rows, got {rows.shape}"
        )
    if rows.shape[1] == 5:
        positions, _, var_idx, pose_idx = unpack_dataset_rows(rows)
    else:
        positions, var_idx, pose_idx = unpack_relabel_rows(rows)
    poses, std_devs = _load_tables(data_dir)
    model = LearnedCollisionModel.load(model_path)
    return model.cp(positions, var_idx, pose_idx, poses, std_devs)
