"""Learned collision-probability model: features, training, persistence,
data-parallel training, and the CLI train/predict loop against a real
generated micro-dataset (the downstream use the reference names at
generate_dataset.cu:30-36 but never implements)."""

import numpy as np
import pytest

from collide2d_tpu.models import learned
from collide2d_tpu.models.learned import (
    LearnedCollisionModel,
    TrainConfig,
    featurize,
    load_training_data,
    save_model,
    train_model,
)


def _toy_problem(n=2048, seed=0):
    """Learnable synthetic task phrased in the real feature semantics:
    cp is a smooth function of the robot-obstacle gap."""
    rng = np.random.default_rng(seed)
    positions = rng.uniform(-6, 6, size=(n, 2)).astype(np.float32)
    poses = rng.uniform(0.5, 4.0, size=(8, 3)).astype(np.float32)
    variances = rng.uniform(0.0, 0.09, size=(4, 5)).astype(np.float32)
    std = np.sqrt(variances)
    pose_idx = rng.integers(0, 8, size=n)
    var_idx = rng.integers(0, 4, size=n)
    feats = featurize(positions, var_idx, pose_idx, poses, std)
    # soft label: logistic in (distance - combined half extents)
    gap = np.linalg.norm(positions, axis=1) - 0.5 * (
        poses[pose_idx, 0] + poses[pose_idx, 1]
    )
    labels = (1.0 / (1.0 + np.exp(3.0 * gap))).astype(np.float32)
    return feats, labels


def test_featurize_resolves_tables():
    positions = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    poses = np.array([[5.0, 6.0, 0.0], [7.0, 8.0, np.pi / 2]], np.float32)
    std = np.arange(10, dtype=np.float32).reshape(2, 5)
    f = featurize(positions, [1.0, 0.0], [0.0, 1.0], poses, std)
    assert f.shape == (2, learned.NUM_FEATURES)
    np.testing.assert_allclose(f[0, :2], [1.0, 2.0])
    np.testing.assert_allclose(f[0, 2:4], [5.0, 6.0])  # pose 0 w,h
    np.testing.assert_allclose(f[0, 4:6], [1.0, 0.0])  # cos/sin(0)
    np.testing.assert_allclose(f[0, 6:11], std[1])     # var row 1
    np.testing.assert_allclose(f[1, 4:6], [0.0, 1.0], atol=1e-6)
    # physics columns: row 0's robot (4.07x1.74 at (1,2), angle 0)
    # overlaps the 5x6 obstacle at the origin -> negative signed
    # distance; the margin is the distance over the combined noise
    # scale (exact values via the shared helper, ops.distance math)
    assert f[0, 11] < 0
    s_eff = (np.hypot(std[1, 0], std[1, 1])
             + 0.5 * np.hypot(5.0, 6.0) * std[1, 2]
             + 0.5 * np.hypot(std[1, 3], std[1, 4]))
    np.testing.assert_allclose(
        f[0, 12], np.clip(f[0, 11] / max(s_eff, 1e-3), -40, 40), rtol=1e-5
    )


def test_featurize_rejects_out_of_range_indices():
    poses = np.zeros((2, 3), np.float32)
    std = np.zeros((2, 5), np.float32)
    pos = np.zeros((1, 2), np.float32)
    with pytest.raises(ValueError, match="pose_idx"):
        featurize(pos, [0], [2], poses, std)
    with pytest.raises(ValueError, match="var_idx"):
        featurize(pos, [5], [0], poses, std)


def test_training_learns_and_beats_mean_predictor():
    feats, labels = _toy_problem()
    cfg = TrainConfig(hidden=(64, 64), epochs=30, batch_size=256,
                      learning_rate=3e-3, val_fraction=0.125, seed=0)
    res = train_model(feats, labels, cfg)
    assert res.history[-1] < 0.8 * res.history[0]
    # must beat the constant-mean predictor on held-out rows
    mean_mae = float(np.mean(np.abs(labels - labels.mean())))
    assert res.val_mae < 0.7 * mean_mae
    assert len(res.val_mae_per_bin) == 3


def test_save_load_roundtrip_identical_predictions(tmp_path):
    feats, labels = _toy_problem(n=512)
    cfg = TrainConfig(hidden=(16,), epochs=2, batch_size=128,
                      val_fraction=0.25, seed=1)
    res = train_model(feats, labels, cfg)
    path = tmp_path / "model.npz"
    save_model(path, res, cfg)
    model = LearnedCollisionModel.load(path)
    direct = LearnedCollisionModel(
        res.params, res.norm_mean, res.norm_std, cfg.compute_dtype
    )
    a = np.asarray(model.cp_from_features(feats[:64]))
    b = np.asarray(direct.cp_from_features(feats[:64]))
    np.testing.assert_array_equal(a, b)
    assert ((a >= 0) & (a <= 1)).all()


def test_training_is_deterministic():
    """Same data + TrainConfig -> bit-identical parameters (threefry
    shuffles, deterministic scan, fixed split): the same contract the
    labelers carry (same-seed generates are bitwise identical)."""
    feats, labels = _toy_problem(n=512, seed=5)
    cfg = TrainConfig(hidden=(16,), epochs=2, batch_size=128,
                      val_fraction=0.25, seed=4)
    a = train_model(feats, labels, cfg)
    b = train_model(feats, labels, cfg)
    assert a.history == b.history
    for k in a.params:
        np.testing.assert_array_equal(
            np.asarray(a.params[k]), np.asarray(b.params[k])
        )
    np.testing.assert_array_equal(a.norm_mean, b.norm_mean)


def test_data_parallel_training_matches_single_device():
    # f32 compute so the only cross-device difference is reduction order.
    feats, labels = _toy_problem(n=1024, seed=3)
    base = TrainConfig(hidden=(32,), epochs=3, batch_size=128,
                       val_fraction=0.0, seed=2, compute_dtype="float32")
    res_single = train_model(feats, labels, base)
    res_dp = train_model(
        feats, labels,
        TrainConfig(**{**base.__dict__, "data_parallel": True}),
    )
    for k in res_single.params:
        np.testing.assert_allclose(
            np.asarray(res_single.params[k]), np.asarray(res_dp.params[k]),
            rtol=2e-4, atol=2e-5,
        )


def test_cp_from_configs_matches_featurize_path():
    """The Configs surrogate surface must produce exactly the features
    the model was trained on (column order pinned vs featurize)."""
    from collide2d_tpu.mc.estimator import Configs

    rng = np.random.default_rng(2)
    n = 64
    poses = rng.uniform(0.5, 4.0, size=(4, 3)).astype(np.float32)
    std = np.sqrt(rng.uniform(0, 0.09, size=(4, 5))).astype(np.float32)
    positions = rng.uniform(-6, 6, size=(n, 2)).astype(np.float32)
    pose_idx = rng.integers(0, 4, size=n)
    var_idx = rng.integers(0, 4, size=n)
    feats, labels = _toy_problem(n=512, seed=7)
    cfg = TrainConfig(hidden=(16,), epochs=1, batch_size=128,
                      val_fraction=0.0, seed=0)
    res = train_model(feats, labels, cfg)
    model = LearnedCollisionModel(
        res.params, res.norm_mean, res.norm_std, cfg.compute_dtype
    )
    configs = Configs(
        position=positions,
        pose_theta=poses[pose_idx, 2],
        obstacle_wh=poses[pose_idx, 0:2],
        std_dev=std[var_idx],
    )
    via_configs = np.asarray(model.cp_from_configs(configs))
    via_tables = model.cp(positions, var_idx, pose_idx, poses, std)
    np.testing.assert_allclose(via_configs, via_tables, rtol=0, atol=2e-6)
    assert via_configs.shape == (n,)


def test_data_parallel_truncation_respects_batch_count():
    """Regression (review r3): with a device count that does not divide
    the row count, the DP truncation can drop the usable rows below
    steps * batch_size — the epoch's permutation reshape must size
    itself AFTER the truncation, not before."""
    from conftest import cpu_devices

    feats, labels = _toy_problem(n=512, seed=6)
    res = train_model(
        feats, labels,
        TrainConfig(hidden=(8,), epochs=1, batch_size=128,
                    val_fraction=0.0, seed=0, data_parallel=True),
        devices=cpu_devices()[:3],  # 512 % 3 != 0 -> 510 usable rows
    )
    assert np.isfinite(res.history[-1])


def test_cli_train_predict_on_generated_dataset(tmp_path):
    """Full loop on a real micro-dataset: generate -> train -> predict."""
    from collide2d_tpu.cli import main
    from collide2d_tpu.data.pipeline import GenerateConfig, generate_dataset
    from collide2d_tpu.mc.estimator import AdaptiveConfig

    data_dir = tmp_path / "data"
    generate_dataset(GenerateConfig(
        data_dir=str(data_dir), num_batches=2, batch_size=128,
        num_poses=8, num_variances=8, seed=0, verbose=False,
        adaptive=AdaptiveConfig(
            max_samples=2000, initial_batch=1000,
            initial_phase_samples=2000, later_batch=1000,
            bin_accuracy=(0.05, 0.05, 0.1), min_active=64,
        ),
        max_samples=2000,
    ))
    model_path = tmp_path / "model.npz"
    rc = main([
        "train", "--data_dir", str(data_dir), "--out", str(model_path),
        "--hidden", "16", "--epochs", "3", "--batch_size", "64",
        "--val_fraction", "0.1", "--verbose", "0",
    ])
    assert rc == 0 and model_path.exists()

    out = tmp_path / "pred.npy"
    rc = main([
        "predict", "--model", str(model_path),
        "--data_in", str(data_dir / "0.npy"),
        "--data_dir", str(data_dir), "--out", str(out),
    ])
    assert rc == 0
    cps = np.load(out)
    rows = np.load(data_dir / "0.npy")
    assert cps.shape == (rows.shape[0],)
    assert ((cps >= 0) & (cps <= 1)).all()
    # the predict path accepts relabel-schema (N, 4) inputs too
    relabel_in = tmp_path / "relabel_rows.npy"
    np.save(relabel_in, rows[:, [0, 1, 3, 4]])
    rc = main([
        "predict", "--model", str(model_path),
        "--data_in", str(relabel_in),
        "--data_dir", str(data_dir), "--out", str(out),
    ])
    assert rc == 0 and np.load(out).shape == (rows.shape[0],)


def test_load_training_data_balance_bins(tmp_path):
    """balance_bins truncates every cp bin to the smallest bin's count
    (the reference's balance_datasets.py step) before featurizing."""
    from collide2d_tpu.data.schemas import pack_dataset_rows
    from collide2d_tpu.utils.io_npy import save_npy

    rng = np.random.default_rng(0)
    n = 300
    cp = np.concatenate([
        np.zeros(200, np.float32),                      # [0, 0.01) bin
        rng.uniform(0.02, 0.09, 60).astype(np.float32),  # [0.01, 0.1)
        rng.uniform(0.2, 0.9, 40).astype(np.float32),    # [0.1, 1]
    ])
    rows = pack_dataset_rows(
        rng.uniform(-5, 5, (n, 2)).astype(np.float32), cp,
        np.zeros(n, np.float32), np.zeros(n, np.float32),
    )
    data_dir = tmp_path / "data"
    save_npy(data_dir / "0.npy", rows)
    save_npy(data_dir / "poses.npy", np.ones((1, 3), np.float32))
    save_npy(data_dir / "variances.npy", np.zeros((1, 5), np.float32))

    feats, labels = load_training_data(data_dir)
    assert labels.shape == (n,)
    bins = (0.0, 0.01, 0.1, 1.0)
    feats_b, labels_b = load_training_data(data_dir, balance_bins=bins)
    # smallest bin has 40 rows -> 3 bins x 40
    assert labels_b.shape == (120,)
    assert (labels_b < 0.01).sum() == 40
    assert ((labels_b >= 0.01) & (labels_b < 0.1)).sum() == 40


def test_load_training_data_rejects_non_finite_rows(tmp_path):
    from collide2d_tpu.utils.io_npy import save_npy

    rows = np.zeros((8, 5), np.float32)
    rows[2, 0] = np.nan
    data_dir = tmp_path / "data"
    save_npy(data_dir / "0.npy", rows)
    save_npy(data_dir / "poses.npy", np.ones((1, 3), np.float32))
    save_npy(data_dir / "variances.npy", np.zeros((1, 5), np.float32))
    with pytest.raises(ValueError, match="NaN"):
        load_training_data(data_dir)
    # with balance_bins too: a NaN cp falls outside every bin mask, so a
    # post-balance check would silently DROP the corrupt rows instead of
    # raising (review r3 finding)
    with pytest.raises(ValueError, match="NaN"):
        load_training_data(data_dir, balance_bins=(0.0, 0.01, 0.1, 1.0))


def test_load_training_data_resolves_dataset_dir(tmp_path):
    from collide2d_tpu.data.pipeline import GenerateConfig, generate_dataset
    from collide2d_tpu.mc.estimator import AdaptiveConfig

    data_dir = tmp_path / "data"
    generate_dataset(GenerateConfig(
        data_dir=str(data_dir), num_batches=1, batch_size=128,
        num_poses=4, num_variances=4, seed=1, verbose=False,
        adaptive=AdaptiveConfig(
            max_samples=2000, initial_batch=1000,
            initial_phase_samples=2000, later_batch=1000,
            bin_accuracy=(0.05, 0.05, 0.1), min_active=64,
        ),
        max_samples=2000,
    ))
    feats, labels = load_training_data(data_dir)
    assert feats.shape == (128, learned.NUM_FEATURES)
    assert labels.shape == (128,)
    assert ((labels >= 0) & (labels <= 1)).all()
    # features carry the actual table values, not the indices
    rows = np.load(data_dir / "0.npy")
    poses = np.load(data_dir / "poses.npy")
    np.testing.assert_allclose(
        feats[:, 2], poses[rows[:, 4].astype(int), 0], rtol=1e-6
    )
