"""Train the learned collision-probability model on a generated dataset.

The reference's dataset exists to train exactly this kind of model
(generate_dataset.cu:30-36); the reference repo stops at the data. This
walkthrough closes the loop end to end:

    python examples/train_model.py [data_dir]

With no argument it generates a small demo dataset first (CPU-friendly
sizes; on a TPU the same code runs the production 1e7-row dataset —
see README "Production validation").
"""

import sys
import tempfile
from pathlib import Path

import numpy as np


def ensure_dataset(data_dir: Path) -> Path:
    if (data_dir / "poses.npy").exists():
        return data_dir
    print(f"generating a demo dataset in {data_dir} ...")
    from collide2d_tpu.data.pipeline import GenerateConfig, generate_dataset
    from collide2d_tpu.mc.estimator import AdaptiveConfig

    generate_dataset(GenerateConfig(
        data_dir=str(data_dir), num_batches=4, batch_size=1024,
        num_poses=256, num_variances=256, seed=0, verbose=False,
        adaptive=AdaptiveConfig(
            max_samples=20_000, bin_accuracy=(0.01, 0.01, 0.02),
        ),
        max_samples=20_000,
    ))
    return data_dir


def main() -> None:
    from collide2d_tpu.models.learned import (
        TrainConfig,
        LearnedCollisionModel,
        load_training_data,
        save_model,
        train_model,
    )

    data_dir = (
        Path(sys.argv[1]) if len(sys.argv) > 1
        else ensure_dataset(Path(tempfile.gettempdir()) / "collide2d_demo")
    )
    features, labels = load_training_data(data_dir)
    print(f"{features.shape[0]} rows; mean cp {labels.mean():.4f}")

    cfg = TrainConfig(hidden=(128, 128), epochs=30, batch_size=512,
                      learning_rate=1e-3, val_fraction=0.1, verbose=True)
    result = train_model(features, labels, cfg)
    print(f"val bce {result.val_bce:.5f}  val mae {result.val_mae:.4f}  "
          f"per-bin mae {['%.4f' % m for m in result.val_mae_per_bin]}")

    model_path = data_dir / "model.npz"
    save_model(model_path, result, cfg)
    model = LearnedCollisionModel.load(model_path)

    # predict the first batch and sanity-check against its MC labels
    from collide2d_tpu.data.schemas import unpack_dataset_rows

    rows = np.load(data_dir / "0.npy")
    positions, cp, var_idx, pose_idx = unpack_dataset_rows(rows)
    poses = np.load(data_dir / "poses.npy")
    std = np.sqrt(np.load(data_dir / "variances.npy"))
    pred = model.cp(positions, var_idx, pose_idx, poses, std)
    mae = float(np.mean(np.abs(pred - cp)))
    base = float(np.mean(np.abs(cp - cp.mean())))
    print(f"batch-0 MAE {mae:.4f} (constant-mean predictor: {base:.4f})")


if __name__ == "__main__":
    main()
