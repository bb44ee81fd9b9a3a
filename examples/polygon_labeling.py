"""Label convex k-gon configurations — the extension the reference names
(README.md:3 "arbitrary convex polygons") but never builds.

Runs anywhere (CPU included; on TPU the fused Pallas polygon kernel is
selected automatically). The same flow is available from the CLI:

    collide2d polylabel --data_in polys.npz --data_out labels.npz
"""

import jax
import jax.numpy as jnp
import numpy as np

from collide2d_tpu import (
    AdaptiveConfig,
    PolygonCollisionProbabilityModel,
    PolygonConfigs,
)


def main() -> None:
    # An L-shaped robot is NOT convex — decompose or hull it; here we use
    # a convex pentagon robot (CCW, around its own origin).
    robot = jnp.asarray(
        [[-1.0, -0.6], [1.0, -0.6], [1.4, 0.2], [0.0, 0.9], [-1.4, 0.2]],
        jnp.float32,
    )
    model = PolygonCollisionProbabilityModel(robot)

    # 1024 obstacle hexagons on per-config ellipses, with Gaussian pose
    # noise (x, y, theta) on the obstacle.
    rng = np.random.default_rng(0)
    C, K = 1024, 6  # small enough for a CPU run in well under a minute
    ang = np.sort(rng.uniform(0, 2 * np.pi, (C, K)), axis=-1)
    ab = rng.uniform(0.5, 3.0, (C, 1, 2))
    verts = np.stack([np.cos(ang), np.sin(ang)], axis=-1) * ab
    cfgs = PolygonConfigs.from_padded(
        position=rng.uniform(-6, 6, (C, 2)),
        pose_theta=rng.uniform(0, 2 * np.pi, C),
        obstacle_verts=verts,
        std_dev=rng.uniform(0.0, 0.4, (C, 3)),
    )

    # Deterministic narrow phase at zero noise:
    labels = model.collide(cfgs._replace(std_dev=jnp.zeros_like(cfgs.std_dev)))
    print(f"deterministic collision rate: {np.mean(np.asarray(labels)):.3f}")

    # Fixed-budget Monte Carlo probabilities (jittable):
    cp10k = model.forward(jax.random.PRNGKey(0), cfgs, 10_000)
    print(f"mean cp @10k samples: {float(jnp.mean(cp10k)):.4f}")

    # Adaptive labeling to per-bin CI accuracy (the reference's stopping
    # rule, generate_dataset.cu:243-252, on k-gons):
    cfg = AdaptiveConfig(
        accuracy_bins=(0.0, 0.1, 1.0),
        bin_accuracy=(5e-3, 1e-2),
        max_samples=100_000,
    )
    cp, n_used, converged = model.label(jax.random.PRNGKey(1), cfgs, cfg)
    print(
        f"adaptive: {converged.mean():.1%} converged, "
        f"mean {n_used.mean():,.0f} samples/config, mean cp {cp.mean():.4f}"
    )


if __name__ == "__main__":
    main()
