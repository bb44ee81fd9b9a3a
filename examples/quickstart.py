"""collide2d_tpu quickstart — the public API in one file.

Run anywhere (CPU works; a TPU makes it fast):

    python examples/quickstart.py

Covers the surface a user of the CUDA reference needs: deterministic SAT
labels, fixed-budget Monte Carlo probabilities, adaptive labeling to the
reference's per-bin CI targets, broad-phase pruning, and multi-chip
sharding. The dataset pipeline (generate/relabel/ztest/balance/show) is
the `collide2d` CLI — see README.
"""

import numpy as np
import jax
import jax.numpy as jnp

from collide2d_tpu import (
    AdaptiveConfig,
    CollisionProbabilityModel,
    adaptive_collision_probabilities,
    collision_probability_pruned,
    rects_from_params,
    sat_polygons,
    sat_rects,
)
from collide2d_tpu.mc.estimator import Configs

# --- deterministic narrow phase -------------------------------------------
# Rectangles as (center, width/height, angle); the reference's 4.07 x 1.74
# robot vs a 2 x 3 obstacle at the origin (generate_dataset.cu:60-61).
model = CollisionProbabilityModel(robot_wh=(4.07, 1.74))
positions = jnp.asarray([[0.0, 0.0], [1.5, 0.5], [8.0, 8.0]], jnp.float32)
thetas = jnp.asarray([0.0, 0.7, 0.3], jnp.float32)
obstacle_wh = jnp.broadcast_to(jnp.asarray([2.0, 3.0], jnp.float32), (3, 2))
labels = model.collide(positions, thetas, obstacle_wh)
print("SAT labels:", np.asarray(labels))  # [1 1 0]

# Raw vertex-level SAT over arbitrary batches (utils.cu:159-184 semantics:
# touching collides, fixed runtime, no early exit):
r1 = rects_from_params(positions, jnp.broadcast_to(model.robot_wh, (3, 2)), thetas)
r2 = rects_from_params(jnp.zeros((3, 2)), obstacle_wh, jnp.zeros((3,)))
assert np.array_equal(np.asarray(sat_rects(r1, r2)), np.asarray(labels))

# Convex k-gons with true perpendicular normals (the extension the
# reference README names but never implements):
tri = jnp.asarray([[[0, 0], [2, 0], [1, 2]]], jnp.float32)
hexa = jnp.asarray(
    [[[1.5, 0.5], [2.5, 0.5], [3.0, 1.4], [2.5, 2.3], [1.5, 2.3], [1.0, 1.4]]],
    jnp.float32,
)
print("k-gon label:", int(sat_polygons(tri, hexa)[0]))

# --- Monte Carlo under Gaussian pose/shape noise ---------------------------
cfgs = Configs(
    position=positions,
    pose_theta=thetas,
    obstacle_wh=obstacle_wh,
    std_dev=jnp.full((3, 5), 0.2, jnp.float32),  # sigma x,y,theta,w,h
)
key = jax.random.PRNGKey(0)
cp = model.forward(key, cfgs, n_samples=10_000)  # fixed budget, jittable
print("MC cp @10k:", np.round(np.asarray(cp), 3))

# Adaptive labeling to the reference's per-bin CI targets
# (generate_dataset.cu:58-59; stops each row as soon as its Wald /
# rule-of-three half-width is under its bin's target):
cp, n_used, converged = adaptive_collision_probabilities(
    key, cfgs, model.robot_wh,
    AdaptiveConfig(max_samples=200_000, schedule="tuned"),
)
print("adaptive cp:", np.round(cp, 4), "samples used:", n_used)

# Broad-phase pruning: rows that cannot touch within 6 sigma are labeled
# 0 without sampling (row 2 here); candidates are bitwise-identical to
# the unpruned jnp run:
cp_pruned = collision_probability_pruned(key, cfgs, model.robot_wh, 10_000)
print("pruned cp:", np.round(cp_pruned, 3))

# --- multi-chip ------------------------------------------------------------
# Shard the config axis (data parallel) and/or the per-config sample
# budget across a mesh; both axes are value-level no-ops on the jnp path
# (bit-identical labels). On a multi-chip host:
#
#   from collide2d_tpu.parallel import make_mesh
#   mesh = make_mesh(jax.devices(), sample_axis=2)
#   cp, n, ok = adaptive_collision_probabilities(
#       key, cfgs, model.robot_wh, AdaptiveConfig(), mesh=mesh)
#
# Multi-host pods: see collide2d_tpu.parallel.distributed.
print("ok")
