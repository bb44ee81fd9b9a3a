"""Trajectory validation under uncertainty — continuous collision +
Monte Carlo, end to end.

Run anywhere (CPU works; a TPU makes it fast):

    python examples/trajectory_validation.py

A planner wants to drive the reference's 4.07 x 1.74 robot along a
straight edge past an obstacle whose pose is only known up to Gaussian
noise. Three tools, layered:

1. deterministic time-of-impact (`model.time_of_impact`) — WHEN a given
   motion first hits a given obstacle (conservative advancement over the
   signed distance, `ops/toi.py`; the fused Pallas kernel in
   `ops/toi_pallas.py` runs 1.33e8 of these per second on one chip);
2. trajectory collision probability (`MovingConfigs` +
   `model.trajectory_probability`) — P(the motion collides) under the
   dataset noise model, fixed sample budget;
3. adaptive labeling (`model.label`) — the same probability driven to
   the reference's per-bin CI accuracy targets, with motion-aware
   6-sigma pruning skipping edges that provably cannot collide.
"""

import numpy as np
import jax
import jax.numpy as jnp

from collide2d_tpu import AdaptiveConfig, CollisionProbabilityModel
from collide2d_tpu.mc.moving import moving_configs

model = CollisionProbabilityModel(robot_wh=(4.07, 1.74))
key = jax.random.PRNGKey(0)

# --- 1. deterministic continuous collision --------------------------------
# Robot starts at x = 10 heading toward a 2 x 2 obstacle at the origin at
# unit speed, three lateral offsets: head-on, grazing lane, clear lane.
starts = jnp.asarray([[10.0, 0.0], [10.0, 1.6], [10.0, 6.0]], jnp.float32)
vel = jnp.asarray([[-1.0, 0.0]] * 3, jnp.float32)
toi = model.time_of_impact(
    starts, jnp.zeros(3), jnp.asarray([2.0, 2.0]), vel, t_max=20.0)
print("time of impact:", np.asarray(toi))  # ~[6.965, 6.965..., inf]

# --- 2. probability the motion collides, under pose noise -----------------
# Same three edges, but the obstacle pose wobbles (sigma 0.15 in x/y,
# 0.1 rad). The grazing lane turns from "hits late" into "hits with some
# probability"; the clear lane stays safe.
C = 3
cfgs = moving_configs(
    position=np.asarray(starts),
    pose_theta=0.0,
    obstacle_wh=np.array([2.0, 2.0], np.float32),
    std_dev=np.array([0.15, 0.15, 0.1, 0.0, 0.0], np.float32),
    velocity=np.asarray(vel),
    omega=0.0,
    t_max=8.0,  # the edge ends BEFORE the nominal 6.965 impact...
)
cp = model.trajectory_probability(key, cfgs, n_samples=20_000)
print("P(collide within t_max=8):", np.asarray(cp))

# --- 3. adaptive labels with motion-aware pruning --------------------------
# Label a batch of candidate edges to CI accuracy; edges whose motion
# cannot reach the obstacle within 6 sigma are emitted cp=0 unsampled.
rng = np.random.default_rng(7)
n = 256
pos = rng.uniform(-12, 12, (n, 2)).astype(np.float32)
vel = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
batch = moving_configs(
    pos, 0.0, np.array([2.0, 2.0], np.float32),
    np.array([0.15, 0.15, 0.1, 0.0, 0.0], np.float32),
    vel, 0.0, 4.0,
)
cfg = AdaptiveConfig(max_samples=200_000, prune_sigma=6.0,
                     bin_accuracy=(0.005, 0.005, 0.01))
cp, n_used, done = model.label(key, batch, cfg)
pruned = int((n_used == 0).sum())
print(f"labeled {n} edges: {done.mean():.0%} converged, {pruned} pruned "
      f"without sampling, mean P(collide) {cp.mean():.3f}")

# --- 4. the same, with convex k-gon shapes ---------------------------------
# Trajectories are not rectangle-only: `MovingPolygonConfigs` runs a
# k-gon robot past k-gon obstacles through the same adaptive machinery
# (pose noise (x, y, theta); jnp path — 'auto' resolves it).
from collide2d_tpu.mc.moving import moving_polygon_configs
from collide2d_tpu.models.collision_model import (
    PolygonCollisionProbabilityModel,
    example_polygon_configs,
)

hexes = example_polygon_configs(n=64, k=6, seed=3)
pbatch = moving_polygon_configs(
    np.asarray(hexes.position), np.asarray(hexes.pose_theta),
    np.asarray(hexes.obstacle_verts), np.asarray(hexes.std_dev),
    velocity=rng.uniform(-1, 1, (64, 2)).astype(np.float32),
    omega=0.3, t_max=2.0,
)
pmodel = PolygonCollisionProbabilityModel(
    np.array([[-2.035, -0.87], [2.035, -0.87],
              [2.035, 0.87], [-2.035, 0.87]], np.float32))
cp_p, _, done_p = pmodel.label(
    key, pbatch, AdaptiveConfig(max_samples=50_000, ca_iters=32,
                                bin_accuracy=(0.01, 0.01, 0.02)))
print(f"k-gon trajectories: {done_p.mean():.0%} converged, "
      f"mean P(collide) {cp_p.mean():.3f}")
