"""The contact-query stack in one file: boolean SAT -> signed distance ->
witness points -> contact manifolds -> time of impact -> scene queries.

Run anywhere (CPU works; a TPU makes it fast):

    python examples/contact_queries.py

Every query is batched, fixed-shape, jit/vmap/shard-safe. The boolean
label is the only query the CUDA reference has (utils.cu:159-184);
everything after it is framework surface a planner or contact solver
consumes on top of the same geometry.
"""

import numpy as np
import jax.numpy as jnp

from collide2d_tpu import (
    CollisionProbabilityModel,
    polygon_contact_manifold,
    rect_time_of_impact,
    scene_collision_matrix,
    scene_contact_manifolds,
)

model = CollisionProbabilityModel(robot_wh=(4.07, 1.74))
positions = jnp.asarray([[0.5, 0.2], [3.5, 0.0], [9.0, 9.0]], jnp.float32)
thetas = jnp.asarray([0.3, 0.0, 1.0], jnp.float32)
obstacle_wh = jnp.asarray([2.0, 3.0], jnp.float32)

# 1. Boolean narrow phase + how-far (signed distance: negative = depth).
labels = model.collide(positions, thetas, obstacle_wh)
dist = model.distance(positions, thetas, obstacle_wh)
print("labels:", np.asarray(labels), " signed distance:", np.asarray(dist))

# 2. Witness points and the full contact manifold (up to 2 points).
d, pa, pb, normal = model.closest_points(positions, thetas, obstacle_wh)
count, points, depths, nrm = model.contact_manifold(
    positions, thetas, obstacle_wh
)
for i in range(3):
    c = int(count[i])
    print(f"config {i}: {c} contact point(s)",
          np.asarray(points[i][:c]).round(3).tolist(),
          "depths", np.asarray(depths[i][:c]).round(3).tolist())

# 3. WHEN does a motion first hit: exact translation TOI (grazing-safe)
#    and conservative advancement for rotation.
toi = rect_time_of_impact(
    positions, jnp.broadcast_to(model.robot_wh, (3, 2)), thetas,
    jnp.asarray([[-0.5, 0.0], [-2.0, 0.0], [-4.0, -4.0]], jnp.float32),
    jnp.asarray([0.0, 0.3, 0.0], jnp.float32),          # robot spins in #1
    jnp.zeros((3, 2)), jnp.broadcast_to(obstacle_wh, (3, 2)),
    jnp.zeros(3), jnp.zeros((3, 2)), jnp.zeros(3), t_max=2.0,
)
print("time of impact:", np.asarray(toi).round(4))

# 4. Scene queries: all colliding pairs among ONE set of N shapes.
rng = np.random.default_rng(0)
n = 32
angles = np.linspace(0, 2 * np.pi, 7)[:6]
scene = np.stack([
    (0.8 * np.stack([np.cos(angles + r), np.sin(angles + r)], -1)
     + rng.uniform(-4, 4, 2)).astype(np.float32)
    for r in rng.uniform(0, 1, n)
])  # 32 unit-ish hexagons scattered in a 8x8 box
matrix = scene_collision_matrix(jnp.asarray(scene))
pairs, n_pairs, n_contacts, pts, deps, normals, _ = scene_contact_manifolds(
    jnp.asarray(scene), capacity=128
)
print(f"scene: {int(n_pairs)} colliding pairs of {n * (n - 1) // 2}")
r = 0
i, j = np.asarray(pairs[r])
print(f"  e.g. shapes {i}-{j}: {int(n_contacts[r])} contacts, "
      f"depth {np.asarray(deps[r]).max():.3f}, "
      f"normal {np.asarray(normals[r]).round(3).tolist()}")

# The manifold of any single pair directly:
c, p, dpt, nv = polygon_contact_manifold(
    jnp.asarray(scene[i]), jnp.asarray(scene[j])
)
assert int(c) == int(n_contacts[r])

# 5. Ray casting: where does a ray first hit? (per-shape or whole-scene)
from collide2d_tpu import scene_raycast

t_hit, hit_idx, hit_normal = scene_raycast(
    jnp.asarray([-6.0, 0.0]), jnp.asarray([1.0, 0.0]), jnp.asarray(scene)
)
print(f"ray from (-6,0) along +x: hits shape {int(hit_idx)} at t="
      f"{float(t_hit):.3f}, normal {np.asarray(hit_normal).round(3).tolist()}")
print("done.")
