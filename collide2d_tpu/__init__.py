"""collide2d_tpu — a TPU-native 2D convex collision engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the CUDA
reference `beautifulv0id/Convex-2D-GPU-Collision-Detection`:

- fixed-runtime Separating-Axis-Theorem (SAT) collision tests between 2D
  rectangles and fixed-k convex polygons, batched over millions of pairs
  (reference primitive: ``utils.cu:159-184``),
- Monte Carlo estimation of collision probabilities under Gaussian
  pose/shape noise with a per-configuration adaptive stopping rule
  (reference: ``generate_dataset.cu:175-253``, ``utils.cu:186-207``),
- an end-to-end labeled-dataset pipeline — generation, relabeling, z-test
  validation, balancing, visualization — emitting the same ``.npy``
  artifact schemas as the reference
  (``generate_dataset.cu:255-524``, ``compute_collision_probability.cu``,
  ``ztest.cu``, ``balance_datasets.py``, ``show_data.ipynb``).

The design is TPU-first rather than a port: the SAT inner loop is a
fixed-shape Pallas kernel vmapped over pairs, randomness uses JAX's
counter-based PRNG, the reference's thrust stream compaction is replaced
by masked accumulation + halving-bucket recompaction under XLA's static
shapes, a batched AABB broad-phase prunes candidates before narrow-phase
SAT, and the configuration/sample axes shard across chips over ICI.
"""

from collide2d_tpu.ops.geometry import (
    rect_vertices,
    transform_vertices,
    rects_from_params,
    polygon_aabb,
    convex_hull,
)
from collide2d_tpu.ops.sat import (
    sat_rects_reference,
    sat_rects,
    sat_polygons,
    obb_collide,
)
from collide2d_tpu.ops.distance import (
    polygon_closest_points,
    polygon_signed_distance,
    rect_closest_points,
    rect_signed_distance,
)
from collide2d_tpu.ops.toi import (
    polygon_time_of_impact,
    polygon_translation_toi_parts,
    rect_time_of_impact,
    rect_translation_toi,
)
from collide2d_tpu.ops.manifold import (
    polygon_contact_manifold,
    rect_contact_manifold,
)
from collide2d_tpu.ops.raycast import (
    polygon_raycast,
    rect_raycast,
    scene_raycast,
)
from collide2d_tpu.ops.scene import (
    scene_collision_matrix,
    scene_colliding_pairs,
    scene_colliding_pairs_swept,
    scene_contact_manifolds,
)
from collide2d_tpu.ops.broad_phase import (
    aabb_overlap,
    candidate_mask,
    collide_candidates,
    collide_polygons_pruned,
    possible_collision_mask,
)
from collide2d_tpu.mc.stats import calc_slack, get_bin
from collide2d_tpu.mc.estimator import (
    collision_probability,
    collision_probability_pruned,
    mc_round,
    AdaptiveConfig,
    Configs,
    PolygonConfigs,
    adaptive_collision_probabilities,
)
from collide2d_tpu.mc.moving import (
    MovingConfigs,
    MovingPolygonConfigs,
    moving_configs,
    moving_polygon_configs,
    trajectory_collision_probability,
)
from collide2d_tpu.mc.schedule_sim import (
    min_convergence_points,
    optimize_checkpoints,
    simulate_convergence,
    simulate_schedule,
)
from collide2d_tpu.models.collision_model import (
    CollisionProbabilityModel,
    PolygonCollisionProbabilityModel,
)

__version__ = "0.1.0"

_LEARNED_EXPORTS = (
    "LearnedCollisionModel",
    "TrainConfig",
    "train_model",
    "featurize",
)


def __getattr__(name: str):
    # Lazy: the learned-model stack pulls in optax; keep package import
    # (and thus CLI/test startup) free of it until actually used.
    if name in _LEARNED_EXPORTS:
        from collide2d_tpu.models import learned

        return getattr(learned, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "rect_vertices",
    "transform_vertices",
    "rects_from_params",
    "polygon_aabb",
    "convex_hull",
    "sat_rects_reference",
    "sat_rects",
    "sat_polygons",
    "obb_collide",
    "polygon_closest_points",
    "polygon_signed_distance",
    "rect_closest_points",
    "rect_signed_distance",
    "polygon_time_of_impact",
    "polygon_translation_toi_parts",
    "rect_time_of_impact",
    "rect_translation_toi",
    "polygon_contact_manifold",
    "rect_contact_manifold",
    "polygon_raycast",
    "rect_raycast",
    "scene_raycast",
    "scene_collision_matrix",
    "scene_colliding_pairs",
    "scene_colliding_pairs_swept",
    "scene_contact_manifolds",
    "aabb_overlap",
    "candidate_mask",
    "collide_candidates",
    "collide_polygons_pruned",
    "possible_collision_mask",
    "collision_probability_pruned",
    "calc_slack",
    "get_bin",
    "collision_probability",
    "mc_round",
    "AdaptiveConfig",
    "Configs",
    "PolygonConfigs",
    "MovingConfigs",
    "MovingPolygonConfigs",
    "moving_configs",
    "moving_polygon_configs",
    "min_convergence_points",
    "optimize_checkpoints",
    "simulate_convergence",
    "simulate_schedule",
    "trajectory_collision_probability",
    "adaptive_collision_probabilities",
    "CollisionProbabilityModel",
    "PolygonCollisionProbabilityModel",
    "LearnedCollisionModel",
    "TrainConfig",
    "train_model",
    "featurize",
]
