"""Gaussian pose/shape noise model for Monte Carlo collision sampling.

TPU-native equivalent of `sample_rectangle` (utils.cu:144-157) plus the
configuration sampler of the dataset generator's iteration-0 branch
(generate_dataset.cu:207-219). Randomness uses JAX's counter-based
threefry PRNG with per-configuration fold-in keys — stateless, unlike
curand's per-thread state arrays (utils.cu:111-117 `setup_kernel` has no
TPU equivalent: there is no state to set up). curand != threefry, so
labels match the reference STATISTICALLY, not bitwise (SURVEY.md §7
"hard parts" (c)); the ztest pipeline is the acceptance test for that.

Noise semantics (order and meaning per utils.cu:146-156):
  dx, dy, dtheta, dwidth, dheight ~ N(0, sigma_i^2) independently;
  sampled obstacle = rect(w, h) + rect(dw, dh)   [additive shape noise]
                   = rect(w + dw, h + dh)        [create_rect is linear]
  then rotated by dtheta about the ORIGIN and translated by (dx, dy).
The closed-form consequence used by the fused kernels: the sampled
obstacle is an oriented box with center (dx, dy), full extents
(w + dw, h + dh) and angle dtheta.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from collide2d_tpu.ops.geometry import rect_vertices, transform_vertices

# The annulus-radius padding constant of the reference's position sampler
# (generate_dataset.cu:215-216).
RADIUS_PADDING = 2.35


class NoiseParams(NamedTuple):
    """One draw of the 5-dim Gaussian noise: (dx, dy, dtheta, dw, dh)."""

    dx: Array
    dy: Array
    dtheta: Array
    dw: Array
    dh: Array


def sample_noise(key: Array, std_dev: Array, shape=()) -> NoiseParams:
    """Draw ``shape``-many 5-dim noise vectors scaled by ``std_dev``.

    ``std_dev``: (..., 5) per-configuration standard deviations in the
    reference's field order (x, y, theta, width, height) — already the
    sqrt of the variance table (generate_dataset.cu:310-317).
    Returns arrays of shape ``std_dev.shape[:-1] + shape``.
    """
    std_dev = jnp.asarray(std_dev, jnp.float32)
    draw_shape = std_dev.shape[:-1] + tuple(shape) + (5,)
    z = jax.random.normal(key, draw_shape, dtype=jnp.float32)
    extra = len(tuple(shape))
    sigma = std_dev.reshape(std_dev.shape[:-1] + (1,) * extra + (5,))
    d = z * sigma
    return NoiseParams(d[..., 0], d[..., 1], d[..., 2], d[..., 3], d[..., 4])


def sampled_obstacle_vertices(base_wh: Array, noise: NoiseParams) -> Array:
    """Vertex-path noisy obstacle, mirroring utils.cu:144-157 exactly.

    ``base_wh``: (..., 2) obstacle (width, height); ``noise``: broadcast-
    compatible NoiseParams. Returns (..., 4, 2) vertices: base rect plus
    additive rect(dw, dh), rotated by dtheta, translated by (dx, dy).
    """
    base = rect_vertices(base_wh[..., 0], base_wh[..., 1])
    delta = rect_vertices(noise.dw, noise.dh)
    return transform_vertices(base + delta, noise.dx, noise.dy, noise.dtheta)


def sample_configurations(
    key: Array,
    num_configs: int,
    poses: Array,
    std_devs: Array,
    *,
    r_offset: float,
    spread: float,
) -> tuple[Array, Array, Array]:
    """Sample dataset configurations (robot positions + table indices).

    Mirrors the iteration-0 branch of the generator kernel
    (generate_dataset.cu:207-219): pick a random pose index and variance
    index per configuration, then place the robot on a sigma-scaled
    elliptical ring around the obstacle:

        theta ~ U[0, 2*pi)
        shift ~ N(0, 1) * (sigma_x + sigma_y)/2 * spread
        x = cos(theta) * (w/2 + r_offset + 2.35 + sigma_x + shift)
        y = sin(theta) * (h/2 + r_offset + 2.35 + sigma_y + shift)

    The x/y radii differ (an elliptical ring — reference quirk, kept).
    Index draws use `jax.random.randint`, which is unbiased, unlike the
    reference's `curand() % num_poses` modulo bias (documented
    divergence; the bias is < 2^-14 for the default table sizes).

    Returns ``(positions (N,2) f32, pose_idx (N,) i32, var_idx (N,) i32)``.
    """
    positions, pose_idx, var_idx, _, _ = _sample_configuration_body(
        key, num_configs, poses, std_devs, r_offset, spread
    )
    return positions, pose_idx, var_idx


def _sample_configuration_body(key, num_configs, poses, std_devs,
                               r_offset, spread):
    poses = jnp.asarray(poses, jnp.float32)
    std_devs = jnp.asarray(std_devs, jnp.float32)
    k_pose, k_var, k_theta, k_shift = jax.random.split(key, 4)
    pose_idx = jax.random.randint(k_pose, (num_configs,), 0, poses.shape[0])
    var_idx = jax.random.randint(k_var, (num_configs,), 0, std_devs.shape[0])
    theta = jax.random.uniform(k_theta, (num_configs,), jnp.float32, 0.0, 2.0 * jnp.pi)
    sd = std_devs[var_idx]
    shift = (
        jax.random.normal(k_shift, (num_configs,), jnp.float32)
        * ((sd[:, 1] + sd[:, 0]) * 0.5)
        * spread
    )
    pose = poses[pose_idx]
    rx = pose[:, 0] * 0.5 + r_offset + RADIUS_PADDING + sd[:, 0] + shift
    ry = pose[:, 1] * 0.5 + r_offset + RADIUS_PADDING + sd[:, 1] + shift
    positions = jnp.stack([jnp.cos(theta) * rx, jnp.sin(theta) * ry], axis=-1)
    return positions, pose_idx, var_idx, pose, sd


@functools.partial(jax.jit, static_argnames=("num_configs", "r_offset", "spread"))
def sample_configuration_batch(
    key: Array,
    poses: Array,
    std_devs: Array,
    *,
    num_configs: int,
    r_offset: float,
    spread: float,
):
    """One COMPILED program for the generator's per-batch config assembly.

    Same draws as :func:`sample_configurations` (same keys, same order),
    but it also returns the gathered ``pose`` (N, 3) and ``sd`` (N, 5)
    rows the sampler computes internally anyway — the eager pipeline
    path re-gathered both from the 16.7M-row production tables and paid
    ~12 op-by-op dispatches per 100k batch through the remote tunnel.
    Returns ``(positions, pose_idx, var_idx, pose, sd)``.
    """
    return _sample_configuration_body(
        key, num_configs, poses, std_devs, r_offset, spread
    )
