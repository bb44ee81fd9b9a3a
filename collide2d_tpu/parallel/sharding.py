"""Multi-chip SPMD: the framework's complete parallelism surface.

The reference is single-GPU/single-process (SURVEY.md §2 checklist): its
only decompositions are P1 (one CUDA thread per configuration) and P2
(sequential samples within a thread). The TPU-native equivalents scale
across chips over ICI:

- P1 -> the CONFIG axis: shard configurations across a ``config`` mesh
  axis with `NamedSharding`. Embarrassingly parallel — XLA inserts no
  collectives; only the final host gather crosses the ICI.
- P2 -> the SAMPLE axis: for very deep per-pair budgets (ztest's 4e6
  samples/pair), `shard_map` round-robins the sample STEPS across a
  ``sample`` mesh axis — device s computes the single-chip stream's
  steps i = s + j*n_sample with the same per-config fold_in tags — and
  partial true-counts reduce with one `psum` over ICI. Because int32
  addition is exact and order-free, the psum equals the unsharded sum
  BIT FOR BIT: both mesh axes are value-level no-ops.

Both compose on a 2-D ``(config, sample)`` mesh: `sharded_mc_round` is
the full sharded round step the multichip dry-run compiles.

Multi-host pods: call ``jax.distributed.initialize()`` before anything
else and `make_mesh` picks up the global device list — the config axis
then spans hosts over DCN while the sample-axis psum should be kept
within a host's ICI domain (choose ``sample_axis`` <= local device
count). Untested here (single-host image); single-host multi-chip paths
are covered by the 8-device CPU-mesh tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from collide2d_tpu.mc.estimator import Configs


def make_mesh(
    devices=None, *, sample_axis: int | None = None
) -> Mesh:
    """A 2-D ``(config, sample)`` mesh over the available devices.

    ``sample_axis`` fixes the sample-axis size (must divide the device
    count); by default the mesh is all-config (pure data parallel), which
    is optimal for the dataset workloads where C >> devices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    s = sample_axis or 1
    if n % s:
        raise ValueError(f"sample_axis={s} does not divide {n} devices")
    dev_array = np.asarray(devices).reshape(n // s, s)
    return Mesh(dev_array, ("config", "sample"))


def config_spec() -> P:
    return P("config")


def shard_configs(configs: Configs, mesh: Mesh) -> Configs:
    """Place a configs batch (Configs / PolygonConfigs / MovingConfigs)
    with the configuration axis sharded over the ``config`` mesh axis
    (every field is (C, ...) and shards dim 0)."""
    sharding = NamedSharding(mesh, P("config"))
    return type(configs)(*(jax.device_put(a, sharding) for a in configs))


@functools.partial(
    jax.jit,
    static_argnames=("n_batch", "step_samples", "mesh", "use_vertices"),
)
def sharded_mc_round(
    key: Array,
    uids: Array,
    configs: Configs,
    robot_wh: Array,
    chunk_offset: Array,
    *,
    n_batch: int,
    step_samples: int,
    mesh: Mesh,
    use_vertices: bool = False,
) -> Array:
    """One MC round sharded over a ``(config, sample)`` mesh.

    Per (config-shard, sample-shard) device: C/n_config configurations x
    n_batch/n_sample samples. Sample STEPS are round-robined over the
    ``sample`` axis with the SAME per-config fold_in tags the unsharded
    `mc_round` uses, so the `psum` of partial counts is bitwise equal to
    the single-device stream sum (int32 addition is exact/order-free) —
    tested in test_sharding.py. Output: int32 (C,) counts, sharded over
    ``config`` / replicated over ``sample`` — ICI traffic is exactly one
    (C/n_config,) psum.
    """
    from collide2d_tpu.mc.estimator import _sample_sharded_counts

    n_sample = mesh.shape["sample"]
    if n_batch % (n_sample * step_samples):
        raise ValueError(
            f"n_batch={n_batch} must be a multiple of sample_axis x "
            f"step_samples = {n_sample} x {step_samples}"
        )
    return _sample_sharded_counts(
        key, uids, configs, robot_wh, chunk_offset,
        jnp.int32(n_batch // step_samples),
        step_samples=step_samples, use_vertices=use_vertices, mesh=mesh,
    )


def sample_sharded_probability(
    key: Array,
    configs: Configs,
    robot_wh,
    n_samples: int,
    mesh: Mesh | None = None,
    *,
    step_samples: int = 0,
) -> Array:
    """Collision probability with the SAMPLE budget sharded across chips.

    The scaling axis the reference handles only temporally (n_batch
    rounds up to 4e6 samples, SURVEY.md §5 long-context note) becomes a
    spatial mesh axis: per-chip partial-sample accumulation + one psum.
    """
    if mesh is None:
        mesh = make_mesh(sample_axis=len(jax.devices()))
    n_sample = mesh.shape["sample"]
    if n_samples % n_sample:
        raise ValueError(
            f"n_samples={n_samples} must be a multiple of the sample-axis "
            f"device count {n_sample}"
        )
    if step_samples <= 0:
        per_dev = n_samples // n_sample
        step_samples = max(1, min(per_dev, 512))
        while per_dev % step_samples:
            step_samples -= 1
    uids = jnp.arange(configs.num, dtype=jnp.int32)
    counts = sharded_mc_round(
        key,
        uids,
        configs,
        jnp.asarray(robot_wh, jnp.float32),
        jnp.int32(0),
        n_batch=int(n_samples),
        step_samples=int(step_samples),
        mesh=mesh,
    )
    return counts.astype(jnp.float32) / jnp.float32(n_samples)
