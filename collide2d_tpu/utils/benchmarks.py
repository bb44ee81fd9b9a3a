"""Throughput benchmarks — the framework defines the baseline, since the
reference publishes no numbers (BASELINE.md). Measures:

  (a) raw batched SAT rectangle-pair tests/sec (north star: >= 1e9/chip),
  (b) fused Monte Carlo collision-probability samples/sec,
  (c) end-to-end configurations labeled/sec at reference-default bins.

Methodology (required by the remote-TPU tunnel this image uses):
`block_until_ready` can acknowledge before work completes and a host
readback costs a ~30 ms round trip, so each benchmark runs its kernel K
times INSIDE one jitted `fori_loop` with an iteration-dependent input
perturbation (so XLA cannot hoist the body), ends in a scalar readback,
and reports the difference quotient (T(K1+K) - T(K1)) / K — which
cancels both the round trip and any fixed dispatch overhead. The loop
bound is a traced argument so both timings share one compilation.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from collide2d_tpu.mc.estimator import Configs, _counts_chunk, _per_config_keys
from collide2d_tpu.ops.sat import sat_rects
from collide2d_tpu.ops.geometry import rects_from_params

SAT_TARGET = 1e9  # BASELINE.json north star: SAT pairs/sec/chip


def _random_pairs(n: int, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    mk = lambda i, lo, hi, shape: jax.random.uniform(
        ks[i], shape, jnp.float32, lo, hi
    )
    r1 = rects_from_params(
        mk(0, -6, 6, (n, 2)), mk(1, 0.1, 5, (n, 2)), mk(2, 0, 2 * np.pi, (n,))
    )
    r2 = rects_from_params(
        mk(3, -6, 6, (n, 2)), mk(4, 0.1, 5, (n, 2)), mk(5, 0, 2 * np.pi, (n,))
    )
    return r1, r2


def _readback_seconds(fn, *args) -> float:
    """Wall time until the scalar result is actually on the host."""
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def _diff_time(fn, args_small, args_big, reps: int) -> float:
    """Per-unit time via difference quotient over the traced loop bound."""
    _readback_seconds(fn, *args_small)  # compile + warm
    t_small = min(_readback_seconds(fn, *args_small) for _ in range(3))
    t_big = min(_readback_seconds(fn, *args_big) for _ in range(3))
    return (t_big - t_small) / reps


@jax.jit
def _sat_loop(r1, r2, k):
    def body(i, acc):
        # Iteration-dependent shift defeats loop-invariant hoisting while
        # adding only 8 flops/pair to the ~100-flop SAT body.
        shift = i.astype(jnp.float32) * jnp.float32(1e-7)
        return acc + jnp.sum(sat_rects(r1, r2 + shift), dtype=jnp.int32)

    return jax.lax.fori_loop(0, k, body, jnp.int32(0))


def bench_sat(pairs: int = 1 << 22, iters: int = 20) -> dict:
    """Batched SAT over random rectangle pairs (BASELINE config #2)."""
    r1, r2 = jax.block_until_ready(_random_pairs(pairs))
    k1 = jnp.int32(1)
    k2 = jnp.int32(1 + iters)
    dt = _diff_time(_sat_loop, (r1, r2, k1), (r1, r2, k2), iters)
    rate = pairs / dt
    return {
        "metric": "sat_rect_pairs_per_sec",
        "value": rate,
        "unit": "pairs/s",
        "vs_baseline": rate / SAT_TARGET,
        "seconds_per_iter": dt,
        "pairs": pairs,
    }


@jax.jit
def _sat_pallas_loop(r1t, r2t, k):
    from collide2d_tpu.ops.sat_pallas import sat_count_pallas_t

    def body(i, acc):
        # Shift rides into the kernel via SMEM — no input re-copy in HBM.
        shift = i.astype(jnp.float32) * jnp.float32(1e-7)
        return acc + sat_count_pallas_t(r1t, r2t, shift, block=4096)

    return jax.lax.fori_loop(0, k, body, jnp.float32(0))


def bench_sat_pallas(pairs: int = 1 << 22, iters: int = 20, block: int = 4096) -> dict:
    """Pallas SAT counting kernel over SoA-packed pairs (HBM-bound)."""
    from collide2d_tpu.ops.sat_pallas import pack_rects

    r1, r2 = _random_pairs(pairs)
    r1t = jax.block_until_ready(pack_rects(r1))
    r2t = jax.block_until_ready(pack_rects(r2))
    dt = _diff_time(
        _sat_pallas_loop,
        (r1t, r2t, jnp.int32(1)),
        (r1t, r2t, jnp.int32(1 + iters)),
        iters,
    )
    rate = pairs / dt
    return {
        "metric": "sat_rect_pairs_per_sec_pallas",
        "value": rate,
        "unit": "pairs/s",
        "vs_baseline": rate / SAT_TARGET,
        "seconds_per_iter": dt,
        "pairs": pairs,
        "effective_gbps": 128 * pairs / dt / 1e9,
    }


def _bench_configs(n: int) -> Configs:
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return Configs(
        position=jax.random.uniform(ks[0], (n, 2), jnp.float32, -6, 6),
        pose_theta=jax.random.uniform(ks[1], (n,), jnp.float32, 0, 2 * np.pi),
        obstacle_wh=jax.random.uniform(ks[2], (n, 2), jnp.float32, 0.1, 5),
        std_dev=jax.random.uniform(ks[3], (n, 5), jnp.float32, 0, 0.55),
    )


def _mc_loop_factory(step_samples: int):
    @jax.jit
    def loop(key, uids, configs, robot_wh, k):
        base_keys = _per_config_keys(key, uids)

        def body(i, acc):
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(base_keys, i)
            return acc + jnp.sum(
                _counts_chunk(step_keys, configs, robot_wh, step_samples, False),
                dtype=jnp.int32,
            )

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    return loop


def bench_mc(configs: int = 65536, step_samples: int = 128, iters: int = 20) -> dict:
    """Fused MC sampling throughput: noise draw + obstacle build + SAT +
    reduction, the hot loop of the dataset generator."""
    cfgs = jax.block_until_ready(_bench_configs(configs))
    uids = jnp.arange(configs, dtype=jnp.int32)
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    loop = _mc_loop_factory(step_samples)
    key = jax.random.PRNGKey(0)
    args1 = (key, uids, cfgs, robot, jnp.int32(1))
    args2 = (key, uids, cfgs, robot, jnp.int32(1 + iters))
    dt = _diff_time(loop, args1, args2, iters)
    rate = configs * step_samples / dt
    return {
        "metric": "mc_samples_per_sec",
        "value": rate,
        "unit": "samples/s",
        "vs_baseline": rate / SAT_TARGET,
        "seconds_per_step": dt,
        "configs": configs,
        "step_samples": step_samples,
    }


def bench_e2e(configs: int = 65536, seed: int = 0) -> dict:
    """End-to-end adaptive labeling throughput at REFERENCE-DEFAULT
    accuracy bins and sample schedule (SURVEY.md §6 metric (c): configs
    labeled per hour). Runs the full driver twice — the first pass warms
    every bucket-shape compilation — and times the second."""
    from collide2d_tpu.mc.estimator import (
        AdaptiveConfig,
        Configs,
        adaptive_collision_probabilities,
    )
    from collide2d_tpu.mc.noise import sample_configurations

    key = jax.random.PRNGKey(seed)
    k_tab, k_cfg, k_mc = jax.random.split(key, 3)
    rngs = jax.random.split(k_tab, 2)
    poses = jax.random.uniform(
        rngs[0], (4096, 3), jnp.float32,
        jnp.asarray([0.1, 0.1, 0.0]), jnp.asarray([5.0, 5.0, 2 * np.pi]),
    )
    std_devs = jnp.sqrt(
        jax.random.uniform(rngs[1], (4096, 5), jnp.float32, 0.0, 0.3)
        .at[:, 3:].set(0.0)
    )
    positions, pose_idx, var_idx = sample_configurations(
        k_cfg, configs, poses, std_devs, r_offset=(4.07 + 1.74) / 4, spread=4.0
    )
    pose = poses[pose_idx]
    cfgs = Configs(
        position=positions,
        pose_theta=pose[:, 2],
        obstacle_wh=pose[:, 0:2],
        std_dev=std_devs[var_idx],
    )
    adaptive = AdaptiveConfig()  # reference defaults: bins, schedule, 4e6 cap

    def run():
        t0 = time.perf_counter()
        cp, n_used, done = adaptive_collision_probabilities(
            k_mc, cfgs, jnp.asarray([4.07, 1.74]), adaptive
        )
        return time.perf_counter() - t0, cp, n_used, done

    run()  # warm every bucket-shape compilation
    dt, cp, n_used, done = run()
    rate = configs / dt
    return {
        "metric": "configs_labeled_per_sec",
        "value": rate,
        "unit": "configs/s",
        "vs_baseline": rate,  # no reference number exists (BASELINE.md)
        "configs": configs,
        "seconds": dt,
        "configs_per_hour": rate * 3600,
        "converged_frac": float(done.mean()),
        "mean_samples_per_config": float(np.asarray(n_used).mean()),
        "mean_cp": float(np.asarray(cp).mean()),
    }


def run_all(pairs: int = 1 << 22, iters: int = 20) -> list[str]:
    return [
        json.dumps(bench_sat_pallas(pairs=pairs, iters=iters)),
        json.dumps(bench_sat(pairs=pairs, iters=iters)),
        json.dumps(bench_mc()),
        json.dumps(bench_e2e()),
    ]
