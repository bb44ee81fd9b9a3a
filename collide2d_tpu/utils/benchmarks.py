"""Throughput benchmarks — the framework defines the baseline, since the
reference publishes no numbers (BASELINE.md). Measures:

  (a) raw batched SAT rectangle-pair tests/sec (north star: >= 1e9/chip),
  (b) Monte Carlo collision-probability samples/sec,
  (c) end-to-end configurations labeled per second at reference-default
      accuracy bins (scaled-down batch).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from collide2d_tpu.mc.estimator import Configs, mc_round
from collide2d_tpu.ops.sat import sat_rects
from collide2d_tpu.ops.geometry import rects_from_params

SAT_TARGET = 1e9  # BASELINE.json north star: SAT pairs/sec/chip


def _random_pairs(n: int, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 10)
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


def _time(fn, iters: int) -> float:
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_sat(pairs: int = 1 << 20, iters: int = 20) -> dict:
    """Batched SAT over random rectangle pairs (BASELINE config #2)."""
    r1, r2 = _random_pairs(pairs)
    r1, r2 = jax.block_until_ready((r1, r2))
    f = jax.jit(lambda a, b: jnp.sum(sat_rects(a, b)))
    dt = _time(lambda: f(r1, r2), iters)
    rate = pairs / dt
    return {
        "metric": "sat_rect_pairs_per_sec",
        "value": rate,
        "unit": "pairs/s",
        "vs_baseline": rate / SAT_TARGET,
        "seconds_per_iter": dt,
        "pairs": pairs,
    }


def bench_mc(configs: int = 8192, n_batch: int = 4096, iters: int = 10) -> dict:
    """Fused MC sampling throughput (noise draw + obstacle build + SAT)."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    cfgs = Configs(
        position=jax.random.uniform(ks[0], (configs, 2), jnp.float32, -6, 6),
        pose_theta=jax.random.uniform(ks[1], (configs,), jnp.float32, 0, 2 * np.pi),
        obstacle_wh=jax.random.uniform(ks[2], (configs, 2), jnp.float32, 0.1, 5),
        std_dev=jax.random.uniform(ks[3], (configs, 5), jnp.float32, 0, 0.55),
    )
    cfgs = jax.block_until_ready(cfgs)
    uids = jnp.arange(configs, dtype=jnp.int32)
    robot = jnp.asarray([4.07, 1.74], jnp.float32)

    def f():
        return mc_round(key, uids, cfgs, robot, jnp.int32(0), n_batch=n_batch)

    dt = _time(f, iters)
    rate = configs * n_batch / dt
    return {
        "metric": "mc_samples_per_sec",
        "value": rate,
        "unit": "samples/s",
        "vs_baseline": rate / SAT_TARGET,
        "seconds_per_iter": dt,
        "configs": configs,
        "n_batch": n_batch,
    }


def run_all(pairs: int = 1 << 20, iters: int = 20) -> list[str]:
    return [
        json.dumps(bench_sat(pairs=pairs, iters=iters)),
        json.dumps(bench_mc()),
    ]
