"""Monte Carlo estimator: analytic cases, oracle agreement, adaptive stop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import SAT
from collide2d_tpu.mc.estimator import (
    AdaptiveConfig,
    Configs,
    adaptive_collision_probabilities,
    collision_probability,
    mc_round,
)
from collide2d_tpu.mc.noise import sample_configurations, sampled_obstacle_vertices, NoiseParams
from collide2d_tpu.mc.stats import calc_slack, get_bin

ROBOT_WH = (4.07, 1.74)


from tests.conftest import random_configs as _configs


def test_zero_variance_equals_deterministic_label(rng):
    # sigma = 0 => every sample is the base obstacle => cp is exactly the
    # deterministic SAT label (SURVEY.md §4b analytic case).
    n = 128
    cfgs = Configs(
        position=jnp.asarray(rng.uniform(-6, 6, (n, 2)).astype(np.float32)),
        pose_theta=jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32)),
        obstacle_wh=jnp.asarray(rng.uniform(0.5, 5, (n, 2)).astype(np.float32)),
        std_dev=jnp.zeros((n, 5), jnp.float32),
    )
    cp = np.array(collision_probability(jax.random.PRNGKey(0), cfgs, ROBOT_WH, 512))
    want = np.array(
        [
            SAT.convex_collide(
                SAT.rot_trans_rectangle(
                    SAT.create_rect(*ROBOT_WH),
                    float(cfgs.position[i, 0]),
                    float(cfgs.position[i, 1]),
                    float(cfgs.pose_theta[i]),
                ),
                SAT.create_rect(
                    float(cfgs.obstacle_wh[i, 0]), float(cfgs.obstacle_wh[i, 1])
                ),
            )
            for i in range(n)
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(cp, want)


def test_vertex_and_obb_paths_agree_statistically(rng):
    n = 64
    cfgs = _configs(rng, n, sigma=0.3, shape_sigma=0.2)
    key = jax.random.PRNGKey(7)
    cp_obb = np.array(
        collision_probability(key, cfgs, ROBOT_WH, 4000, use_vertices=False)
    )
    cp_vtx = np.array(
        collision_probability(key, cfgs, ROBOT_WH, 4000, use_vertices=True)
    )
    # Same keys, same samples: paths may only differ on exact-boundary
    # draws, which have measure ~0.
    np.testing.assert_allclose(cp_obb, cp_vtx, atol=2e-3)


def test_mc_vs_numpy_oracle_estimate(rng):
    # TPU estimate within MC tolerance of an independent NumPy MC using
    # the SAT.py oracle (BASELINE ±0.005 agreement criterion at 10k).
    n = 12
    cfgs = _configs(rng, n, sigma=0.25, shape_sigma=0.1)
    cp = np.array(collision_probability(jax.random.PRNGKey(3), cfgs, ROBOT_WH, 10_000))

    n_ref = 10_000
    for i in range(n):
        robot = SAT.rot_trans_rectangle(
            SAT.create_rect(*ROBOT_WH),
            float(cfgs.position[i, 0]),
            float(cfgs.position[i, 1]),
            float(cfgs.pose_theta[i]),
        )
        sd = np.array(cfgs.std_dev[i])
        d = rng.normal(size=(n_ref, 5)).astype(np.float32) * sd
        w = float(cfgs.obstacle_wh[i, 0]) + d[:, 3]
        h = float(cfgs.obstacle_wh[i, 1]) + d[:, 4]
        hits = 0
        for s in range(n_ref):
            obst = SAT.rot_trans_rectangle(
                SAT.create_rect(w[s], h[s]), d[s, 0], d[s, 1], d[s, 2]
            )
            hits += SAT.convex_collide(robot, obst)
        want = hits / n_ref
        # Two independent 10k-sample estimates: 3-sigma of the difference.
        tol = 3 * np.sqrt(2 * max(want * (1 - want), 1e-4) / n_ref) + 0.005
        assert abs(cp[i] - want) <= tol, (i, cp[i], want, tol)


def test_mc_round_compaction_invariance(rng):
    # Per-config uid keys: results must not depend on position within the
    # buffer (the property the halving-bucket repacking relies on).
    n = 32
    cfgs = _configs(rng, n)
    key = jax.random.PRNGKey(11)
    uids = jnp.arange(n, dtype=jnp.int32)
    full = np.array(
        mc_round(key, uids, cfgs, jnp.asarray(ROBOT_WH), jnp.int32(0), n_batch=500)
    )
    perm = rng.permutation(n)
    permuted = Configs(*(jnp.asarray(np.array(a)[perm]) for a in cfgs))
    got = np.array(
        mc_round(
            key,
            jnp.asarray(perm.astype(np.int32)),
            permuted,
            jnp.asarray(ROBOT_WH),
            jnp.int32(0),
            n_batch=500,
        )
    )
    np.testing.assert_array_equal(got, full[perm])


def test_adaptive_meets_ci_criterion(rng):
    n = 64
    cfgs = _configs(rng, n, sigma=0.3)
    cfg = AdaptiveConfig(
        max_samples=100_000, initial_batch=1000, later_batch=20_000,
        initial_phase_samples=20_000, bin_accuracy=(0.002, 0.004, 0.01),
    )
    cp, n_used, converged = adaptive_collision_probabilities(
        jax.random.PRNGKey(5), cfgs, ROBOT_WH, cfg
    )
    assert (n_used > 0).all()
    assert converged.mean() > 0.5  # most configs converge at these targets
    # Every converged label satisfies its bin's CI criterion at emit time.
    k = np.round(cp * n_used).astype(np.int64)
    slack = np.array(calc_slack(jnp.asarray(n_used), jnp.asarray(k)))
    target = np.array(jnp.asarray(cfg.bin_accuracy))[
        np.array(get_bin(jnp.asarray(cp), jnp.asarray(cfg.accuracy_bins)))
    ]
    assert (slack[converged] <= target[converged] + 1e-7).all()
    # Unconverged rows were flushed at the cap.
    assert (n_used[~converged] >= cfg.max_samples).all() or converged.all()


def test_adaptive_matches_fixed_estimate(rng):
    # Adaptive cp ~ fixed-budget cp for the same configs (statistical).
    n = 24
    cfgs = _configs(rng, n, sigma=0.2)
    cfg = AdaptiveConfig(
        max_samples=40_000, initial_batch=2000, later_batch=10_000,
        initial_phase_samples=10_000,
    )
    cp_a, _, _ = adaptive_collision_probabilities(
        jax.random.PRNGKey(9), cfgs, ROBOT_WH, cfg
    )
    cp_f = np.array(collision_probability(jax.random.PRNGKey(10), cfgs, ROBOT_WH, 40_000))
    np.testing.assert_allclose(cp_a, cp_f, atol=0.03)


def test_sampled_obstacle_vertices_semantics():
    # Additive shape noise then rotate+translate (utils.cu:144-157):
    # equals rect(w+dw, h+dh) transformed.
    noise = NoiseParams(
        dx=jnp.float32(0.3), dy=jnp.float32(-0.2), dtheta=jnp.float32(0.7),
        dw=jnp.float32(0.1), dh=jnp.float32(-0.4),
    )
    got = np.array(sampled_obstacle_vertices(jnp.asarray([2.0, 3.0]), noise))
    want = SAT.rot_trans_rectangle(SAT.create_rect(2.1, 2.6), 0.3, -0.2, 0.7).reshape(4, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_configurations_geometry(rng):
    # Positions land on the sigma-padded elliptical ring of
    # generate_dataset.cu:207-219 (statistically: radius distribution).
    poses = jnp.asarray(rng.uniform(0.1, 5, (16, 3)).astype(np.float32))
    stds = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 0.5, (8, 3)), np.zeros((8, 2))], axis=1
        ).astype(np.float32)
    )
    pos, pose_idx, var_idx = sample_configurations(
        jax.random.PRNGKey(2), 4096, poses, stds, r_offset=1.4525, spread=4.0
    )
    pos = np.array(pos)
    pose_idx = np.array(pose_idx)
    var_idx = np.array(var_idx)
    assert pose_idx.min() >= 0 and pose_idx.max() < 16
    assert var_idx.min() >= 0 and var_idx.max() < 8
    # Indices roughly uniform.
    counts = np.bincount(pose_idx, minlength=16)
    assert counts.min() > 4096 / 16 * 0.5
    # With spread*sigma shift, positions concentrate in an annulus-ish
    # region: no positions at the origin (min radius >= 2.35 + w/2 +
    # r_offset - |shift| and shift is zero-mean).
    r = np.hypot(pos[:, 0], pos[:, 1])
    assert np.quantile(r, 0.05) > 1.0


def test_tuned_schedule_checkpoints():
    # "tuned" inserts ONE checkpoint just past the rule-of-three point
    # (ln(40)/1e-4 = 36889, rounded up to the 64-sample kernel granule)
    # where zero-probability configs can stop, then keeps the reference's
    # later_batch cadence to the cap.
    cfg = AdaptiveConfig(schedule="tuned")
    pts = cfg.checkpoints()
    assert pts[-1] == 36_928  # ceil(36889 / 64) * 64
    assert pts[:20] == tuple(range(1000, 21000, 1000))
    n, diffs = 0, []
    while n < cfg.max_samples:
        b = cfg.batch_for(n)
        n += b
        diffs.append(b)
    assert all(d % 8 == 0 for d in diffs)
    assert diffs[20] == 16_928  # 20k -> the rule-of-three point
    assert diffs[21] == cfg.later_batch  # then the reference cadence
    # the point scales with the tightest bin target, and degenerates
    # gracefully when it falls inside the initial phase
    loose = AdaptiveConfig(schedule="tuned", bin_accuracy=(0.005, 0.005, 0.01))
    assert loose.checkpoints() == tuple(range(1000, 21000, 1000))


def test_tuned_schedule_labels_satisfy_ci(rng):
    cfgs = _configs(rng, 48, sigma=0.3)
    cfg = AdaptiveConfig(
        schedule="tuned", max_samples=40_000, initial_batch=1000,
        initial_phase_samples=4000, bin_accuracy=(0.005, 0.005, 0.01),
    )
    cp, n_used, converged = adaptive_collision_probabilities(
        jax.random.PRNGKey(6), cfgs, ROBOT_WH, cfg
    )
    k = np.round(cp * n_used).astype(np.int64)
    slack = np.array(calc_slack(jnp.asarray(n_used), jnp.asarray(k)))
    target = np.array(jnp.asarray(cfg.bin_accuracy))[
        np.array(get_bin(jnp.asarray(cp), jnp.asarray(cfg.accuracy_bins)))
    ]
    assert (slack[converged] <= target[converged] + 1e-7).all()


def test_plan_round_prime_batch_never_degrades():
    # A prime --n_batch must not fall back to a 1-lane fori loop
    # (VERDICT r1 item 8): it is rounded UP to an efficient granule.
    from collide2d_tpu.mc.estimator import AdaptiveConfig, _plan_round

    cfg = AdaptiveConfig(fixed_batch=9973)  # prime
    nb, step = _plan_round(cfg, 0, 1, "jnp")
    assert nb >= 9973 and nb % step == 0
    assert step >= 64
    # reference defaults keep their exact batch sizes (canonical step:
    # largest divisor <= 512 with an 8-divisible step count, so the auto
    # choice is IDENTICAL for any sample axis in {1,2,4,8})
    ref = AdaptiveConfig()
    assert _plan_round(ref, 0, 1, "jnp") == (1000, 125)
    assert _plan_round(ref, 30_000, 1, "jnp") == (100_000, 500)
    zt = AdaptiveConfig(fixed_batch=10_000)
    assert _plan_round(zt, 0, 1, "jnp") == (10_000, 250)
    # shard-invariance of the auto step = the bitwise sample-axis
    # contract the CLI advertises (code-review r2 finding)
    for n_sample in (2, 4, 8):
        assert _plan_round(ref, 0, n_sample, "jnp") == (1000, 125)
        assert _plan_round(zt, 0, n_sample, "jnp") == (10_000, 250)
    # pallas rounds the batch to the 64-sample granule (largest sub-tile,
    # one compilation per buffer shape)
    nb_p, _ = _plan_round(AdaptiveConfig(fixed_batch=9973), 0, 1, "pallas")
    assert nb_p % 64 == 0 and nb_p >= 9973
    # explicit step_samples that divides the user's batch keeps it exact
    # on the jnp path (no surprise rounding -> no mid-run ValueError)
    ex = AdaptiveConfig(fixed_batch=500, step_samples=500)
    assert _plan_round(ex, 0, 1, "jnp") == (500, 500)


def test_adaptive_prime_fixed_batch_end_to_end(rng):
    # The whole driver works (and stays fast) with a pathological budget.
    cfgs = _configs(rng, 16)
    cfg = AdaptiveConfig(
        fixed_batch=997, max_samples=3000,
        bin_accuracy=(0.02, 0.02, 0.05), min_active=8,
    )
    cp, n_used, done = adaptive_collision_probabilities(
        jax.random.PRNGKey(3), cfgs, ROBOT_WH, cfg
    )
    assert (cp >= 0).all() and (cp <= 1).all()
    assert (n_used >= 997).all()  # rounded UP, never down


def test_adaptive_prune_sigma(rng):
    # prune_sigma: impossible configs emit cp=0 with zero samples; the
    # candidate subset gets labels bitwise-equal to the unpruned run
    # (uid-keyed streams survive the pre-compaction).
    from collide2d_tpu.ops.broad_phase import possible_collision_mask
    from collide2d_tpu.utils.benchmarks import _sparse_scene_configs

    cfgs = _sparse_scene_configs(256, box=20.0, seed=11)
    kwargs = dict(
        max_samples=4000, initial_batch=1000, initial_phase_samples=2000,
        later_batch=2000, bin_accuracy=(0.02, 0.02, 0.05), min_active=16,
        impl="jnp",
    )
    key = jax.random.PRNGKey(2)
    base_cp, base_n, base_done = adaptive_collision_probabilities(
        key, cfgs, ROBOT_WH, AdaptiveConfig(**kwargs)
    )
    cp, n_used, done = adaptive_collision_probabilities(
        key, cfgs, ROBOT_WH, AdaptiveConfig(prune_sigma=6.0, **kwargs)
    )
    mask = np.asarray(possible_collision_mask(cfgs, ROBOT_WH, 6.0))
    assert 0 < mask.sum() < len(mask)
    np.testing.assert_array_equal(cp[mask], base_cp[mask])
    np.testing.assert_array_equal(n_used[mask], base_n[mask])
    assert (cp[~mask] == 0).all() and (n_used[~mask] == 0).all()
    assert done[~mask].all()
    # and the unpruned run agrees the pruned rows never collide
    np.testing.assert_array_equal(base_cp[~mask], 0)


def test_round_up_bucket_ladder():
    from collide2d_tpu.mc.estimator import _round_up_bucket

    # half-step ladder: {.., 256, 384, 512, 768, 1024, ..}
    assert _round_up_bucket(300, 64) == 384
    assert _round_up_bucket(384, 64) == 384
    assert _round_up_bucket(385, 64) == 512
    assert _round_up_bucket(600, 64) == 768
    assert _round_up_bucket(1, 256) == 256
    # ladder sizes stay multiples of 8 (Pallas sub-tile) above 16
    for n in range(1, 5000, 37):
        b = _round_up_bucket(n, 64)
        assert b >= n and b % 8 == 0
        assert b <= 2 * n or b == 64  # never worse than the old 2x bound
    # sixteenth ladder: rungs at 2^k + i*2^(k-4) above 128 — padding
    # bounded at 6.25%, every rung still a multiple of 8
    assert _round_up_bucket(129, 64, "sixteenth") == 136
    assert _round_up_bucket(2049, 64, "sixteenth") == 2176
    for n in range(129, 5000, 37):
        b = _round_up_bucket(n, 64, "sixteenth")
        assert n <= b <= n + max(n // 16 + 16, 16) and b % 8 == 0
    # Each finer ladder is everywhere <= the coarser ones — including
    # below its own fine-rung threshold, where it must fall back to the
    # next-coarser spacing (review r3: sixteenth skipped the quarter
    # branch for 32 <= b < 64 and degraded to HALF rungs there).
    assert _round_up_bucket(33, 1, "sixteenth") == 40  # quarter rung
    for n in range(1, 700, 7):
        sizes = [_round_up_bucket(n, 1, lad)
                 for lad in ("sixteenth", "eighth", "quarter", "half")]
        assert sizes == sorted(sizes), (n, sizes)


def test_plan_round_shard_invariance_and_fallback():
    # review r2b findings: the plan must be IDENTICAL across sample axes
    # {1,2,4,8} even for prime batches (the 4096 bump is axis-free)...
    import warnings

    from collide2d_tpu.mc.estimator import AdaptiveConfig, _plan_round

    prime = AdaptiveConfig(fixed_batch=9973)
    plans = {n: _plan_round(prime, 0, n, "jnp") for n in (1, 2, 4, 8)}
    assert len(set(plans.values())) == 1, plans
    nb, step = plans[1]
    assert (nb // step) % 8 == 0
    # ...a pallas step pinned above the batch is clamped so the round tag
    # still advances (no identical-noise rounds)...
    small = AdaptiveConfig(fixed_batch=100, step_samples=512)
    nb_p, step_p = _plan_round(small, 0, 1, "pallas")
    assert nb_p // step_p >= 1
    # ...and an axis the canonical plan cannot serve falls back LOUDLY to
    # a valid shard-specific plan instead of crashing or diverging
    # silently.
    with pytest.warns(UserWarning, match="NOT be bitwise"):
        nb16, step16 = _plan_round(AdaptiveConfig(), 0, 16, "jnp")
    assert nb16 % (step16 * 16) == 0


def test_round_up_bucket_eighth_ladder():
    from collide2d_tpu.mc.estimator import _ladder_buckets, _round_up_bucket

    # eighth rungs at b >= 64: multiples of 8, padding <= 12.5%
    assert _round_up_bucket(65, 64, "eighth") == 72
    assert _round_up_bucket(100, 64, "eighth") == 104
    assert _round_up_bucket(128, 64, "eighth") == 128
    assert _round_up_bucket(129, 64, "eighth") == 144
    for n in range(64, 5000, 7):
        b = _round_up_bucket(n, 64, "eighth")
        assert b >= n and b % 8 == 0 and (b - n) / n <= 0.125
    # the warm list derives from the same function
    buckets = _ladder_buckets(1024, 64, "eighth")
    assert 1024 in buckets and all(b % 8 == 0 for b in buckets)


def test_fused_multi_round_equals_sequential_rounds(rng):
    # The round-fusion dispatch (one program looping n_rounds) must
    # reproduce per-round dispatches BIT FOR BIT: same tags
    # (chunk_offset + r*chunk_step), same convergence checkpoints
    # (n_first + r*nb), same freezing arithmetic.
    import jax
    import jax.numpy as jnp

    from collide2d_tpu.mc import estimator as est
    from tests.conftest import random_configs

    C, nb, step = 96, 1000, 100
    cfgs = random_configs(np.random.default_rng(3), C)
    key = jax.random.PRNGKey(9)
    robot = jnp.asarray([4.07, 1.74], jnp.float32)
    state0 = est._LoopState(
        uids=jnp.arange(C, dtype=jnp.int32),
        active=cfgs,
        n_true=jnp.zeros((C,), jnp.int32),
        done=jnp.zeros((C,), bool),
        k_frozen=jnp.zeros((C,), jnp.int32),
        n_frozen=jnp.ones((C,), jnp.int32),
    )
    kw = dict(
        step_samples=step, sub=0, use_vertices=False, impl="jnp",
        accuracy_bins=(0.0, 0.01, 0.1, 1.0),
        bin_accuracy=(0.02, 0.02, 0.05),
        mesh=None, shape_noise=True, poly_a_keep=None,
    )
    n_steps = nb // step
    # sequential: three single-round dispatches
    s_seq = state0
    for r in range(3):
        s_seq, done_seq = est._fused_round(
            key, s_seq, robot,
            jnp.int32(r * n_steps), jnp.int32((r + 1) * nb),
            jnp.int32(n_steps), jnp.int32(1), jnp.int32(0), jnp.int32(0),
            **kw,
        )
    # fused: one three-round dispatch
    s_fused, done_fused = est._fused_round(
        key, state0, robot,
        jnp.int32(0), jnp.int32(nb),
        jnp.int32(n_steps), jnp.int32(3), jnp.int32(nb), jnp.int32(n_steps),
        **kw,
    )
    assert int(done_seq) == int(done_fused) > 0
    for a, b in zip(jax.tree.leaves(s_seq), jax.tree.leaves(s_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
