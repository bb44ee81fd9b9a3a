"""Adaptive-stop statistics vs the reference formulas (utils.cu:186-207)."""

import numpy as np
import jax.numpy as jnp

from collide2d_tpu.mc.stats import calc_slack, get_bin, is_converged

BINS = (0.0, 0.01, 0.1, 1.0)
ACC = (0.0001, 0.001, 0.01)


def _ref_calc_slack(n, k):
    z = np.float32(1.96)
    if k == n or k == 0:
        return np.float32(np.log(1.0 / 0.025) / n)
    return np.float32(z / n * np.sqrt(np.float32(k) - np.float32(k) * k / np.float32(n)))


def test_calc_slack_fallback_branches():
    # k == 0 and k == n hit the rule-of-three branch (utils.cu:190-192).
    for n in (1000, 20000, 4000000):
        for k in (0, n):
            got = float(calc_slack(n, k))
            np.testing.assert_allclose(got, np.log(40.0) / n, rtol=1e-6)


def test_calc_slack_wald_branch():
    for n, k in [(1000, 13), (20000, 777), (120000, 46000), (4000000, 40000)]:
        got = float(calc_slack(n, k))
        np.testing.assert_allclose(got, _ref_calc_slack(n, k), rtol=1e-5)


def test_calc_slack_no_int_overflow():
    # The reference's int32 k*k overflows for k > 46340 (latent bug,
    # SURVEY.md §2); ours must stay finite and correct.
    n, k = 4_000_000, 2_000_000
    got = float(calc_slack(n, k))
    want = 1.96 / n * np.sqrt(k - k * k / n)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert np.isfinite(got)


def test_get_bin_last_match_wins():
    # Boundary p falls in the LATER bin, like the reference's scan.
    assert int(get_bin(0.0, BINS)) == 0
    assert int(get_bin(0.005, BINS)) == 0
    assert int(get_bin(0.01, BINS)) == 1  # boundary: last match
    assert int(get_bin(0.05, BINS)) == 1
    assert int(get_bin(0.1, BINS)) == 2  # boundary: last match
    assert int(get_bin(0.5, BINS)) == 2
    assert int(get_bin(1.0, BINS)) == 2


def test_get_bin_out_of_range_defaults_zero():
    assert int(get_bin(1.5, BINS)) == 0
    assert int(get_bin(-0.1, BINS)) == 0


def test_get_bin_batched():
    p = jnp.asarray(np.linspace(0, 1, 101, dtype=np.float32))
    got = np.array(get_bin(p, BINS))
    want = np.zeros(101, np.int64)
    for i, bins in enumerate(zip(BINS[:-1], BINS[1:])):
        lo, hi = bins
        m = (p >= lo) & (p <= hi)
        want[np.array(m)] = i
    np.testing.assert_array_equal(got, want)


def test_is_converged_matches_kernel_rule():
    # Mirrors generate_dataset.cu:243-252 on a few hand cases.
    # p = 0.5 at n=20000: slack ~ 0.0069 <= 0.01 (bin 2) -> done.
    assert bool(is_converged(20000, 10000, jnp.asarray(BINS), jnp.asarray(ACC)))
    # p = 0.5 at n=1000: slack ~ 0.031 > 0.01 -> not done.
    assert not bool(is_converged(1000, 500, jnp.asarray(BINS), jnp.asarray(ACC)))
    # k = 0 at n=40000: rule-of-three 9.2e-5 <= 1e-4 (bin 0) -> done.
    assert bool(is_converged(40000, 0, jnp.asarray(BINS), jnp.asarray(ACC)))
    assert not bool(is_converged(36000, 0, jnp.asarray(BINS), jnp.asarray(ACC)))
