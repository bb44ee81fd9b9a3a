"""Adaptive-stop statistics: Wald CI slack + accuracy-bin lookup.

TPU-native equivalents of `calcSlack` (utils.cu:186-196) and `getBin`
(utils.cu:198-207) — pure elementwise jnp, broadcastable over any batch
shape, jit/vmap-safe.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array

# Reference constants (utils.cu:188-189).
Z_SCORE = 1.96
ALPHA = 0.025
_LOG_INV_ALPHA = float(np.log(1.0 / ALPHA))  # ln(40) — rule-of-three numerator


def calc_slack(n_samples, n_true) -> Array:
    """Wald confidence-interval half-width with rule-of-three fallback.

    Mirrors `calcSlack` (utils.cu:186-196): when the empirical count is
    degenerate (k == 0 or k == n) the rule-of-three bound ln(1/alpha)/n is
    used; otherwise z/n * sqrt(k - k^2/n) with z = 1.96.

    Computed in float32 throughout. NOTE a latent reference bug is fixed
    (documented divergence, SURVEY.md §2): the reference multiplies
    `nsamples_true * nsamples_true` in int32, which overflows for
    k > 46340; we compute k^2 in float32, which is exact enough here and
    never overflows. With the reference's DEFAULT bins the overflow is
    unreachable (active configs never exceed k ≈ 4.6e4), so labels agree.

    ``n_samples``/``n_true``: broadcastable integer or float arrays.
    Returns float32 slack of the same broadcast shape.
    """
    n = jnp.asarray(n_samples, jnp.float32)
    k = jnp.asarray(n_true, jnp.float32)
    degenerate = jnp.logical_or(k == n, k == 0)
    rule_of_three = _LOG_INV_ALPHA / n
    # Guard the sqrt against tiny negative rounding when k ≈ n.
    wald = Z_SCORE / n * jnp.sqrt(jnp.maximum(k - k * k / n, 0.0))
    return jnp.where(degenerate, rule_of_three, wald)


def get_bin(p, accuracy_bins) -> Array:
    """Accuracy-bin index: LAST i such that bins[i] <= p <= bins[i+1].

    Mirrors the linear scan of `getBin` (utils.cu:198-207) — inclusive on
    both ends, so a boundary value (e.g. p == 0.01 with default bins)
    lands in the LATER bin, exactly as the reference's last-match-wins
    scan does. Returns 0 when nothing matches (p outside [bins[0],
    bins[-1]]), like the reference's `bin = 0` initialization.

    NOTE (documented divergence, SURVEY.md §2): every reference call site
    passes `accuracy_bins.size()` (= n_bins + 1) as the loop bound, making
    the final scan iteration read one element past the array — an
    out-of-bounds access with undefined contents. We implement the
    intended semantics: exactly n_bins = len(accuracy_bins) - 1 intervals.

    ``p``: any batch shape. ``accuracy_bins``: 1-D, length n_bins + 1,
    ascending. Returns int32 bin indices, same shape as ``p``.
    """
    bins = jnp.asarray(accuracy_bins, jnp.float32)
    p = jnp.asarray(p, jnp.float32)[..., None]
    match = jnp.logical_and(p >= bins[:-1], p <= bins[1:])  # B + (n_bins,)
    n_bins = bins.shape[0] - 1
    # Last matching index: argmax of the reversed mask finds the first
    # True from the end; all-False falls back to bin 0 like the reference.
    last = (n_bins - 1) - jnp.argmax(match[..., ::-1], axis=-1).astype(jnp.int32)
    return jnp.where(jnp.any(match, axis=-1), last, 0)


def is_converged(n_samples, n_true, accuracy_bins, bin_accuracy) -> Array:
    """The per-configuration done flag of the reference kernels.

    Mirrors generate_dataset.cu:243-252: converged when
    ``calc_slack(n, k) <= bin_accuracy[get_bin(k/n, accuracy_bins)]``.
    """
    n = jnp.asarray(n_samples, jnp.float32)
    k = jnp.asarray(n_true, jnp.float32)
    slack = calc_slack(n, k)
    p = k / n
    target = jnp.asarray(bin_accuracy, jnp.float32)[get_bin(p, accuracy_bins)]
    return slack <= target
