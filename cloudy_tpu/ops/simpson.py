"""Fixed-grid Simpson integration on evenly spaced points.

Replicates the reference's `integrate_SimpsonEvenFast`
(src/ParticleDistributions/ParticleDistributions.jl:698-710), a Simpson rule
with 17/59/43/49-weight endpoint corrections, in two forms:

- a *static* weight vector (numpy, for thresholds known at trace time), and
- a *dynamic* masked weight vector (jnp, for runtime thresholds such as the
  MovingThreshold percentile path) over a fixed-size grid.

Both reproduce the reference's exact summation semantics, including the quirk
that the final grid point ``j = n_bins + 1`` is weighted 17/48 but its
integrand is defined to be zero (`y_func` returns 0 for j > n_bins,
src/ParticleDistributions/ParticleDistributions.jl:583-585).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def simpson_even_fast_weights(n_bins: int) -> np.ndarray:
    """Static weights w (length n_bins + 1) such that
    ``integral = dx * sum_j w[j] * y[j]`` matches the reference rule.

    Weights are accumulated additively so that small n_bins (where endpoint
    stencils overlap) sum exactly like the reference's expression.
    """
    if n_bins < 3:
        raise ValueError("n_bins must be at least 3")
    e = n_bins + 1  # number of points, 1-based last index
    w = np.zeros(e, dtype=np.float64)
    # interior: j = 5 .. n_bins - 3 (1-based), weight 1
    for j in range(5, n_bins - 3 + 1):
        w[j - 1] += 1.0
    for j, c in ((1, 17.0), (2, 59.0), (3, 43.0), (4, 49.0)):
        w[j - 1] += c / 48.0
    for j, c in ((e, 17.0), (e - 1, 59.0), (e - 2, 43.0), (e - 3, 49.0)):
        w[j - 1] += c / 48.0
    return w


def simpson_even_fast_weights_dynamic(n_points_max: int, n_bins, dtype=jnp.float64):
    """Dynamic-`n_bins` masked weights over a fixed grid of `n_points_max`
    points (1-based j = 1..n_points_max). Entries with j > n_bins + 1 get
    weight zero. `n_bins` may be a traced integer scalar.
    """
    j = jnp.arange(1, n_points_max + 1)
    nb = jnp.asarray(n_bins)[..., None]  # broadcast over batched n_bins
    e = nb + 1
    interior = ((j >= 5) & (j <= nb - 3)).astype(dtype)
    w = interior
    for jj, c in ((1, 17.0), (2, 59.0), (3, 43.0), (4, 49.0)):
        w = w + jnp.where(j == jj, c / 48.0, 0.0).astype(dtype)
    for off, c in ((0, 17.0), (1, 59.0), (2, 43.0), (3, 49.0)):
        w = w + jnp.where(j == e - off, c / 48.0, 0.0).astype(dtype)
    return w


def integrate_simpson_even_fast(y, dx, weights):
    """``dx * sum(w * y)`` along the last axis."""
    return dx * jnp.sum(weights * y, axis=-1)
