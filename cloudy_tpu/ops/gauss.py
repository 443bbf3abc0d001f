"""Fixed-node Gauss quadrature rules (init-time numpy, trace-time constants).

The reference's numerical coalescence path uses doubly-nested *adaptive*
quadrature (`quadgk`, src/Sources/Coalescence.jl:470-708) — unusable under XLA
(dynamic work). Here: static Gauss–Legendre panels, optionally in log space,
sized generously so the fixed-node result matches the adaptive one to well
below the reference's validation tolerances.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def gauss_legendre(n: int):
    """Nodes/weights on [-1, 1] (cached, numpy)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w


def nodes_on_interval(n: int, a, b):
    """GL nodes/weights mapped to [a, b]; a, b may be traced arrays
    (broadcast against the node axis appended last)."""
    x, w = gauss_legendre(n)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    a = jnp.asarray(a)[..., None]
    b = jnp.asarray(b)[..., None]
    half = 0.5 * (b - a)
    return a + half * (x + 1.0), half * w


def log_nodes(n: int, x_lo, x_hi):
    """GL nodes/weights for ∫ f(x) dx with substitution x = e^u,
    u ∈ [log x_lo, log x_hi]: returns (x_nodes, weights) where
    ``sum(w * f(x))`` approximates the integral (the Jacobian x is folded
    into the weights)."""
    u, wu = nodes_on_interval(n, jnp.log(x_lo), jnp.log(x_hi))
    x = jnp.exp(u)
    return x, wu * x
