"""Parameter calibration: batched Ensemble Kalman Inversion + gradient fits.

The reference (CliMA/Cloudy.jl) has no calibration code of its own — in the
CliMA stack, Cloudy's kernel/closure parameters are calibrated externally by
EnsembleKalmanProcesses.jl, which treats the model as a black box precisely
because the Julia implementation exposes no gradients. This module is the
BUILD-NEW equivalent designed for this framework's two structural advantages:

1. **The forward model is a batched JAX program.** An EKI ensemble of J
   parameter vectors is evaluated as ONE `jax.vmap`-batched forward pass —
   J trajectories integrate in a single `lax.scan` on-device (columns on
   VPU lanes, matmuls on the MXU), instead of J independent model runs
   round-tripping through a host-side calibration driver.
2. **The forward model is differentiable** (tests/test_autodiff.py), so
   gradient-based fitting (`fit_gradient`, optax) is available as well —
   a capability the reference ecosystem's black-box EKP workflow lacks.

Both drivers are pure functions of (key, data): the whole calibration loop —
ensemble propagation, Kalman update, misfit history — is one jitted
`lax.scan`, with no host round-trips between iterations.

EKI update (perturbed-observation form, Iglesias/Law/Stuart 2013):
    θ_{n+1}^{(j)} = θ_n^{(j)} + C_θg (C_gg + Γ)^{-1} (y + η^{(j)} − g^{(j)})
with C_θg, C_gg the ensemble cross-/auto-covariances of parameters and
forward evaluations, Γ the observation-noise covariance, η ~ N(0, Γ).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class EKIResult(NamedTuple):
    """`theta`: final ensemble [J, P]. `theta_history`: [n_iters+1, J, P].
    `misfit_history`: [n_iters+1] mean data misfit ‖Γ^{-1/2}(y − g)‖²/D
    (whitened mean-square residual; ~1 at the noise floor)."""

    theta: jnp.ndarray
    theta_history: jnp.ndarray
    misfit_history: jnp.ndarray


def _as_cov(noise_cov, d, dtype):
    """Accept a scalar, a diagonal [D], or a full [D, D] covariance."""
    g = jnp.asarray(noise_cov, dtype)
    if g.ndim == 0:
        return g * jnp.eye(d, dtype=dtype)
    if g.ndim == 1:
        return jnp.diag(g)
    return g


def eki_step(theta, g, y, noise_cov, key):
    """One perturbed-observation EKI update.

    theta: [J, P] parameter ensemble; g: [J, D] forward evaluations G(θ);
    y: [D] observations; noise_cov: scalar | [D] | [D, D]. Returns the
    updated [J, P] ensemble. All covariance work is two small matmuls and
    one Cholesky solve of a [D, D] system — MXU-friendly, J-batched."""
    J, _ = theta.shape
    d = y.shape[0]
    gamma = _as_cov(noise_cov, d, theta.dtype)

    th_a = theta - jnp.mean(theta, axis=0, keepdims=True)  # [J, P]
    g_a = g - jnp.mean(g, axis=0, keepdims=True)  # [J, D]
    c_thg = th_a.T @ g_a / (J - 1)  # [P, D]
    c_gg = g_a.T @ g_a / (J - 1)  # [D, D]

    eta = jax.random.multivariate_normal(
        key, jnp.zeros(d, theta.dtype), gamma, (J,), method="svd"
    )
    resid = y[None, :] + eta - g  # [J, D]
    # solve (C_gg + Γ) X = residᵀ ; symmetric PSD → Cholesky
    sol = jax.scipy.linalg.solve(
        c_gg + gamma, resid.T, assume_a="pos"
    )  # [D, J]
    return theta + (c_thg @ sol).T


def run_eki(
    forward: Callable,
    theta0,
    y,
    noise_cov,
    n_iters: int,
    key,
    transform: Optional[Callable] = None,
) -> EKIResult:
    """Run `n_iters` EKI iterations as ONE jitted `lax.scan`.

    ``forward(theta_single [P]) -> [D]`` is the per-member forward map; it is
    `jax.vmap`-batched over the ensemble here (do NOT pre-vmap). ``transform``
    optionally maps the unconstrained θ the EKI updates into the model's
    native parameter space inside `forward` composition (e.g. `jnp.exp` for
    positivity — the standard EKP trick); misfits are reported in data space
    either way."""
    theta0 = jnp.atleast_2d(jnp.asarray(theta0))
    y = jnp.asarray(theta0.dtype.type(1) * jnp.asarray(y))
    d = y.shape[0]
    gamma = _as_cov(noise_cov, d, theta0.dtype)
    # whitening by Γ^{-1/2} for the misfit diagnostic
    gamma_chol = jnp.linalg.cholesky(gamma)

    fwd1 = forward if transform is None else (lambda t: forward(transform(t)))
    fwd = jax.vmap(fwd1)

    def misfit(g):
        r = jax.scipy.linalg.solve_triangular(
            gamma_chol, (y[None, :] - g).T, lower=True
        )
        return jnp.mean(r**2)

    def body(carry, k):
        theta = carry
        g = fwd(theta)
        theta_next = eki_step(theta, g, y, gamma, k)
        return theta_next, (theta, misfit(g))

    keys = jax.random.split(key, n_iters)
    theta_f, (th_hist, mf_hist) = jax.lax.scan(body, theta0, keys)
    g_f = fwd(theta_f)
    theta_history = jnp.concatenate([th_hist, theta_f[None]], axis=0)
    misfit_history = jnp.concatenate([mf_hist, misfit(g_f)[None]], axis=0)
    return EKIResult(theta_f, theta_history, misfit_history)


def ensemble_init(key, prior_mean, prior_std, n_ens: int):
    """Draw an [J, P] initial ensemble from an independent-normal prior."""
    mean = jnp.atleast_1d(jnp.asarray(prior_mean))
    std = jnp.broadcast_to(jnp.asarray(prior_std, mean.dtype), mean.shape)
    return mean[None, :] + std[None, :] * jax.random.normal(
        key, (n_ens, mean.shape[0]), mean.dtype
    )


class GradFitResult(NamedTuple):
    params: jnp.ndarray
    loss_history: jnp.ndarray


def fit_gradient(
    loss: Callable,
    params0,
    n_iters: int,
    optimizer=None,
    learning_rate: float = 1e-2,
) -> GradFitResult:
    """Gradient-descent calibration: minimize ``loss(params)`` with optax
    (default: adam). The whole optimization is one jitted `lax.scan` —
    value_and_grad + optimizer update per iteration, no host sync. Exercises
    the end-to-end differentiability the Julia reference lacks
    (tests/test_autodiff.py)."""
    import optax

    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    params0 = jnp.asarray(params0)
    vg = jax.value_and_grad(loss)

    def body(carry, _):
        p, st = carry
        v, g = vg(p)
        updates, st = opt.update(g, st, p)
        return (optax.apply_updates(p, updates), st), v

    (p_f, _), hist = jax.lax.scan(
        body, (params0, opt.init(params0)), None, length=n_iters
    )
    return GradFitResult(p_f, hist)
