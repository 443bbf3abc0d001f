"""Kernel calibration from noisy observations — EKI vs gradient descent.

NO reference counterpart: CliMA calibrates Cloudy.jl externally through
EnsembleKalmanProcesses.jl (black-box, host-driven). Here both drivers are
on-device JAX programs (cloudy_tpu/calibrate.py): EKI evaluates its whole
ensemble as one vmapped forward pass inside a `lax.scan`, and the gradient
fit uses `jax.grad` through the full closure-inversion + SSPRK33 pipeline —
impossible for the Julia reference.
"""
from common import *

import os

import jax
import jax.numpy as jnp

from cloudy_tpu import calibrate, distributions as pd, stepper
from cloudy_tpu.coalescence import build_coalescence_data, get_coal_ints

spec = SpectrumSpec((Family.GAMMA,))
ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
data = build_coalescence_data(spec, ker, (np.inf,), norms=(1e6, 1e-9))
mom0 = jnp.asarray([1e2, 1e1, 2.0])


def forward(log_s):
    """Observe LOG-moments at three times: the moments span ~9 decades over
    the prior's s-range, so log space is what keeps the EKI covariance solve
    well-conditioned (and f32-safe) — the standard multiscale-observable
    treatment in EKP practice."""
    s = jnp.exp(log_s[0] if log_s.ndim else log_s)

    def rhs(m, t):
        del t
        return s * get_coal_ints(data, pd.params_from_moments(spec, m))

    _, ys = stepper.integrate(rhs, mom0, 0.0, 2.0, 15, method="ssprk33")
    return jnp.log(ys[jnp.asarray([5, 10, 15])]).reshape(-1)


s_true, noise = 1.7, 1e-3
key = jax.random.PRNGKey(0)
k_obs, k_ens, k_run = jax.random.split(key, 3)
y = forward(jnp.log(jnp.asarray(s_true)))
y = y + noise * jax.random.normal(k_obs, y.shape, y.dtype)

fast = bool(os.environ.get("CLOUDY_EXAMPLE_FAST"))

# --- EKI: 24-member ensemble, one jitted scan
theta0 = calibrate.ensemble_init(k_ens, [0.0], [0.7], n_ens=24)
res = calibrate.run_eki(
    forward, theta0, y, noise**2, n_iters=3 if fast else 6, key=k_run
)
s_eki = float(jnp.exp(res.theta[:, 0].mean()))
print(f"EKI:      s = {s_eki:.4f} (truth {s_true}); "
      f"misfit {float(res.misfit_history[0]):.3g} -> "
      f"{float(res.misfit_history[-1]):.3g}")

# --- gradient descent through the full differentiable model
# --- EKS: posterior SAMPLES (the ensemble keeps its spread at equilibrium)
res_s = calibrate.run_eks(
    forward, theta0, y, noise**2, [0.0], [0.7**2],
    n_iters=10 if fast else 30, key=jax.random.fold_in(k_run, 1),
)
print(f"EKS:      s = {float(jnp.exp(res_s.theta[:, 0].mean())):.4f} "
      f"(truth {s_true}); ensemble std(log s) = "
      f"{float(jnp.std(res_s.theta[:, 0])):.2e}; "
      f"misfit {float(res_s.misfit_history[0]):.3g} -> "
      f"{float(res_s.misfit_history[-1]):.3g}")

# --- UKI: deterministic sigma-point quadrature, 2 forward evals/iter,
# converged covariance = posterior uncertainty of log s
res_u = calibrate.run_uki(
    forward, [0.0], [0.7**2], y, noise**2, n_iters=4 if fast else 8
)
print(f"UKI:      s = {float(jnp.exp(res_u.mean[0])):.4f} (truth {s_true}); "
      f"posterior std(log s) = {float(jnp.sqrt(res_u.cov[0, 0])):.2e}; "
      f"misfit {float(res_u.misfit_history[0]):.3g} -> "
      f"{float(res_u.misfit_history[-1]):.3g}")

res_g = calibrate.fit_gradient(
    lambda t: jnp.sum((forward(t) - y) ** 2),
    jnp.asarray(0.0), n_iters=40 if fast else 120, learning_rate=0.1,
)
print(f"gradient: s = {float(jnp.exp(res_g.params)):.4f} (truth {s_true}); "
      f"loss {float(res_g.loss_history[0]):.3g} -> "
      f"{float(res_g.loss_history[-1]):.3g}")
print("done")
