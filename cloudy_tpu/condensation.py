"""Condensation / evaporation moment tendencies.

Reference src/Sources/Condensation.jl:22-37: growth-law projection
``dM_m = 3 ξ s · m · M_{m−2/3} · (4π/3)^{2/3} / ρ_l^{1/3}`` (zero for the
number moment m = 0) using *fractional* analytic moments.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cloudy_tpu.spec import SpectrumSpec
from cloudy_tpu import distributions as pdists


def get_cond_evap(spec: SpectrumSpec, params, s, xi, rho_l=1000.0) -> jnp.ndarray:
    """Tendency of all prognostic moments, shape [..., n_tot].

    - `s`: supersaturation (S_l − 1), may be batched
    - `xi`: condensation coefficient ξ(T, p)
    - `rho_l`: liquid water density
    """
    params = jnp.asarray(params)
    dtype = params.dtype
    s = jnp.asarray(s, dtype)
    xi = jnp.asarray(xi, dtype)
    coef = 3.0 * xi * s * (4.0 * np.pi / 3.0) ** (2.0 / 3.0) / rho_l ** (1.0 / 3.0)

    out = []
    for i in range(spec.n_modes):
        for m in range(spec.nprogmoms[i]):
            if m == 0:
                out.append(jnp.zeros(jnp.broadcast_shapes(params[..., 0, 0].shape, s.shape), dtype))
            else:
                frac = pdists.moment(spec, params, m - 2.0 / 3.0)[..., i]
                out.append(coef * m * frac)
    return jnp.stack(out, axis=-1)
