"""NetCDF / npz output writers.

Reference: test/examples/utils/netcdf_helpers.jl:10-125 (`box_output`,
`rainshaft_output`) — dimensions (t, [z], dist, order), per-mode + summed
moments, re-inverted distribution parameters, and the cloud/rain partition at
a fixed mass cutoff (5.236e-10 kg).

Writers use `scipy.io.netcdf_file` (NetCDF-3, no extra deps); `save_npz` is
the fast binary path for large ensembles.
"""

from __future__ import annotations


import numpy as np
import jax.numpy as jnp

from cloudy_tpu.spec import SpectrumSpec
from cloudy_tpu import distributions as pdists

RAIN_CUTOFF_KG = 5.236e-10  # reference netcdf_helpers.jl:104-121


def _per_mode_series(spec: SpectrumSpec, ys: np.ndarray):
    """Split a flat trajectory [..., n_tot] into per-mode padded moments
    [..., n_modes, max_nprog] (nan padding) and a params array."""
    n_max = max(spec.nprogmoms)
    out = np.full(ys.shape[:-1] + (spec.n_modes, n_max), np.nan)
    for i in range(spec.n_modes):
        o, n = spec.offsets[i], spec.nprogmoms[i]
        out[..., i, :n] = ys[..., o : o + n]
    return out


def box_output(
    path: str,
    spec: SpectrumSpec,
    ts: np.ndarray,
    ys: np.ndarray,
    norms=(1e6, 1e-9),
    cutoff: float = RAIN_CUTOFF_KG,
):
    """Write a 0-D box trajectory (reference `box_output`)."""
    from scipy.io import netcdf_file

    ts = np.asarray(ts)
    ys = np.asarray(ys)
    n_t = ts.shape[0]
    n_max = max(spec.nprogmoms)

    mom_norms = np.concatenate(
        [norms[0] * norms[1] ** np.arange(n) for n in spec.nprogmoms]
    )
    params = np.asarray(
        pdists.params_from_moments(spec, jnp.asarray(ys / mom_norms))
    )
    nq = pdists.get_standard_N_q(
        spec, jnp.asarray(params), cutoff / norms[1]
    )
    per_mode = _per_mode_series(spec, ys)

    with netcdf_file(path, "w") as f:
        f.createDimension("time", n_t)
        f.createDimension("dist", spec.n_modes)
        f.createDimension("order", n_max)
        f.createDimension("param", 3)

        def var(name, dims, data):
            v = f.createVariable(name, "d", dims)
            v[:] = np.asarray(data, dtype=np.float64)
            return v

        var("time", ("time",), ts)
        var("moments", ("time", "dist", "order"), np.nan_to_num(per_mode))
        var("moments_sum", ("time", "order"), np.nansum(per_mode, axis=-2))
        var("params", ("time", "dist", "param"), params)
        # cloud/rain partition, denormalized
        var("N_liq", ("time",), np.asarray(nq["N_liq"]) * norms[0])
        var("N_rai", ("time",), np.asarray(nq["N_rai"]) * norms[0])
        var("M_liq", ("time",), np.asarray(nq["M_liq"]) * norms[0] * norms[1])
        var("M_rai", ("time",), np.asarray(nq["M_rai"]) * norms[0] * norms[1])


def rainshaft_output(
    path: str,
    spec: SpectrumSpec,
    ts: np.ndarray,
    z: np.ndarray,
    ys: np.ndarray,
    norms=(1e6, 1e-9),
    cutoff: float = RAIN_CUTOFF_KG,
):
    """Write a 1-D rainshaft trajectory [n_t, nz, n_tot]
    (reference `rainshaft_output`)."""
    from scipy.io import netcdf_file

    ts = np.asarray(ts)
    z = np.asarray(z)
    ys = np.asarray(ys)
    n_t, nz = ts.shape[0], z.shape[0]
    n_max = max(spec.nprogmoms)
    per_mode = _per_mode_series(spec, ys)

    mom_norms = np.concatenate(
        [norms[0] * norms[1] ** np.arange(n) for n in spec.nprogmoms]
    )
    params = np.asarray(
        pdists.params_from_moments(spec, jnp.asarray(ys / mom_norms))
    )
    nq = pdists.get_standard_N_q(spec, jnp.asarray(params), cutoff / norms[1])

    with netcdf_file(path, "w") as f:
        f.createDimension("time", n_t)
        f.createDimension("z", nz)
        f.createDimension("dist", spec.n_modes)
        f.createDimension("order", n_max)
        f.createDimension("param", 3)

        def var(name, dims, data):
            v = f.createVariable(name, "d", dims)
            v[:] = np.asarray(data, dtype=np.float64)
            return v

        var("time", ("time",), ts)
        var("z", ("z",), z)
        var("moments", ("time", "z", "dist", "order"), np.nan_to_num(per_mode))
        var("moments_sum", ("time", "z", "order"), np.nansum(per_mode, axis=-2))
        var("params", ("time", "z", "dist", "param"), params)
        var("N_liq", ("time", "z"), np.asarray(nq["N_liq"]) * norms[0])
        var("N_rai", ("time", "z"), np.asarray(nq["N_rai"]) * norms[0])
        var("M_liq", ("time", "z"), np.asarray(nq["M_liq"]) * norms[0] * norms[1])
        var("M_rai", ("time", "z"), np.asarray(nq["M_rai"]) * norms[0] * norms[1])


def save_npz(path: str, **arrays):
    """Fast binary trajectory dump (large ensembles)."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_npz(path: str):
    return dict(np.load(path))
