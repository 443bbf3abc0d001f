"""Condensation and sedimentation sources vs closed forms (reference
test_Sources_correctness.jl:265-308)."""

import numpy as np
import scipy.special as ss
import jax.numpy as jnp
import pytest

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import distributions as pd
from cloudy_tpu.condensation import get_cond_evap
from cloudy_tpu.sedimentation import get_sedimentation_flux, normalized_velocity

RTOL = 1e-6  # backend exp accuracy


def test_sedimentation_flux_exponential():
    # reference :265-272: exp(1,1), vel = ((1,0), (-1,1/6))
    spec = SpectrumSpec((Family.EXPONENTIAL,))
    params = jnp.asarray([[1.0, 1.0, 0.0]])
    vel = ((1.0, 0.0), (-1.0, 1.0 / 6.0))
    got = np.asarray(get_sedimentation_flux(spec, params, vel))
    want = [-1.0 + ss.gamma(1.0 + 1.0 / 6.0), -1.0 + ss.gamma(2.0 + 1.0 / 6.0)]
    np.testing.assert_allclose(got, want, rtol=RTOL)


def test_condensation_single_exponential():
    # reference :274-283
    spec = SpectrumSpec((Family.EXPONENTIAL,))
    params = jnp.asarray([[1.0, 1.0, 0.0]])
    xi, s = 1e-6, 0.01
    got = np.asarray(get_cond_evap(spec, params, s, xi))
    m13 = float(pd.moment(spec, params, 1.0 - 2.0 / 3.0)[0])
    want = [0.0, 3 * xi * s * m13 * (4 * np.pi / 3) ** (2 / 3) / 1000.0 ** (1 / 3)]
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-30)


def test_condensation_three_modes():
    # reference :285-308: exp + two gammas; per-mode fractional moments
    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA, Family.GAMMA))
    params = jnp.asarray(
        [[1.0, 1.0, 0.0], [1.0, 2.0, 3.0], [0.1, 10.0, 3.0]]
    )
    xi, s = 1e-6, 0.01
    got = np.asarray(get_cond_evap(spec, params, s, xi))
    coef = 3 * xi * s * (4 * np.pi / 3) ** (2 / 3) / 1000.0 ** (1 / 3)

    def frac_mom(i, q):
        return float(pd.moment(spec, params, q)[i])

    want = [
        0.0,
        coef * frac_mom(0, 1 - 2 / 3),
        0.0,
        coef * frac_mom(1, 1 - 2 / 3),
        coef * 2 * frac_mom(1, 2 - 2 / 3),
        0.0,
        coef * frac_mom(2, 1 - 2 / 3),
        coef * 2 * frac_mom(2, 2 - 2 / 3),
    ]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-30)


def test_normalized_velocity():
    # reference rainshaft driver: (c·m_norm^e, e)
    vel = ((50.0, 1.0 / 6.0), (1.0, 0.0))
    got = normalized_velocity(vel, (1e6, 1e-9))
    assert got[0][0] == pytest.approx(50.0 * (1e-9) ** (1 / 6))
    assert got[0][1] == 1.0 / 6.0
    assert got[1][0] == 1.0


def test_batched_sources():
    spec = SpectrumSpec((Family.GAMMA,))
    B = 5
    params = jnp.asarray(np.tile([[2.0, 1.5, 2.5]], (B, 1))[:, None, :])
    flux = get_sedimentation_flux(spec, params, ((1.0, 1.0 / 6.0),))
    assert flux.shape == (B, 3)
    cond = get_cond_evap(spec, params, 0.01, 1e-6)
    assert cond.shape == (B, 3)
    # all batch rows identical
    np.testing.assert_allclose(
        np.asarray(flux), np.tile(np.asarray(flux)[0], (5, 1)), rtol=1e-14
    )
