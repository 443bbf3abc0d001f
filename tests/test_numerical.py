"""Numerical-quadrature coalescence path: structure assertions (reference
test_Sources_correctness.jl:171-263) + agreement with the analytical path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import kernels as K
from cloudy_tpu import coalescence_numerical as cn
from cloudy_tpu.coalescence import build_coalescence_data, get_coal_ints


SPEC3 = SpectrumSpec((Family.GAMMA, Family.GAMMA, Family.GAMMA))
PARAMS3 = jnp.asarray(
    [[10.0, 10.0, 3.0], [20.0, 100.0, 5.0], [2.0, 500.0, 6.0]]
)
KERNEL = K.LinearKernelFunction(1.0)


def test_weighting_fn():
    # reference :173-183: two gammas, w(100, mode0) = 0.5969..., w(·,last)=1
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    params = jnp.asarray([[10.0, 10.0, 3.0], [20.0, 100.0, 5.0]])
    w0 = float(cn.weighting_fn(spec, params, 100.0, 0))
    assert w0 == pytest.approx(0.5969233398831713, rel=1e-6)
    assert float(cn.weighting_fn(spec, params, 100.0, 1)) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        cn.weighting_fn(spec, params, 10.0, 2)
    # single mode: w == 1
    spec1 = SpectrumSpec((Family.GAMMA,))
    assert float(
        cn.weighting_fn(spec1, jnp.asarray([[10.0, 10.0, 3.0]]), 10.0, 0)
    ) == pytest.approx(1.0)


def test_integrand_positivity_and_split():
    # reference :185-251
    x, y = 50.0, 20.0
    for j in range(3):
        for k in range(3):
            if j == k:
                with pytest.raises(AssertionError):
                    cn.q_integrand_inner(SPEC3, PARAMS3, x, y, j, k, KERNEL)
            else:
                v = float(cn.q_integrand_inner(SPEC3, PARAMS3, x, y, j, k, KERNEL))
                assert v > 0.0
                for m in range(3):
                    assert float(
                        cn.q_integrand_outer(SPEC3, PARAMS3, x, j, k, KERNEL, m)
                    ) > 0.0
            assert float(cn.r_integrand_inner(SPEC3, PARAMS3, x, y, j, k, KERNEL)) > 0.0
            for m in range(3):
                assert float(
                    cn.r_integrand_outer(SPEC3, PARAMS3, x, j, k, KERNEL, m)
                ) > 0.0
    for k in range(3):
        for m in range(3):
            si = float(cn.s_integrand_inner(SPEC3, PARAMS3, x, k, KERNEL, m))
            s1 = float(cn.s_integrand1(SPEC3, PARAMS3, x, k, KERNEL, m))
            s2 = float(cn.s_integrand2(SPEC3, PARAMS3, x, k, KERNEL, m))
            assert si > 0.0 and s1 >= 0.0 and s2 >= 0.0
            assert s1 + s2 == pytest.approx(si, rel=1e-6)


def test_conservation_three_gammas():
    # reference :253-263: dM0 < 0, dM1 ≈ 0, dM2 > 0
    out = np.asarray(
        jax.jit(
            lambda p: cn.get_coal_ints_numerical(SPEC3, p, KERNEL)
        )(PARAMS3)
    )
    assert out[0] < 0.0  # first mode number tendency
    dM = np.zeros(3)
    for i in range(3):
        for m in range(3):
            dM[m] += out[SPEC3.dist_moment_ind(i, m)]
    assert dM[0] < 0.0
    assert abs(dM[1]) < 1e-4 * (abs(out[1]) + abs(out[4]) + abs(out[7]))
    assert dM[2] > 0.0


def test_numerical_matches_analytical_single_gamma():
    """Golovin kernel, single gamma: the analytical moment-closure path and
    the direct quadrature must agree (the kernel tensor is exact for the
    linear kernel, so both compute the same integrals)."""
    spec = SpectrumSpec((Family.GAMMA,))
    params = jnp.asarray([[100.0, 0.1, 2.0]])
    kf = K.LinearKernelFunction(5e-3)
    ker = K.CoalescenceTensor.from_function(kf, 1, 10.0)
    data = build_coalescence_data(spec, ker, (np.inf,))
    ana = np.asarray(get_coal_ints(data, params))
    num = np.asarray(cn.get_coal_ints_numerical(spec, params, kf))
    np.testing.assert_allclose(num, ana, rtol=2e-3, atol=1e-8 * np.abs(ana).max())


def test_numerical_matches_analytical_two_modes():
    """Two-mode exp+gamma with an effectively-infinite threshold: both paths
    must agree on every prognostic tendency."""
    spec = SpectrumSpec((Family.GAMMA, Family.EXPONENTIAL))
    params = jnp.asarray([[100.0, 0.1, 1.0], [1.0, 1.0, 0.0]])
    kf = K.LinearKernelFunction(5e-3)
    ker = K.CoalescenceTensor.from_function(kf, 1, 10.0)
    data = build_coalescence_data(spec, ker, (np.inf, np.inf))
    ana = np.asarray(get_coal_ints(data, params))
    num = np.asarray(cn.get_coal_ints_numerical(spec, params, kf))
    # The two paths split self-collision gain between modes differently
    # (threshold clamp vs weighting function — same as the reference's
    # Analytical/Numerical styles), so per-mode tendencies and moment orders
    # that only SOME modes carry are not comparable. Number and mass totals
    # (every mode prognostic, splitting cancels in the sum) must agree.
    for m in range(2):
        tot_a = sum(
            ana[spec.dist_moment_ind(i, m)]
            for i in range(2)
            if m < spec.nprogmoms[i]
        )
        tot_n = sum(
            num[spec.dist_moment_ind(i, m)]
            for i in range(2)
            if m < spec.nprogmoms[i]
        )
        assert tot_n == pytest.approx(tot_a, rel=5e-3, abs=1e-8 * np.abs(ana).max())
