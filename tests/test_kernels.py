"""Kernel functions and polynomial tensors — mirrors the reference's
test_KernelFunctions_correctness.jl / test_KernelTensors_correctness.jl."""

import numpy as np
import pytest

from cloudy_tpu import kernels as K

RTOL = 1e-5


def test_constant_kernel():
    k = K.ConstantKernelFunction(0.3)
    assert float(k(2.0, 5.0)) == pytest.approx(0.3)
    kn = k.normalized((10.0, 0.1))
    assert kn.coll_coal_rate == pytest.approx(3.0)


def test_linear_kernel():
    k = K.LinearKernelFunction(0.3)
    assert float(k(2.0, 5.0)) == pytest.approx(0.3 * 7.0)
    kn = k.normalized((10.0, 0.1))
    assert kn.coll_coal_rate == pytest.approx(0.3)


def test_hydrodynamic_kernel():
    k = K.HydrodynamicKernelFunction(2.0)
    x, y = 3.0, 5.0
    r1 = (3 / 4 / np.pi * x) ** (1 / 3)
    r2 = (3 / 4 / np.pi * y) ** (1 / 3)
    want = 2.0 * (r1 + r2) ** 2 * abs(np.pi * r1**2 - np.pi * r2**2)
    assert float(k(x, y)) == pytest.approx(want, rel=1e-12)
    assert float(k(x, y)) == pytest.approx(float(k(y, x)), rel=1e-12)
    kn = k.normalized((10.0, 0.1))
    assert kn.coal_eff == pytest.approx(2.0 * 10.0 * 0.1 ** (4 / 3))


def test_long_kernel():
    # piecewise: below threshold quadratic, above linear
    k = K.LongKernelFunction(5.236e-10, 9.44e9, 5.78)
    x = 1e-10
    assert float(k(x, x)) == pytest.approx(9.44e9 * 2 * x**2, rel=1e-12)
    y = 1e-9
    assert float(k(x, y)) == pytest.approx(5.78 * (x + y), rel=1e-12)
    kn = k.normalized((1e6, 1e-9))
    assert kn.x_threshold == pytest.approx(5.236e-10 / 1e-9)
    assert kn.coal_rate_below_threshold == pytest.approx(9.44e9 * 1e6 * 1e-18)
    assert kn.coal_rate_above_threshold == pytest.approx(5.78 * 1e6 * 1e-9)


def test_symmetry_checks():
    K.check_symmetry_array(np.array([[1.0, 0.0], [0.0, 2.0]]))
    with pytest.raises(ValueError):
        K.check_symmetry_array(np.array([[1.0, -0.2], [0.2, 2.0]]))
    K.check_symmetry_func(lambda x, y: x + y)
    with pytest.raises(ValueError):
        K.check_symmetry_func(lambda x, y: x - y)


def test_polyfit_recovers_polynomials():
    """Reference test_KernelTensors_correctness.jl:39-46: exact recovery of
    polynomial kernels (we use lstsq — the exact minimizer of the same loss
    the reference approximates with Nelder–Mead)."""
    c = K.polyfit(lambda x, y: 0.1 + 0.2 * x * y, 1, 10.0)
    np.testing.assert_allclose(c, [[0.1, 0.0], [0.0, 0.2]], rtol=RTOL, atol=1e-12)
    f = lambda x, y: 0.1 - 0.23 * x - 0.23 * y + 0.2 * x * y
    for lim in (10.0, 100.0, 1000.0):
        np.testing.assert_allclose(
            K.polyfit(f, 1, lim), [[0.1, -0.23], [-0.23, 0.2]], rtol=RTOL, atol=1e-10
        )
    # reference :18-20: CoalescenceTensor from a raw callable 0.02 + x + y
    c = K.CoalescenceTensor.from_function(lambda x, y: 0.02 + x + y, 1, 10.0)
    np.testing.assert_allclose(
        c.array, [[0.02, 1.0], [1.0, 0.0]], rtol=1e-5, atol=1e-10
    )


def test_polyfit_kernel_function_normalization():
    """A CoalescenceKernelFunction is fitted in normalized units and the
    coefficients are denormalized back (reference KernelTensors.jl:89-145):
    a linear kernel must give c[0,1] = c[1,0] = rate exactly."""
    ker = K.CoalescenceTensor.from_function(
        K.LinearKernelFunction(5.0), 1, 1e-6
    )
    np.testing.assert_allclose(
        ker.array, [[np.finfo(np.float64).eps * 1e6 / 1e6, 5.0], [5.0, 0.0]],
        atol=1e-8, rtol=1e-6,
    )
    # constant kernel, order 0
    ker0 = K.CoalescenceTensor.from_function(K.ConstantKernelFunction(1.0), 0, 100.0)
    np.testing.assert_allclose(ker0.array, [[1.0]], rtol=1e-12)


def test_tensor_normalization():
    # reference :52-57: c[i,j] * norms1 * norms2^(i+j)
    ker = K.CoalescenceTensor([[1.0, 2.0], [2.0, 3.0]])
    kn = ker.normalized((10.0, 0.2))
    np.testing.assert_allclose(kn.array, [[10.0, 4.0], [4.0, 1.2]], atol=1e-12)


def test_tensor_validation():
    with pytest.raises(ValueError):
        K.CoalescenceTensor([[1.0, 0.5], [0.4, 2.0]])


def test_tensor_evaluation():
    ker = K.CoalescenceTensor([[0.1, 0.3], [0.3, 0.2]])
    x, y = 2.0, 3.0
    want = 0.1 + 0.3 * x + 0.3 * y + 0.2 * x * y
    assert float(ker(x, y)) == pytest.approx(want, rel=1e-12)


def test_long_kernel_tensor_fit_quality():
    """The order-2 fit of the Long kernel below threshold must capture the
    quadratic behavior (reference uses it in box_gamma_mixture_long.jl)."""
    kf = K.LongKernelFunction(5.236e-10, 9.44e9, 5.78)
    ker = K.CoalescenceTensor.from_function(kf, 2, 5e-10)
    xs = np.linspace(1e-11, 5e-10, 20)
    X, Y = np.meshgrid(xs, xs)
    approx = np.asarray(ker(X, Y))
    exact = np.asarray(kf(X, Y))
    # relative L2 error below a few percent over the fit window
    err = np.linalg.norm(approx - exact) / np.linalg.norm(exact)
    assert err < 0.05
