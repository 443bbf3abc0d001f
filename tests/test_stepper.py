"""Time-stepper orders of accuracy and scan/save semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudy_tpu import stepper


def _convergence_order(method, dts=(0.1, 0.05, 0.025)):
    # dy/dt = -y + sin(t), y(0)=1 — smooth nonautonomous problem
    f = lambda y, t: -y + jnp.sin(t)
    t_end = 1.0
    exact = None

    def run(dt):
        n = int(round(t_end / dt))
        _, ys = stepper.integrate(f, jnp.asarray([1.0]), 0.0, dt, n, method=method)
        return float(ys[-1, 0])

    # fine reference
    ref = run(1e-4)
    errs = [abs(run(dt) - ref) for dt in dts]
    orders = [
        np.log(errs[i] / errs[i + 1]) / np.log(dts[i] / dts[i + 1])
        for i in range(len(dts) - 1)
    ]
    return min(orders)


def test_euler_first_order():
    assert _convergence_order("euler") > 0.9


def test_ssprk33_third_order():
    assert _convergence_order("ssprk33") > 2.7


def test_rk4_fourth_order():
    assert _convergence_order("rk4") > 3.7


def test_save_every_thinning():
    f = lambda y, t: -y
    ts, ys = stepper.integrate(f, jnp.asarray([1.0]), 0.0, 0.1, 10, save_every=5)
    assert ys.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(ts), [0.0, 0.5, 1.0], atol=1e-12)
    # matches the unthinned trajectory
    ts2, ys2 = stepper.integrate(f, jnp.asarray([1.0]), 0.0, 0.1, 10, save_every=1)
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(ys2[-1]), rtol=1e-14)


def test_remat_matches():
    f = lambda y, t: -(y**2)
    _, a = stepper.integrate(f, jnp.asarray([1.0]), 0.0, 0.1, 10, remat=False)
    _, b = stepper.integrate(f, jnp.asarray([1.0]), 0.0, 0.1, 10, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-15)
