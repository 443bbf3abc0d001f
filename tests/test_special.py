"""Special-function accuracy vs scipy (float64 ground truth)."""

import numpy as np
import scipy.special as ss
import jax
import jax.numpy as jnp

from cloudy_tpu.ops import special


def test_lgamma_accuracy():
    x = np.concatenate(
        [np.linspace(0.01, 1.0, 57), np.linspace(1.0, 50.0, 200), [1e-3, 100.0, 170.0]]
    )
    got = np.asarray(special.lgamma(jnp.asarray(x)))
    want = ss.gammaln(x)
    np.testing.assert_allclose(got, want, rtol=5e-13, atol=1e-12)


def test_gammainc_accuracy():
    a = np.logspace(-3, np.log10(50.0), 40)
    x = np.concatenate([[0.0], np.logspace(-8, np.log10(200.0), 80)])
    A, X = np.meshgrid(a, x)
    got = np.asarray(special.gammainc(jnp.asarray(A), jnp.asarray(X)))
    want = ss.gammainc(A, X)
    np.testing.assert_allclose(got, want, rtol=5e-12, atol=1e-14)


def test_gammainc_extremes():
    # large x saturates to 1, x <= 0 gives 0, no NaNs at inf
    assert float(special.gammainc(2.0, jnp.inf)) == 1.0
    assert float(special.gammainc(2.0, 0.0)) == 0.0
    assert float(special.gammainc(2.0, -1.0)) == 0.0
    assert np.isfinite(float(special.gammainc(10.0, 1e30)))


def test_gammaincinv_roundtrip():
    # domain the physics uses: gamma shape k in [~0.1, 20], percentile
    # thresholds (reference MovingThreshold uses 0.97/0.99). Smaller a with
    # p→0 gives sub-denormal answers (x ~ 1e-200) that are physically
    # meaningless and excluded.
    a = np.logspace(-1, np.log10(20.0), 25)
    p = np.array([1e-4, 1e-3, 0.03, 0.25, 0.5, 0.75, 0.97, 0.99, 1 - 1e-6])
    A, P = np.meshgrid(a, p)
    x = np.asarray(special.gammaincinv(jnp.asarray(A), jnp.asarray(P)))
    want = ss.gammaincinv(A, P)
    np.testing.assert_allclose(x, want, rtol=1e-8, atol=1e-280)


def test_ndtri():
    p = np.array([1e-9, 1e-4, 0.01, 0.3, 0.5, 0.7, 0.99, 1 - 1e-6])
    got = np.asarray(special.ndtri(jnp.asarray(p)))
    want = ss.ndtri(p)
    err = np.abs(got - want)
    assert np.all(err <= 1e-8 + 1e-5 * np.abs(want))


def test_special_jit_and_grad():
    # must be traceable and differentiable (closure sensitivities)
    f = jax.jit(lambda a, x: special.gammainc(a, x))
    assert np.isfinite(float(f(2.5, 1.3)))
    g = jax.grad(lambda x: special.gammainc(2.5, x))(1.3)
    # d/dx P(a,x) = x^(a-1) e^-x / Γ(a)
    want = 1.3**1.5 * np.exp(-1.3) / ss.gamma(2.5)
    np.testing.assert_allclose(float(g), want, rtol=1e-8)
