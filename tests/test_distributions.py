"""Distribution closure correctness — mirrors the reference's
test_ParticleDistributions_correctness.jl (values cited inline)."""

import numpy as np
import scipy.special as ss
import jax
import jax.numpy as jnp
import pytest

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import distributions as pd
from cloudy_tpu.ops.simpson import simpson_even_fast_weights

RTOL = 1e-3

EXP = SpectrumSpec((Family.EXPONENTIAL,))
GAM = SpectrumSpec((Family.GAMMA,))
LOG = SpectrumSpec((Family.LOGNORMAL,))
MONO = SpectrumSpec((Family.MONODISPERSE,))


def P(*vals):
    return jnp.asarray(np.array(vals, dtype=np.float64)[None, :])


def test_moments_exponential():
    # dist = Exponential(1, 2): M_q = n θ^q Γ(q+1)
    params = P(1.0, 2.0, 0.0)
    assert float(pd.moment(EXP, params, 0.0)[0]) == pytest.approx(1.0)
    assert float(pd.moment(EXP, params, 1.0)[0]) == pytest.approx(2.0)
    assert float(pd.moment(EXP, params, 10.0)[0]) == pytest.approx(
        2.0**10 * ss.gamma(11.0), rel=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(pd.get_moments(EXP, params)), [1.0, 2.0], rtol=1e-14
    )


def test_moments_gamma():
    # dist = Gamma(1, 1, 2): moments 1, 2, 6; fractional 2/3 moment
    params = P(1.0, 1.0, 2.0)
    np.testing.assert_allclose(
        np.asarray(pd.get_moments(GAM, params)), [1.0, 2.0, 6.0], rtol=1e-14
    )
    got = float(pd.moment(GAM, params, 2.0 / 3.0)[0])
    assert got == pytest.approx(ss.gamma(2 + 2 / 3) / ss.gamma(2.0), rel=1e-12)


def test_moments_lognormal():
    # dist = Lognormal(1, 1, 2): M1 = e^3, M2 = e^10, M_.5 = e
    params = P(1.0, 1.0, 2.0)
    np.testing.assert_allclose(
        np.asarray(pd.get_moments(LOG, params)),
        [1.0, np.exp(3.0), np.exp(10.0)],
        rtol=1e-12,
    )
    assert float(pd.moment(LOG, params, 0.5)[0]) == pytest.approx(np.e, rel=1e-12)


def test_moments_monodisperse():
    params = P(1.0, 2.0, 0.0)
    assert float(pd.moment(MONO, params, 10.0)[0]) == pytest.approx(2.0**10)


def test_densities():
    # exponential(1, 2): f(0) = 0.5, f(3.1) = 0.5 e^{-3.1/2}
    params = P(1.0, 2.0, 0.0)
    assert float(pd.density(EXP, params, 0.0)[0]) == pytest.approx(0.5)
    assert float(pd.density(EXP, params, 3.1)[0]) == pytest.approx(
        0.5 * np.exp(-3.1 / 2.0), rel=1e-12
    )
    # gamma(1, 1, 2): f(3) = 3 e^-3 / Γ(2)
    params = P(1.0, 1.0, 2.0)
    assert float(pd.density(GAM, params, 0.0)[0]) == pytest.approx(0.0)
    assert float(pd.density(GAM, params, 3.0)[0]) == pytest.approx(
        3.0 * np.exp(-3.0), rel=1e-12
    )
    # lognormal(1, 1, 2): f(e) = 1/(2 √(2π) e)
    params = P(1.0, 1.0, 2.0)
    assert float(pd.density(LOG, params, np.e)[0]) == pytest.approx(
        1.0 / 2.0 / np.sqrt(2 * np.pi) / np.e, rel=1e-12
    )
    # monodisperse(1, 2): rectangular pulse of width 2θ/10
    params = P(1.0, 2.0, 0.0)
    assert float(pd.density(MONO, params, 2.0)[0]) == pytest.approx(2.5)
    assert float(pd.density(MONO, params, 0.0)[0]) == 0.0
    assert float(pd.density(MONO, params, 3.1)[0]) == 0.0


def test_inversion_exponential():
    p = pd.params_from_moments(EXP, jnp.asarray([10.0, 50.0]))
    np.testing.assert_allclose(np.asarray(p)[0][:2], [10.0, 5.0], rtol=1e-14)
    # degenerate -> zero dist
    p = pd.params_from_moments(EXP, jnp.asarray([1.1, 0.0]))
    np.testing.assert_allclose(np.asarray(p)[0], [0.0, 1.0, 0.0])


def test_inversion_gamma_roundtrip():
    for mom in ([1.1, 2.0, 4.1], [1.1, 2.423, 8.112], [10.0, 50.0, 300.0]):
        p = pd.params_from_moments(GAM, jnp.asarray(mom))
        got = np.asarray(pd.get_moments(GAM, p))
        np.testing.assert_allclose(got, mom, rtol=RTOL)
    # exact param values for (10, 50, 300): n=10, k=5, θ=1
    p = np.asarray(pd.params_from_moments(GAM, jnp.asarray([10.0, 50.0, 300.0])))[0]
    np.testing.assert_allclose(p, [10.0, 1.0, 5.0], rtol=1e-12)


def test_inversion_gamma_k_clipping():
    # k would be 25 -> clipped to 10 by default range
    mom = [1.0, 1.0, 1.0 + 1.0 / 25.0]
    p = np.asarray(pd.params_from_moments(GAM, jnp.asarray(mom)))[0]
    assert p[2] == pytest.approx(10.0)


def test_inversion_lognormal():
    p = np.asarray(pd.params_from_moments(LOG, jnp.asarray([10.0, 50.0, 300.0])))[0]
    assert p[0] == pytest.approx(10.0, rel=RTOL)
    assert p[1] == pytest.approx(1.518, rel=RTOL)
    assert p[2] == pytest.approx(0.427, rel=RTOL)
    for mom in ([1.1, 2.0, 4.1], [1.1, 2.423, 8.112]):
        pp = pd.params_from_moments(LOG, jnp.asarray(mom))
        got = np.asarray(pd.get_moments(LOG, pp))
        np.testing.assert_allclose(got, mom, rtol=RTOL)
    # degenerate
    pp = np.asarray(pd.params_from_moments(LOG, jnp.asarray([1.1, 0.0, 8.112])))[0]
    assert pp[0] == 0.0


def test_normed_density_after_inversion():
    # reference: normed_density ≈ 0.419 with param_range k ∈ (eps, 5);
    # the unclipped k for these moments is 7.84 so the clip is active
    p = pd.params_from_moments(
        GAM, jnp.asarray([1.1, 2.0, 4.1]), gamma_k_range=(None, 5.0)
    )
    assert float(pd.normed_density(GAM, p, 1.0)[0]) == pytest.approx(0.419, rel=RTOL)
    p = pd.params_from_moments(LOG, jnp.asarray([1.1, 2.0, 4.1]))
    assert float(pd.normed_density(LOG, p, 1.0)[0]) == pytest.approx(0.3450, rel=RTOL)


def test_partial_moments_vs_scipy():
    # exponential / gamma partial moments against direct scipy formulas
    params = P(2.0, 0.7, 0.0)
    got = float(pd.partial_moment(EXP, params, 1.0, 1.3)[0])
    want = 2.0 * 0.7 * ss.gammainc(2.0, 1.3 / 0.7) * ss.gamma(2.0)
    assert got == pytest.approx(want, rel=1e-9)

    params = P(2.0, 0.7, 3.0)
    got = float(pd.partial_moment(GAM, params, 1.0, 1.3)[0])
    want = 2.0 * 0.7 * ss.gammainc(4.0, 1.3 / 0.7) * ss.gamma(4.0) / ss.gamma(3.0)
    assert got == pytest.approx(want, rel=1e-9)

    # lognormal closed form vs numerical integration
    from scipy.integrate import quad

    n, mu, sig, q, T = 1.3, 0.2, 0.8, 1.0, 2.1
    params = P(n, mu, sig)
    got = float(pd.partial_moment(LOG, params, q, T)[0])
    f = lambda x: n * x**q * np.exp(-((np.log(x) - mu) ** 2) / (2 * sig**2)) / (
        x * sig * np.sqrt(2 * np.pi)
    )
    want, _ = quad(f, 0.0, T)
    assert got == pytest.approx(want, rel=1e-9)

    # monodisperse step behavior
    params = P(1.0, 2.0, 0.0)
    assert float(pd.partial_moment(MONO, params, 1.0, 1.0)[0]) == 0.0
    assert float(pd.partial_moment(MONO, params, 1.0, 3.0)[0]) == 2.0


def test_moment_source_helper_reference_values():
    """Hard-coded reference values
    (test_ParticleDistributions_correctness.jl:202-218), rtol 1e-3.
    Exp/gamma cases use n_bins_per_log_unit = 20 as in the reference test."""
    f = lambda spec, params, p1, p2, T, **kw: float(
        pd.moment_source_helper(spec, jnp.asarray(params)[None], 0, p1, p2, T, **kw)
    )
    # monodisperse (closed form)
    mono = [1.0, 0.5, 0.0]
    assert f(MONO, mono, 0.0, 0.0, 0.5) == pytest.approx(0.0, abs=1e-12)
    assert f(MONO, mono, 0.0, 0.0, 1.2) == pytest.approx(1.0, rel=RTOL)
    assert f(MONO, mono, 1.0, 0.0, 0.5) == pytest.approx(0.0, abs=1e-12)
    assert f(MONO, mono, 0.0, 1.0, 1.2) == pytest.approx(0.5, rel=RTOL)
    # exponential(1, 0.5)
    e = [1.0, 0.5, 0.0]
    kw = dict(n_bins_per_log_unit=20)
    assert f(EXP, e, 0.0, 0.0, 0.5, **kw) == pytest.approx(2.642e-1, rel=RTOL)
    assert f(EXP, e, 1.0, 0.0, 0.5, **kw) == pytest.approx(4.015e-2, rel=RTOL)
    assert f(EXP, e, 1.0, 1.0, 0.5, **kw) == pytest.approx(4.748e-3, rel=RTOL)
    # gamma(1, 0.5, 2)
    g = [1.0, 0.5, 2.0]
    assert f(GAM, g, 0.0, 0.0, 0.5, **kw) == pytest.approx(1.899e-2, rel=RTOL)
    assert f(GAM, g, 1.0, 0.0, 0.5, **kw) == pytest.approx(3.662e-3, rel=RTOL)
    assert f(GAM, g, 1.0, 1.0, 0.5, **kw) == pytest.approx(5.940e-4, rel=RTOL)
    # lognormal(1, 0.5, 2)
    l = [1.0, 0.5, 2.0]
    kwl = dict(n_bins_per_log_unit=60, n_points_max=512)
    assert f(LOG, l, 0.0, 0.0, 2.5, **kwl) == pytest.approx(2.831e-1, rel=RTOL)
    assert f(LOG, l, 1.0, 0.0, 2.5, **kwl) == pytest.approx(1.725e-1, rel=RTOL)
    assert f(LOG, l, 1.0, 1.0, 2.5, **kwl) == pytest.approx(8.115e-2, rel=RTOL)


def test_simpson_even_fast():
    # reference: ∫_1^10 x² dx = 333 on 90 bins (test:251-257)
    npt = 90
    x = np.linspace(1.0, 10.0, npt + 1)
    dx = x[1] - x[0]
    w = simpson_even_fast_weights(npt)
    got = dx * np.sum(w * x**2)
    assert got == pytest.approx(333.0, abs=1e-6)


def test_check_moment_consistency():
    pd.check_moment_consistency((1.1, 2.1))
    pd.check_moment_consistency((0.0, 0.0))
    pd.check_moment_consistency((0.0, 1.0, 2.0))
    pd.check_moment_consistency((1.0, 1.0, 2.0))
    with pytest.raises(ValueError):
        pd.check_moment_consistency((-0.1, 1.0))
    with pytest.raises(ValueError):
        pd.check_moment_consistency((0.1, -1.0))
    with pytest.raises(ValueError):
        pd.check_moment_consistency((1.0, 3.0, 2.0))


def test_get_standard_N_q():
    # reference :241-248: exp(10,1) + gamma(5,10,2) — totals conserved
    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA))
    params = jnp.asarray([[10.0, 1.0, 0.0], [5.0, 10.0, 2.0]])
    nq1 = {k: float(v) for k, v in pd.get_standard_N_q(spec, params, 1.0).items()}
    nq2 = {k: float(v) for k, v in pd.get_standard_N_q(spec, params, 0.5).items()}
    assert nq1["N_liq"] + nq1["N_rai"] == pytest.approx(15.0, rel=RTOL)
    assert nq1["M_liq"] + nq1["M_rai"] == pytest.approx(110.0, rel=RTOL)
    assert nq2["N_liq"] + nq2["N_rai"] == pytest.approx(15.0, rel=RTOL)
    assert nq2["M_liq"] + nq2["M_rai"] == pytest.approx(110.0, rel=RTOL)
    assert nq1["N_liq"] > nq2["N_liq"]
    assert nq1["M_liq"] > nq2["M_liq"]


def test_compute_thresholds():
    # exp: -θ log(1-p); gamma: θ P^{-1}(k, p); last mode -> inf
    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA))
    params = jnp.asarray([[10.0, 1.0, 0.0], [5.0, 10.0, 2.0]])
    thr = np.asarray(pd.compute_thresholds(spec, params, 0.97))
    assert thr[0] == pytest.approx(-1.0 * np.log(1 - 0.97), rel=1e-6)
    # reference transcribed literals (test_ParticleDistributions:266-268,
    # default percentile 0.97 / explicit 0.5)
    assert thr[0] == pytest.approx(3.507, rel=1e-3)
    assert np.isinf(thr[1])
    thr_half = np.asarray(pd.compute_thresholds(spec, params, [0.5, 1.0]))
    assert thr_half[0] == pytest.approx(0.6931, rel=1e-3)

    spec2 = SpectrumSpec((Family.GAMMA, Family.EXPONENTIAL))
    params2 = jnp.asarray([[5.0, 10.0, 2.0], [10.0, 1.0, 0.0]])
    thr2 = np.asarray(pd.compute_thresholds(spec2, params2, 0.97))
    assert thr2[0] == pytest.approx(10.0 * ss.gammaincinv(2.0, 0.97), rel=1e-5)


def test_batch_and_jit():
    """Everything vmaps over a batch and jits without retracing surprises."""
    spec = SpectrumSpec((Family.GAMMA, Family.EXPONENTIAL))
    B = 16
    rng = np.random.default_rng(0)
    params = np.stack(
        [
            np.stack(
                [rng.uniform(0.5, 2, B), rng.uniform(0.5, 2, B), rng.uniform(0.5, 5, B)],
                axis=-1,
            ),
            np.stack(
                [rng.uniform(0.5, 2, B), rng.uniform(0.5, 2, B), np.zeros(B)], axis=-1
            ),
        ],
        axis=1,
    )
    mom = pd.get_moments(spec, jnp.asarray(params))
    f = jax.jit(lambda m: pd.get_moments(spec, pd.params_from_moments(spec, m)))
    got = f(mom)
    assert got.shape == (B, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(mom), rtol=1e-10)
