"""Fused numerical-quadrature Pallas kernel vs the XLA einsum path
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU —
BENCH_IMPL=pallas_numerical in bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import distributions as pd
from cloudy_tpu import kernels as K
from cloudy_tpu.coalescence_numerical import get_coal_ints_numerical
from cloudy_tpu.ops import pallas_numerical as pn


def _moments(spec, B, seed=0):
    rng = np.random.default_rng(seed)
    cols = []
    for fam in spec.families:
        n = rng.uniform(10, 200, B)
        if fam == Family.LOGNORMAL:
            p1 = rng.uniform(-1.0, 1.0, B)  # μ
            p2 = rng.uniform(0.3, 1.0, B)  # σ
        else:
            p1 = rng.uniform(0.05, 5.0, B)  # θ
            p2 = rng.uniform(0.5, 5.0, B)  # k (ignored for exp/mono)
        cols.append(np.stack([n, p1, p2], -1))
    params = np.stack(cols, axis=1)
    return np.asarray(pd.get_moments(spec, jnp.asarray(params)))


KERNELS = {
    "linear": K.LinearKernelFunction(5e-3),
    "constant": K.ConstantKernelFunction(1e-3),
    "long": K.LongKernelFunction(2.0, 1e-3, 5e-3),
    "hydro": K.HydrodynamicKernelFunction(1e-2),
}


@pytest.mark.parametrize(
    "kname",
    # one kernel family in the default tier; the others are the same
    # quadrature machinery with different static tensors (slow tier —
    # VERDICT r4 #7 default-tier budget)
    [k if k == "linear" else pytest.param(k, marks=pytest.mark.slow)
     for k in sorted(KERNELS)],
)
def test_matches_xla_same_nodes_two_gamma(kname):
    """Identical node counts on both paths -> identical quadrature."""
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    mom = jnp.asarray(_moments(spec, 128))
    kf = KERNELS[kname]
    want = np.asarray(
        get_coal_ints_numerical(
            spec, pd.params_from_moments(spec, mom), kf,
            n_outer=64, n_inner=32,
        )
    )
    fn = pn.make_pallas_numerical_fn(
        spec, kf, n_outer=64, n_inner=32, block_cols=128, interpret=True
    )
    got = np.asarray(fn(mom))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-13)


@pytest.mark.slow
def test_matches_xla_mixed_families():
    """exp + gamma + lognormal three-mode closure, Long kernel."""
    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA, Family.LOGNORMAL))
    mom = jnp.asarray(_moments(spec, 128, seed=5))
    kf = KERNELS["long"]
    want = np.asarray(
        get_coal_ints_numerical(
            spec, pd.params_from_moments(spec, mom), kf,
            n_outer=64, n_inner=32,
        )
    )
    fn = pn.make_pallas_numerical_fn(
        spec, kf, n_outer=64, n_inner=32, block_cols=128, interpret=True
    )
    got = np.asarray(fn(mom))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-13)


@pytest.mark.slow
def test_default_nodes_accuracy_vs_dense():
    """The fast defaults (96, 48) track the XLA adaptive-grade node counts
    (256, 96) on the BASELINE Long-kernel scenario state — both kink-aware
    panelized rules, converged to ~1e-5 relative (validated against a
    per-panel-refinement study; see coalescence_numerical.py)."""
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    kf = K.LongKernelFunction(5.236e-10, 9.44e9, 5.78).normalized(norms)
    mom_phys = np.array([[1e7, 1e-3, 2e-13, 1e5, 1e-4, 2e-13]])
    from cloudy_tpu.spec import get_moments_normalizing_factors

    mn = jnp.asarray(
        mom_phys / np.asarray(get_moments_normalizing_factors(spec.nprogmoms, norms))
    )
    dense = np.asarray(
        get_coal_ints_numerical(
            spec, pd.params_from_moments(spec, mn), kf, n_outer=256, n_inner=96
        )
    )
    fn = pn.make_pallas_numerical_fn(spec, kf, block_cols=1, interpret=True)
    fast = np.asarray(fn(mn))
    np.testing.assert_allclose(fast, dense, rtol=1e-4, atol=np.abs(dense).max() * 1e-8)


@pytest.mark.slow
def test_degenerate_and_empty_columns():
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    mom = np.zeros((128, 6))
    mom[0] = [1e2, 1e1, 2e0, 0, 0, 0]  # one active column, empty mode 2
    fn = pn.make_pallas_numerical_fn(
        spec, KERNELS["linear"], n_outer=64, n_inner=32, block_cols=128,
        interpret=True,
    )
    got = np.asarray(fn(jnp.asarray(mom)))
    assert np.all(np.isfinite(got))
    np.testing.assert_array_equal(got[1:], 0.0)
    want = np.asarray(
        get_coal_ints_numerical(
            spec,
            pd.params_from_moments(spec, jnp.asarray(mom[:1])),
            KERNELS["linear"],
            n_outer=64,
            n_inner=32,
        )
    )
    np.testing.assert_allclose(got[:1], want, rtol=1e-8, atol=1e-13)


@pytest.mark.slow
def test_f32_finite_and_close():
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    mom64 = _moments(spec, 128, seed=7)
    fn64 = pn.make_pallas_numerical_fn(
        spec, KERNELS["linear"], block_cols=128, interpret=True
    )
    want = np.asarray(fn64(jnp.asarray(mom64)))
    got = np.asarray(fn64(jnp.asarray(mom64, jnp.float32)))
    assert got.dtype == np.float32
    assert np.all(np.isfinite(got))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=scale * 1e-4)
