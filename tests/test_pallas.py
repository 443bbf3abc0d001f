"""Fused Pallas coalescence kernel vs the XLA einsum path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU — exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import distributions as pd
from cloudy_tpu import kernels as K
from cloudy_tpu.coalescence import build_coalescence_data, get_coal_ints
from cloudy_tpu.ops import pallas_coalescence as pc


def _setup(families, thresholds):
    spec = SpectrumSpec(families)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(spec, ker, thresholds, norms=(1e6, 1e-9))
    return spec, data


def _random_moments(spec, B, seed=0):
    # consistent random states: draw distribution parameters, map to moments
    rng = np.random.default_rng(seed)
    params = np.stack(
        [
            np.stack(
                [rng.uniform(10, 200, B), rng.uniform(0.05, 5.0, B),
                 rng.uniform(0.5, 5.0, B)],
                -1,
            )
            for _ in spec.families
        ],
        axis=1,
    )
    return np.asarray(pd.get_moments(spec, jnp.asarray(params)))


def test_pallas_supported_gating():
    spec, data = _setup((Family.GAMMA, Family.GAMMA), (5e-10, np.inf))
    assert pc.pallas_supported(data)
    spec2, data2 = _setup((Family.LOGNORMAL, Family.GAMMA), (5e-10, np.inf))
    assert not pc.pallas_supported(data2)
    # lognormal as LAST mode (no threshold integral needed) is fine
    spec3, data3 = _setup((Family.GAMMA, Family.LOGNORMAL), (5e-10, np.inf))
    assert pc.pallas_supported(data3)


def test_pallas_matches_xla_two_gamma():
    spec, data = _setup((Family.GAMMA, Family.GAMMA), (5e-10, np.inf))
    B = 256
    mom = jnp.asarray(_random_moments(spec, B))
    want = np.asarray(get_coal_ints(data, pd.params_from_moments(spec, mom)))
    fn = pc.make_pallas_coal_fn(data, block_cols=128, interpret=True)
    got = np.asarray(fn(mom))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_pallas_matches_xla_exp_gamma():
    spec, data = _setup((Family.EXPONENTIAL, Family.GAMMA), (5e-10, np.inf))
    B = 128
    mom = jnp.asarray(_random_moments(spec, B))
    want = np.asarray(get_coal_ints(data, pd.params_from_moments(spec, mom)))
    fn = pc.make_pallas_coal_fn(data, block_cols=128, interpret=True)
    got = np.asarray(fn(mom))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_pallas_degenerate_columns():
    spec, data = _setup((Family.GAMMA, Family.GAMMA), (5e-10, np.inf))
    mom = np.zeros((128, 6))
    mom[0] = [1e2, 1e1, 2e0, 0, 0, 0]  # one active column, empty mode 2
    fn = pc.make_pallas_coal_fn(data, block_cols=128, interpret=True)
    got = np.asarray(fn(jnp.asarray(mom)))
    want = np.asarray(
        get_coal_ints(data, pd.params_from_moments(spec, jnp.asarray(mom)))
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(got[1:], 0.0)


def test_pallas_gauss_rule_close_to_reference_rule():
    """The Gauss fast-path quadrature must agree with the reference-grid
    Simpson evaluation to well below the physics tolerance."""
    spec, data = _setup((Family.GAMMA, Family.GAMMA), (5e-10, np.inf))
    B = 128
    mom = jnp.asarray(_random_moments(spec, B, seed=5))
    ref = pc.make_pallas_coal_fn(data, block_cols=128, interpret=True)
    fast = pc.make_pallas_coal_fn(
        data, block_cols=128, interpret=True, quad_rule="gauss", gauss_nodes=16
    )
    a = np.asarray(ref(mom))
    b = np.asarray(fast(mom))
    scale = np.abs(a).max(axis=0, keepdims=True)
    rel = np.abs(a - b) / (np.abs(a) + 1e-6 * scale)
    assert np.median(rel) < 1e-4
    assert np.quantile(rel, 0.99) < 5e-3
