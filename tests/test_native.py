"""Native C++ golden model vs the JAX analytical path."""

import shutil

import numpy as np
import jax.numpy as jnp
import pytest

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import distributions as pd
from cloudy_tpu import kernels as K
from cloudy_tpu.coalescence import build_coalescence_data, get_coal_ints
from cloudy_tpu import native

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")


def test_golden_matches_jax_two_gamma():
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(spec, ker, (5e-10, np.inf), norms=(1e6, 1e-9))

    # physically consistent random moments: draw (n, θ, k) per mode and map
    # to moments (independent per-moment noise would produce inconsistent
    # states whose k-clip at eps amplifies cancellation noise astronomically)
    rng = np.random.default_rng(3)
    B = 32
    params = np.stack(
        [
            np.stack([rng.uniform(50, 200, B), rng.uniform(0.05, 0.2, B),
                      rng.uniform(0.5, 3.0, B)], -1),
            np.stack([rng.uniform(1e-4, 1e-2, B), rng.uniform(5, 20, B),
                      rng.uniform(0.5, 3.0, B)], -1),
        ],
        axis=1,
    )
    mom = np.asarray(pd.get_moments(spec, jnp.asarray(params)))
    want = np.asarray(get_coal_ints(data, pd.params_from_moments(spec, jnp.asarray(mom))))
    got = native.coal_ints_golden(data, mom)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)


@pytest.mark.slow
def test_golden_matches_jax_exp_gamma():
    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA))
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5e-3), 1, 10.0)
    data = build_coalescence_data(spec, ker, (0.5, np.inf))
    mom = np.array([[100.0, 10.0, 1.0, 1.0, 2.0]])
    want = np.asarray(get_coal_ints(data, pd.params_from_moments(spec, jnp.asarray(mom))))
    got = native.coal_ints_golden(data, mom)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_golden_degenerate_zero():
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(spec, ker, (5e-10, np.inf), norms=(1e6, 1e-9))
    got = native.coal_ints_golden(data, np.zeros((4, 6)))
    np.testing.assert_array_equal(got, 0.0)
