"""Index math and normalization factors (reference test_helper_functions.jl)."""

import numpy as np
import pytest

from cloudy_tpu.spec import (
    Family,
    SpectrumSpec,
    get_dist_moment_ind,
    get_dist_moments_ind_range,
    get_moments_normalizing_factors,
)


def test_flat_indexing():
    # two modes with (3, 2) prognostic moments (gamma + exponential)
    spec = SpectrumSpec((Family.GAMMA, Family.EXPONENTIAL))
    assert spec.nprogmoms == (3, 2)
    assert spec.n_tot == 5
    assert spec.offsets == (0, 3)
    assert spec.dist_moment_ind(0, 0) == 0
    assert spec.dist_moment_ind(0, 2) == 2
    assert spec.dist_moment_ind(1, 0) == 3
    assert spec.dist_moment_ind(1, 1) == 4
    with pytest.raises(ValueError):
        spec.dist_moment_ind(1, 2)
    assert list(spec.dist_moments_ind_range(0)) == [0, 1, 2]
    assert list(spec.dist_moments_ind_range(1)) == [3, 4]

    # functional variants
    assert get_dist_moment_ind((3, 2), 1, 1) == 4
    assert list(get_dist_moments_ind_range((3, 2), 0)) == [0, 1, 2]


def test_moment_orders_and_modes():
    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA))
    np.testing.assert_array_equal(spec.moment_orders_flat(), [0, 1, 0, 1, 2])
    np.testing.assert_array_equal(spec.mode_of_flat(), [0, 0, 1, 1, 1])


def test_normalizing_factors():
    # reference get_moments_normalizing_factors: norms[0] * norms[1]^order
    norms = (1e6, 1e-9)
    f = get_moments_normalizing_factors((3, 2), norms)
    np.testing.assert_allclose(
        f, [1e6, 1e6 * 1e-9, 1e6 * 1e-18, 1e6, 1e6 * 1e-9], rtol=1e-14
    )
    with pytest.raises(ValueError):
        get_moments_normalizing_factors((2,), (0.0, 1.0))


def test_nprog_per_family():
    assert SpectrumSpec((Family.EXPONENTIAL,)).nprogmoms == (2,)
    assert SpectrumSpec((Family.MONODISPERSE,)).nprogmoms == (2,)
    assert SpectrumSpec((Family.GAMMA,)).nprogmoms == (3,)
    assert SpectrumSpec((Family.LOGNORMAL,)).nprogmoms == (3,)
