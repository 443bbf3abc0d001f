"""Adiabatic parcel vs Rogers (1975) digitized data (reference
parcel_example.jl:188-193 — the reference validates visually; here the curve
distance is asserted quantitatively)."""

import numpy as np
import pytest

from cloudy_tpu.models import parcel as pm


def _run(kind):
    spec, mom0, ml_v = pm.init_conditions(kind)
    config = pm.ParcelConfig(spec=spec, w=10.0, dt=0.25, t_end=20.0)
    Y0 = pm.initial_state(config, mom0, ml_v, p0=8e4, T0=273.15 + 7.0, S0=1.0)
    ts, ys = pm.run_parcel(config, Y0)
    return config, np.asarray(ts), np.asarray(ys)


@pytest.mark.parametrize("kind", ["monodisperse", "gamma", "mixture"])
def test_parcel_physics_sanity(kind):
    config, ts, ys = _run(kind)
    S, p, T, qv = ys[:, 0], ys[:, 1], ys[:, 2], ys[:, 3]
    assert np.all(np.isfinite(ys))
    # rising parcel: pressure falls, temperature falls
    assert p[-1] < p[0]
    assert T[-1] < T[0]
    # supersaturation rises from 0, peaks below ~2%, stays positive
    assert S.max() > 1.0005
    assert S.max() < 1.02
    # vapor is consumed, liquid grows
    assert qv[-1] < qv[0]
    assert ys[-1, 5] > ys[0, 5]


def test_parcel_vs_rogers_1975():
    """Supersaturation trajectory within ~35% of the digitized Rogers curve
    and radius growth within ~0.5 μm — the quantitative version of the
    reference's visual benchmark (constants differ slightly)."""
    config, ts, ys = _run("gamma")
    supersat_pct = (ys[:, 0] - 1.0) * 100.0
    got = np.interp(pm.ROGERS_TIME_SUPERSAT, ts, supersat_pct)
    # shape: rises fast then quasi-plateau
    assert abs(got[-1] - pm.ROGERS_SUPERSAT[-1]) < 0.35
    assert np.max(np.abs(got - pm.ROGERS_SUPERSAT)) < 0.45

    N_l, M_l = ys[:, 4], ys[:, 5]
    r_um = (M_l / N_l / config.tps.rho_w * 3 / 4 / np.pi) ** (1 / 3) * 1e6
    got_r = np.interp(pm.ROGERS_TIME_RADIUS, ts, r_um)
    assert np.max(np.abs(got_r - pm.ROGERS_RADIUS)) < 0.6


def test_parcel_mass_budget_closed():
    """q_v + q_l changes only through density variation; the vapor→liquid
    conversion must balance step-by-step."""
    config, ts, ys = _run("gamma")
    from cloudy_tpu.models import thermodynamics as th

    rho = np.asarray(
        [
            float(th.air_density(config.tps, T, p, qv))
            for T, p, qv in zip(ys[:, 2], ys[:, 1], ys[:, 3])
        ]
    )
    q_l = ys[:, 5] / rho
    total = ys[:, 3] + q_l
    np.testing.assert_allclose(total, total[0], rtol=2e-3)


def test_parcel_adaptive_matches_fixed_dt():
    """run_parcel_adaptive (added capability — the reference's
    reltol/abstol kwargs are inert under fixed-step SSPRK33,
    parcel_example.jl:105-110) agrees with the fine fixed-dt trajectory
    endpoint."""
    spec, mom0, ml_v = pm.init_conditions("monodisperse")
    config = pm.ParcelConfig(spec=spec, w=10.0, dt=0.25, t_end=20.0)
    Y0 = pm.initial_state(config, mom0, ml_v, p0=8e4, T0=273.15 + 7.0, S0=1.0)
    _, ys = pm.run_parcel(config, Y0)
    y_ad, st = pm.run_parcel_adaptive(config, Y0, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(y_ad), np.asarray(ys[-1]), rtol=1e-5, atol=1e-12
    )
    assert int(st["n_reject"]) < int(st["n_accept"])
