"""Scenario harness smoke tests (the cheap scenarios)."""

import numpy as np
import pytest

from cloudy_tpu import harness


def test_box_single_gamma_scenario(tmp_path):
    ts, ys, rep = harness.run_scenario(
        "box_single_gamma_golovin", outdir=str(tmp_path)
    )
    assert rep["finite"]
    # golovin number decay anchor
    np.testing.assert_allclose(
        ys[-1, 0], 1e8 * np.exp(-5.0 * 1e-2 * ts[-1]), rtol=1e-3
    )
    assert (tmp_path / "box_single_gamma_golovin.nc").exists()
    assert (tmp_path / "runs.jsonl").exists()


def test_exp_gamma_mixture_scenario(tmp_path):
    ts, ys, rep = harness.run_scenario("box_exp_gamma_mixture", outdir=str(tmp_path))
    assert rep["finite"]
    # total mass conserved (flat mass indices via the spec, exp has 2 moments)
    from cloudy_tpu.spec import Family, SpectrumSpec

    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA))
    i0, i1 = spec.dist_moment_ind(0, 1), spec.dist_moment_ind(1, 1)
    np.testing.assert_allclose(
        ys[-1, i0] + ys[-1, i1], ys[0, i0] + ys[0, i1], rtol=1e-6
    )


def test_scenario_registry_complete():
    assert set(harness.SCENARIOS) == {
        "box_single_gamma_golovin",
        "box_exp_gamma_mixture",
        "box_long_numerical",
        "rainshaft_128",
        "pod_ensemble",
    }


def test_pod_ensemble_scenario_smoke_with_diagnostics(tmp_path):
    """The pod scenario at toy scale on CPU: on-device fori_loop chain,
    conservation report, and the mean-profile diagnostics NetCDF (the
    pod-scale observability output — the full state is GBs on the real
    workload, the per-level ensemble mean is what a pod job monitors)."""
    sc = harness._scenario_pod_ensemble(n_columns=8)
    # run through run_scenario for the full output path
    import cloudy_tpu.harness as H

    orig = H.SCENARIOS["pod_ensemble"]
    H.SCENARIOS["pod_ensemble"] = lambda: sc
    try:
        ts, ys, rep = harness.run_scenario("pod_ensemble", outdir=str(tmp_path))
    finally:
        H.SCENARIOS["pod_ensemble"] = orig
    assert rep["finite"]
    assert rep["negative_fraction"] == 0.0
    assert rep["n_columns"] == 8
    nc = tmp_path / "pod_ensemble_mean_profile.nc"
    assert nc.exists()
