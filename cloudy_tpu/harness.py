"""Scenario harness: the BASELINE.json configurations as runnable configs.

One registry entry per BASELINE scenario (BASELINE.json `configs`), each
returning a config + runner. `run_scenario(name)` integrates, writes NetCDF
output and a JSONL metrics log, and returns the trajectory — the framework's
equivalent of the reference's per-example CI jobs, with observability wired
in (SURVEY.md §5).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import kernels as K
from cloudy_tpu.coalescence import build_coalescence_data
from cloudy_tpu.models import box, rainshaft as rs
from cloudy_tpu.utils import io, metrics


def _scenario_box_single_gamma():
    """BASELINE configs[0]: 0-D box, single gamma, Golovin kernel, 3 moments."""
    spec = SpectrumSpec((Family.GAMMA,))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(spec, ker, (np.inf,), norms=norms)
    config = box.BoxConfig(spec=spec, norms=norms, t_end=120.0, dt=1.0)
    rhs = jax.jit(box.make_box_rhs(config, coal_data=data))
    mom0 = jnp.asarray([1e8, 1e-2, 2e-12])

    def run():
        return box.run_box(config, rhs, mom0)

    return {
        "spec": spec,
        "config": config,
        "run": run,
        "kind": "box",
        "data": data,
        "mom0": mom0,
    }


def _scenario_box_exp_gamma_mixture():
    """BASELINE configs[1]: 0-D box, exponential+gamma mixture, 5 prognostic
    moments, constant + linear kernel (summed tensor), finite threshold."""
    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA))
    norms = (1e6, 1e-9)
    # constant rate chosen so 1/(B·M0) ≈ 50 s — stable at dt = 1 s
    const = K.CoalescenceTensor.from_function(K.ConstantKernelFunction(2e-10), 1, 1e-6)
    lin = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    combined = K.CoalescenceTensor(const.array + lin.array)
    data = build_coalescence_data(spec, combined, (5e-10, np.inf), norms=norms)
    config = box.BoxConfig(spec=spec, norms=norms, t_end=120.0, dt=1.0)
    rhs = jax.jit(box.make_box_rhs(config, coal_data=data))
    mom0 = jnp.asarray([1e8, 1e-2, 1.0, 1e-8, 2e-16])

    def run():
        return box.run_box(config, rhs, mom0)

    return {
        "spec": spec,
        "config": config,
        "run": run,
        "kind": "box",
        "data": data,
        "mom0": mom0,
    }


def _scenario_box_long_numerical():
    """BASELINE configs[2]: 0-D box, Long kernel via numerical quadrature,
    two-mode closure with parameter inversion."""
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    kf = K.LongKernelFunction(5.236e-10, 9.44e9, 5.78)
    config = box.BoxConfig(spec=spec, norms=norms, t_end=60.0, dt=2.0)
    rhs = jax.jit(box.make_box_rhs(config, kernel_func=kf, numerical=True))
    mom0 = jnp.asarray([1e7, 1e-3, 2e-13, 1e5, 1e-4, 2e-13])

    def run():
        return box.run_box(config, rhs, mom0)

    return {"spec": spec, "config": config, "run": run, "kind": "box"}


def _scenario_rainshaft_128():

    """BASELINE configs[3]: 1-D rainshaft, 128 levels, coalescence + upwind
    sedimentation."""
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(spec, ker, (5e-10, np.inf), norms=norms)
    config = rs.RainshaftConfig(
        spec=spec, nz=128, zmax=3000.0, norms=norms, t_end=300.0, dt=1.0,
        save_every=30,
    )
    rhs = jax.jit(rs.make_rainshaft_rhs(config, data))
    ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
    ic = np.concatenate([ic1, np.zeros_like(ic1)], axis=-1)

    def run():
        return rs.run_rainshaft(config, rhs, ic)

    return {
        "spec": spec,
        "config": config,
        "run": run,
        "kind": "rainshaft",
        "data": data,
        "ic": ic,
    }


#: pod-scenario production variants (VERDICT r4 #2: every production kernel
#: gets the pod treatment, not just fixed-threshold 2-gamma). Each entry:
#: (families, thresholds, moving, extra build_coalescence_data kwargs).
POD_VARIANTS = {
    "fixed2gamma": (
        (Family.GAMMA, Family.GAMMA), (5e-10, np.inf), False, {},
    ),
    "moving": (
        (Family.GAMMA, Family.GAMMA), (0.9, 1.0), True, {},
    ),
    "lognorm": (
        (Family.LOGNORMAL, Family.GAMMA), (5e-10, np.inf), False,
        {"lognorm_gl_nodes": 16},
    ),
}


def _scenario_pod_ensemble(n_columns: int = 1 << 20, variant: str = "fixed2gamma"):
    """BASELINE configs[4]: column ensemble sharded over the mesh (run on
    however many devices are present; on a pod slice this spans hosts).

    On an accelerator backend this runs the round-3 production path: the
    single-kernel whole-SSPRK33-step Pallas kernel (closure → coalescence →
    sedimentation → stencil → RK in one kernel) over the flat SoA layout,
    sharded over a pure-columns mesh. The XLA path on the AoS layout (same
    physics) remains the CPU/portable fallback. `variant` selects the
    production kernel configuration (POD_VARIANTS): fixed-threshold
    2-gamma (the flagship), MovingThreshold 2-gamma (percentile thresholds
    inverted per column per stage, reference Coalescence.jl:152-185), or
    lognormal+gamma on the recentered-window rule
    (ParticleDistributions.jl:614-625)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cloudy_tpu.parallel.mesh import make_mesh
    from cloudy_tpu.parallel.ensemble import (
        ensemble_rainshaft_step,
        ensemble_rainshaft_step_soa,
    )

    fams, thresholds, moving, data_kw = POD_VARIANTS[variant]
    spec = SpectrumSpec(fams)
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    # production fast path: exact F2 factorization + proven-bound GL
    # incomplete gamma (+ Halley/GL percentile inverse for moving, the
    # GL-16 window rule for lognormal), at the accuracy-gated bench
    # configuration (tests/test_golden.py gates the flagship config at 1e-3
    # against the stored f64 reference-parity trajectories;
    # tests/test_special.py pins the special-function bounds)
    data = build_coalescence_data(
        spec, ker, thresholds, norms=norms, moving=moving, fast_tier=True,
        **data_kw,
    )
    nz = 32
    config = rs.RainshaftConfig(
        spec=spec, nz=nz, zmax=3000.0, norms=norms, t_end=120.0, dt=1.0
    )
    mesh = make_mesh(("columns",))
    n_dev = len(mesh.devices.flat)
    n_cols = max(n_columns // n_dev, 1) * n_dev

    ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
    ic = np.concatenate([ic1, np.zeros_like(ic1)], axis=-1)
    state_aos = jnp.asarray(np.tile(ic[None], (n_cols, 1, 1)), jnp.float32)

    fused_soa = jax.default_backend() not in ("cpu",)
    if fused_soa:
        from cloudy_tpu.ops import pallas_coalescence as pc
        from cloudy_tpu.parallel.ensemble import ensemble_whole_step

        # single-kernel whole SSPRK33 step — the pod production path
        # (SCALING.json single-chip record at this exact configuration)
        whole = pc.make_pallas_rainshaft_step_fn(
            data, config.vel, config.norms, nz=nz, dz=config.dz,
            dt=config.dt, block_cols=4096,
        )
        step_fn = ensemble_whole_step(whole, mesh)
        state = jax.device_put(
            rs.to_soa(state_aos), NamedSharding(mesh, P(None, "columns"))
        )
    else:
        rhs = rs.make_rainshaft_rhs(config, data)
        step_fn = ensemble_rainshaft_step(rhs, config.dt, mesh)
        state = jax.device_put(state_aos, NamedSharding(mesh, P("columns")))

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(y, n):
        # all n steps inside ONE executable (`fori_loop`, as
        # tools/whole_step_1m.py does): the host dispatches once, not
        # per-step through the ~30 ms tunnel RPC — the recorded wall time
        # is the device rate, not dispatch overhead (VERDICT r3 #5)
        return jax.lax.fori_loop(0, n, lambda _, yy: step_fn(yy), y)

    n_steps = int(round(config.t_end / config.dt))
    # pod-scale observability: pulling the full [n_cols, nz, n_tot] state
    # to host is GBs through the tunnel, so the scan emits the ensemble
    # column-MEAN moment profile [nz, n_tot] per save interval instead —
    # tiny, and the mean over the sharded column axis is exactly the
    # "diagnostics psum" collective the scaling docs describe
    save_every = max(n_steps // 12, 1)
    n_saves = n_steps // save_every

    @functools.partial(jax.jit, static_argnames=("n_saves", "seg"))
    def chain_diag(y, n_saves, seg):
        def body(yy, _):
            yy = jax.lax.fori_loop(0, seg, lambda _, s: step_fn(s), yy)
            if fused_soa:
                prof = yy.reshape(spec.n_tot, -1, nz).mean(axis=1).T
            else:
                prof = yy.mean(axis=0)
            return yy, prof
        return jax.lax.scan(body, y, None, length=n_saves)

    if fused_soa:
        # warm the chain executable and the state transfer OUTSIDE the
        # timed run: the first invocation pays the tunnel compile /
        # cache-load (~70 s) which would otherwise swamp the ~4 s of
        # device compute and make the recorded rate dispatch-bound again
        float(jnp.sum(chain(state, n_steps)[0, :1]))

    def run():
        y = chain(state, n_steps)
        if fused_soa:
            y = rs.from_soa(y, nz)
        # scalar readback: the axon runtime's block_until_ready does not
        # actually wait (CLAUDE.md gotcha 2) — force completion so the
        # caller's wall clock is honest
        float(jnp.sum(y[..., 0, 0]))
        return jnp.arange(n_steps + 1.0), y[None]

    def run_diagnostics():
        """Mean-profile time series [n_saves, nz, n_tot] (separate pass —
        kept out of `run` so the recorded wall time stays the bare
        production rate)."""
        _, profs = chain_diag(state, n_saves, save_every)
        ts = config.dt * save_every * jnp.arange(1.0, n_saves + 1.0)
        return np.asarray(ts), np.asarray(profs)

    state_sharding = (
        NamedSharding(mesh, P(None, "columns"))
        if fused_soa
        else NamedSharding(mesh, P("columns"))
    )

    def run_checkpointed(ckpt_path, segment=None, max_segments=None):
        """The pod chain at SEGMENT granularity with a checkpoint written
        after every segment (VERDICT r4 #3: a pod job that dies at step
        100 of 1000 must not restart from zero). Resumes from the newest
        checkpoint under `ckpt_path` automatically; `max_segments` stops
        after that many segments (simulated preemption — returns None).
        The segment chain applies the same jitted `step_fn` the
        uninterrupted `run()` chain applies, in the same order, so a
        resumed run is BIT-IDENTICAL to an uninterrupted one
        (tests/test_harness.py pins this). npz checkpoints: exact f32
        round-trip, no serializer in the loop."""
        from cloudy_tpu.utils import checkpoint as ck

        seg = int(segment or save_every)
        y, start = state, 0
        s0 = ck.latest_step(ckpt_path)
        if s0 is not None:
            y, start = ck.load_checkpoint(ckpt_path, s0, like=state)
            y = jax.device_put(jnp.asarray(y, state.dtype), state_sharding)
        done, nseg = start, 0
        while done < n_steps:
            k = min(seg, n_steps - done)
            y = chain(y, k)
            # force completion before declaring the segment durable
            # (axon's block_until_ready does not wait — CLAUDE.md gotcha 2)
            float(jnp.sum(y[(0,) * (y.ndim - 1)][:1]))
            done += k
            ck.save_checkpoint(
                ckpt_path, jax.device_get(y), done, use_orbax=False
            )
            nseg += 1
            if max_segments is not None and nseg >= max_segments:
                return None
        if fused_soa:
            y = rs.from_soa(y, nz)
        float(jnp.sum(y[..., 0, 0]))
        return jnp.arange(n_steps + 1.0), y[None]

    return {
        "spec": spec,
        "config": config,
        "run": run,
        "run_checkpointed": run_checkpointed,
        "kind": "ensemble",
        "diagnostics": run_diagnostics,
    }


SCENARIOS: Dict[str, Callable] = {
    "box_single_gamma_golovin": _scenario_box_single_gamma,
    "box_exp_gamma_mixture": _scenario_box_exp_gamma_mixture,
    "box_long_numerical": _scenario_box_long_numerical,
    "rainshaft_128": _scenario_rainshaft_128,
    "pod_ensemble": _scenario_pod_ensemble,
    "pod_ensemble_moving": functools.partial(
        _scenario_pod_ensemble, variant="moving"
    ),
    "pod_ensemble_lognorm": functools.partial(
        _scenario_pod_ensemble, variant="lognorm"
    ),
}


def run_scenario(
    name: str, outdir: Optional[str] = None, ckpt_dir: Optional[str] = None
):
    """Build, run, log and write outputs for one named scenario. With
    `ckpt_dir`, scenarios that support it (the pod ensembles) run at
    segment granularity with a checkpoint per segment and resume from the
    newest checkpoint automatically."""
    sc = SCENARIOS[name]()
    timer = metrics.StepTimer()
    t0 = time.perf_counter()
    if ckpt_dir and "run_checkpointed" in sc:
        os.makedirs(ckpt_dir, exist_ok=True)
        ts, ys = sc["run_checkpointed"](os.path.join(ckpt_dir, name))
    else:
        ts, ys = sc["run"]()
    jax.block_until_ready(ys)
    wall = time.perf_counter() - t0

    report = {"scenario": name, "wall_s": wall}
    if sc["kind"] == "ensemble":
        # pod-scale state: keep the reduction on-device (pulling the full
        # [n_cols, nz, n_tot] ensemble to host is GBs through the tunnel)
        report["finite"] = bool(jnp.all(jnp.isfinite(ys[-1])))
        report.update(metrics.conservation_report(sc["spec"], ys[-1]))
        report["n_columns"] = int(np.prod(ys[-1].shape[:-2]))
        cfg = sc["config"]
        n_steps = int(round(cfg.t_end / cfg.dt))
        report["n_steps"] = n_steps
        report["column_updates_per_s"] = report["n_columns"] * n_steps / wall
        ts_np, ys_np = np.asarray(ts), None
    else:
        ts_np, ys_np = np.asarray(ts), np.asarray(ys)
        report["finite"] = bool(np.all(np.isfinite(ys_np)))
        report.update(
            metrics.conservation_report(sc["spec"], jnp.asarray(ys_np[-1]))
        )
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        if sc["kind"] == "ensemble" and "diagnostics" in sc:
            # ensemble observability: mean column profiles over time as a
            # rainshaft NetCDF (the full state is GBs; the mean is the
            # per-level ensemble diagnostic a pod job actually monitors)
            dts, dprofs = sc["diagnostics"]()
            io.rainshaft_output(
                os.path.join(outdir, f"{name}_mean_profile.nc"), sc["spec"],
                dts, sc["config"].z, dprofs, sc["config"].norms,
            )
        if sc["kind"] == "box":
            io.box_output(
                os.path.join(outdir, f"{name}.nc"), sc["spec"], ts_np, ys_np,
                sc["config"].norms,
            )
        elif sc["kind"] == "rainshaft":
            io.rainshaft_output(
                os.path.join(outdir, f"{name}.nc"), sc["spec"], ts_np,
                sc["config"].z, ys_np, sc["config"].norms,
            )
        metrics.JsonlLogger(os.path.join(outdir, "runs.jsonl")).log(report)
    return ts_np, ys_np, report


if __name__ == "__main__":
    import sys

    # persistent compile cache for CLI runs (axon compiles cost minutes;
    # safe for short-lived tool processes — see CLAUDE.md gotcha 8)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    argv = sys.argv[1:]
    ckpt = None
    if "--ckpt" in argv:
        i = argv.index("--ckpt")
        ckpt = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    names = argv or ["box_single_gamma_golovin"]
    for n in names:
        _, _, rep = run_scenario(n, outdir="scenario_output", ckpt_dir=ckpt)
        print(rep)
