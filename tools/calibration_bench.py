"""On-chip calibration throughput (VERDICT r3 #5b).

Measures the vmapped-ensemble EKI forward pass + Kalman update on the real
chip: J ensemble members, each a full 2-gamma coalescence box trajectory
(closure inversion + analytical Q/R/S per step under `lax.scan`), batched so
members ride the TPU lanes — the workflow EnsembleKalmanProcesses.jl drives
as J separate black-box model runs from the host. Appends a
`calibration_record` to ROOFLINE.json and prints one JSON line per config.

Usage: python -u tools/calibration_bench.py  (runs on the default platform —
the axon TPU here; chained-readback timing per CLAUDE.md gotcha 2)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_pod_forward(
    J_cols: int = 32,
    nz: int = 32,
    n_steps: int = 60,
    block_cols=None,
    interpret: bool = False,
):
    """Per-member forward model running the PRODUCTION whole-step Pallas
    kernel (VERDICT r4 #5): member parameter θ = log kernel scale enters
    through the kernel's `kernel_scale` operand (exactly equivalent to
    scaling the kernel tensor — tests/test_pallas.py), the member's
    rainshaft ensemble (`J_cols` columns × `nz` levels) rides the lanes,
    and the observables are the member's log mean moment profile after
    `n_steps`. `run_eki` vmaps this over the J members, folding them into
    the Pallas grid. Returns (forward, theta_truth)."""
    import jax
    import jax.numpy as jnp

    from cloudy_tpu.spec import Family, SpectrumSpec
    from cloudy_tpu import kernels as K
    from cloudy_tpu.coalescence import build_coalescence_data
    from cloudy_tpu.models import rainshaft as rs
    from cloudy_tpu.ops import pallas_coalescence as pc

    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(
        spec, ker, (5e-10, np.inf), norms=norms, fast_tier=True
    )
    config = rs.RainshaftConfig(spec=spec, nz=nz, zmax=3000.0, norms=norms,
                                dt=1.0)
    step = pc.make_pallas_rainshaft_step_fn(
        data, config.vel, norms, nz=nz, dz=config.dz, dt=config.dt,
        block_cols=block_cols or (J_cols * nz), interpret=interpret,
        kernel_scale=True,
    )
    ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
    ic = np.concatenate([ic1, np.zeros_like(ic1)], axis=-1)
    state0 = rs.to_soa(jnp.asarray(
        np.tile(ic[None], (J_cols, 1, 1))
        * np.linspace(0.7, 1.3, J_cols)[:, None, None],
        jnp.float32,
    ))  # [n_tot, J_cols*nz]
    B = state0.shape[1]

    def forward(theta):
        s = jnp.exp(theta[0])
        scale = jnp.full((1, B), s, state0.dtype)
        y = jax.lax.fori_loop(
            0, n_steps, lambda _, yy: step(yy, scale), state0
        )
        prof = y.reshape(spec.n_tot, J_cols, nz).mean(axis=1)  # [n_tot, nz]
        # every 4th level: 48 observables keep the J-member sample
        # covariance well-conditioned for the f32 Kalman solve (the full
        # 192-observable vector at 1e-6 noise NaN'd the J=64 update)
        prof = prof[:, ::4]
        safe = jnp.clip(
            jnp.nan_to_num(prof, nan=1e12, posinf=1e12), 1e-12, 1e12
        )
        return jnp.log(safe).reshape(-1)

    return forward, jnp.asarray([jnp.log(1.7)], jnp.float32)


def pod_main():
    """EKI with the production whole-step kernel as the forward model, on
    the real chip; appends `pod_records` to ROOFLINE.json's
    calibration_record."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from cloudy_tpu import calibrate

    n_steps, nz, J_cols = 60, 32, 32
    forward, th_true = make_pod_forward(J_cols=J_cols, nz=nz, n_steps=n_steps)
    key = jax.random.PRNGKey(0)
    y = forward(th_true)
    y = y + 1e-3 * jax.random.normal(key, y.shape, jnp.float32)

    records = []
    for J in (64, 256):
        theta0 = calibrate.ensemble_init(
            jax.random.fold_in(key, J), jnp.zeros(1, jnp.float32),
            jnp.asarray([0.7], jnp.float32), n_ens=J,
        )

        @partial(jax.jit, static_argnames=("n",))
        def chain(th, n, J=J):
            res = calibrate.run_eki(
                forward, th, y, jnp.asarray(1e-4, jnp.float32), n_iters=n,
                key=jax.random.PRNGKey(1),
            )
            return jnp.sum(res.theta) + jnp.sum(res.misfit_history)

        def t(n, reps=5):
            float(chain(theta0, n))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(theta0, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        n1 = 1
        dt_pilot = max((t(n1 + 2) - t(n1)) / 2, 1e-9)
        n2 = n1 + int(np.clip(round(0.5 / dt_pilot), 2, 500))
        sec = max((t(n2) - t(n1)) / (n2 - n1), 1e-12)

        # recovered parameter (accuracy sanity, not just speed)
        import cloudy_tpu.calibrate as cal

        res = jax.jit(lambda th: cal.run_eki(
            forward, th, y, jnp.asarray(1e-4, jnp.float32), n_iters=8,
            key=jax.random.PRNGKey(1),
        ))(theta0)
        s_hat = float(jnp.exp(jnp.mean(res.theta[:, 0])))
        rec = {
            "ensemble_members": J,
            "member_columns": J_cols,
            "nz": nz,
            "forward_steps": n_steps,
            "eki_iters_per_s": 1.0 / sec,
            "member_forwards_per_s": J / sec,
            "member_model_steps_per_s": J * n_steps / sec,
            "member_column_steps_per_s": J * J_cols * n_steps / sec,
            "s_true": 1.7,
            "s_recovered_8iters": s_hat,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.json")
    doc = json.load(open(out))
    doc.setdefault("calibration_record", {})["pod_records"] = {
        "note": "EKI with the PRODUCTION single-kernel whole-SSPRK33-step "
                "Pallas rainshaft as the forward model (per-member kernel "
                "scale via the kernel_scale operand; members x columns "
                "ride the lanes, vmap folds members into the Pallas "
                "grid). VERDICT r4 #5.",
        "hardware": "TPU v5e, 1 chip",
        "records": records,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"wrote calibration_record.pod_records to {out}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from cloudy_tpu.spec import Family, SpectrumSpec
    from cloudy_tpu import kernels as K
    from cloudy_tpu import distributions as pd
    from cloudy_tpu import stepper, calibrate
    from cloudy_tpu.coalescence import build_coalescence_data, get_coal_ints

    dtype = jnp.float32
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(
        spec, ker, (5e-10, np.inf), norms=(1e6, 1e-9), gammainc_iters=12,
        f2_exact=True, gammainc_gl_nodes=12,
    )
    mom0 = jnp.asarray([1e2, 1e1, 2.0, 1e-2, 1e-3, 2e-4], dtype)
    n_steps, save_every = 60, 12

    def forward(log_s):
        """G(log s): log-moment observations of the s-scaled kernel run
        (log-space observables keep the covariance solve f32-safe)."""
        s = jnp.exp(log_s[0])

        def rhs(m, t):
            del t
            return s * get_coal_ints(data, pd.params_from_moments(spec, m))

        _, ys = stepper.integrate(rhs, mom0, 0.0, 0.5, n_steps,
                                  save_every=save_every)
        safe = jnp.clip(jnp.nan_to_num(ys[1:], nan=1e12, posinf=1e12),
                        1e-12, 1e12)
        return jnp.log(safe).reshape(-1)

    key = jax.random.PRNGKey(0)
    y = forward(jnp.asarray([jnp.log(1.7)], dtype))
    y = y + 1e-3 * jax.random.normal(key, y.shape, dtype)

    records = []
    for J in (64, 256, 1024):
        theta0 = calibrate.ensemble_init(
            jax.random.fold_in(key, J), jnp.zeros(1, dtype),
            jnp.asarray([0.7], dtype), n_ens=J,
        )

        @partial(jax.jit, static_argnames=("n",))
        def chain(th, n, J=J):
            res = calibrate.run_eki(
                forward, th, y, jnp.asarray(1e-6, dtype), n_iters=n,
                key=jax.random.PRNGKey(1),
            )
            return jnp.sum(res.theta) + jnp.sum(res.misfit_history)

        def t(n, reps=5):
            float(chain(theta0, n))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(theta0, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        n1 = 1
        dt_pilot = max((t(n1 + 4) - t(n1)) / 4, 1e-9)
        n2 = n1 + int(np.clip(round(0.5 / dt_pilot), 4, 500))
        sec = max((t(n2) - t(n1)) / (n2 - n1), 1e-12)
        rec = {
            "ensemble_members": J,
            "forward_steps": n_steps,
            "eki_iters_per_s": 1.0 / sec,
            "member_forwards_per_s": J / sec,
            "member_model_steps_per_s": J * n_steps / sec,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.json")
    doc = json.load(open(out))
    doc["calibration_record"] = {
        "note": "EKI on the real chip: J-member vmapped forward (2-gamma "
                "coalescence box, 60 SSPRK33 steps, exact-F2/GL-12 XLA "
                "path, f32, log observables) + Kalman update, whole loop "
                "jitted. member_model_steps/s = J x 60 / iteration time.",
        "hardware": "TPU v5e, 1 chip",
        "records": records,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"wrote calibration_record to {out}", flush=True)


if __name__ == "__main__":
    if "--pod" in sys.argv:
        pod_main()
    else:
        main()
