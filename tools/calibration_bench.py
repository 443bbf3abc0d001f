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
    main()
