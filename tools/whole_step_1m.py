"""North-star measurement: the single-kernel whole-SSPRK33-step at the full
BASELINE pod scale (1M columns x 32 levels) on one chip; merges the record
into SCALING.json."""

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
    from cloudy_tpu.coalescence import build_coalescence_data
    from cloudy_tpu.models import rainshaft as rs
    from cloudy_tpu.ops import pallas_coalescence as pc

    E, nz = 1 << 20, 32
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(
        spec, ker, (5e-10, np.inf), norms=norms, gammainc_iters=12,
        f2_exact=True, gammainc_gl_nodes=12,
    )
    config = rs.RainshaftConfig(spec=spec, nz=nz, zmax=3000.0, norms=norms, dt=1.0)
    step = pc.make_pallas_rainshaft_step_fn(
        data, config.vel, config.norms, nz=nz, dz=config.dz, dt=1.0,
        block_cols=4096,
    )

    ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
    ic = np.concatenate([ic1, np.zeros_like(ic1)], axis=-1)
    state = rs.to_soa(jnp.asarray(
        np.tile(ic[None], (E, 1, 1)) * np.linspace(0.5, 1.5, E)[:, None, None],
        jnp.float32,
    ))

    @partial(jax.jit, static_argnames=("n",))
    def chain(y, n):
        return jnp.sum(jax.lax.fori_loop(0, n, lambda _, yy: step(yy), y))

    def t(n, reps=5):
        float(chain(state, n))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(state, n))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    n1 = 2
    dt_pilot = max((t(n1 + 4) - t(n1)) / 4, 1e-9)
    n2 = n1 + int(np.clip(round(0.5 / dt_pilot), 8, 2000))
    sec = max((t(n2) - t(n1)) / (n2 - n1), 1e-12)
    rec = {
        "round": 3,
        "hardware": "TPU v5e, 1 chip",
        "workload": "SINGLE-KERNEL whole SSPRK33 step (3 RHS + stencil + RK "
                    "in one Pallas kernel; coal f2_exact/GL-12 + sedi flux; "
                    "flat SoA), nz=32, 2 gamma modes, f32",
        "n_columns": E,
        "column_updates_per_s": E / sec,
        "level_updates_per_s": E * nz / sec,
    }
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    doc = json.load(open(out))
    doc.setdefault("real_tpu_single_chip", []).append(rec)
    json.dump(doc, open(out, "w"), indent=1)
    print("merged into SCALING.json", flush=True)


if __name__ == "__main__":
    main()
