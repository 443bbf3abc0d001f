"""End-to-end pod-workload step profile on the real TPU (VERDICT r2 #1).

The BASELINE north star is *column-updates/s of the full SSPRK33 rainshaft
step* (1M-column ensemble, nz levels, coalescence + sedimentation), not the
RHS-only kernel rate. This tool measures the stage breakdown by ablation —
the axon tunnel does not expose a usable on-chip trace, and ablation timing
answers the actual question (where does the non-kernel time go):

  full_step_fused     SSPRK33 over the fully fused RHS kernel (coal +
                      sedi flux + clip/normalize/mask in ONE Pallas kernel,
                      SoA layout end to end) — the round-3 production path
  full_step_coal_fn   SSPRK33 over the round-2 path: Pallas coal kernel
                      behind the `coal_fn` hook + XLA sedimentation flux
                      (closure inversion + lgamma/exp per level in XLA) +
                      [B, n_tot] ↔ [n_tot, B] transposes per stage
  rhs_fused           one fused-RHS evaluation (kernel + upwind divergence)
  kernel_fused        the fused RHS kernel alone (no divergence)
  kernel_coal         the coalescence-only kernel (bench.py's kernel) on the
                      same column-level count — the round-2 headline op
  stencil_rk          SSPRK33 over a divergence-only RHS (flux := state) —
                      the XLA-side stencil + RK AXPY floor

Each timing uses the adaptive differential chained-readback protocol (see
bench.py: the axon runtime's block_until_ready does not reliably wait; two
chain lengths cancel the RPC constant).

Writes PROFILE.json and prints one JSON record per stage.

Usage:  python -u tools/profile_step.py [--columns 32768] [--nz 32]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed_steps(step, state, reps=5, n1=2, target_s=0.5):
    """Median differential seconds per application of `step` (device time,
    RPC constant cancelled)."""
    import jax
    import jax.numpy as jnp
    # persistent compile cache: the axon-tunnel compiles cost minutes; cache
    # them across invocations (single-writer discipline — see CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    @partial(jax.jit, static_argnames=("n",))
    def chain(y, n):
        out = jax.lax.fori_loop(0, n, lambda _, yy: step(yy), y)
        return jnp.sum(out[0] if isinstance(out, tuple) else out)

    def t(n):
        float(chain(state, n))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(state, n))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt_pilot = max((t(n1 + 4) - t(n1)) / 4, 1e-9)
    n2 = n1 + int(np.clip(round(target_s / dt_pilot), 8, 3000))
    return max((t(n2) - t(n1)) / (n2 - n1), 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--columns", type=int, default=32768)
    ap.add_argument("--nz", type=int, default=32)
    ap.add_argument("--block-cols", type=int, default=4096)
    ap.add_argument("--out", default="PROFILE.json")
    ap.add_argument("--skip", default="", help="comma-separated stages to skip")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax
    import jax.numpy as jnp

    from cloudy_tpu.spec import Family, SpectrumSpec
    from cloudy_tpu import kernels as K, stepper as st
    from cloudy_tpu.coalescence import build_coalescence_data
    from cloudy_tpu.models import rainshaft as rs
    from cloudy_tpu.ops import pallas_coalescence as pc

    E, nz = args.columns, args.nz
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(
        spec, ker, (5e-10, np.inf), norms=norms, gammainc_iters=12,
        f2_exact=True, gammainc_gl_nodes=12,
    )
    config = rs.RainshaftConfig(spec=spec, nz=nz, zmax=3000.0, norms=norms, dt=1.0)

    ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
    ic = np.concatenate([ic1, np.zeros_like(ic1)], axis=-1)
    state_aos = jnp.asarray(
        np.tile(ic[None], (E, 1, 1)) * np.linspace(0.5, 1.5, E)[:, None, None],
        jnp.float32,
    )
    state_soa = jnp.asarray(rs.to_soa(state_aos))  # flat [n_tot, E·nz]
    n_tot = spec.n_tot
    B = E * nz

    fused = pc.make_pallas_rainshaft_rhs_fn(
        data, config.vel, config.norms, block_cols=args.block_cols
    )
    rhs_fused = rs.make_rainshaft_rhs_fused(config, fused)

    coal = pc.make_pallas_coal_fn(data, block_cols=args.block_cols)
    rhs_coal_fn = rs.make_rainshaft_rhs(config, data, coal_fn=coal)

    dt = jnp.asarray(1.0, jnp.float32)

    stages = {}

    def stage(name, step, state, per_apply_updates):
        if name in skip:
            return
        sec = timed_steps(step, state)
        stages[name] = {
            "seconds": sec,
            "updates_per_s": per_apply_updates / sec,
        }
        print(json.dumps({"stage": name, **stages[name]}), flush=True)

    # --- full steps: column-updates/s (E per application) -----------------
    whole = pc.make_pallas_rainshaft_step_fn(
        data, config.vel, config.norms, nz=nz, dz=config.dz, dt=1.0,
        block_cols=args.block_cols,
    )
    stage("full_step_one_kernel", whole, state_soa, E)
    stage(
        "full_step_fused",
        lambda y: st.ssprk33_step(rhs_fused, y, 0.0, dt),
        state_soa,
        E,
    )
    stage(
        "full_step_coal_fn",
        lambda y: st.ssprk33_step(rhs_coal_fn, y, 0.0, dt),
        state_aos,
        E,
    )

    # --- single-RHS / kernel ablations: column-LEVEL updates/s (B) --------
    stage("rhs_fused", lambda y: y + 1e-9 * rhs_fused(y, 0.0), state_soa, B)
    flat = state_soa
    stage(
        "kernel_fused",
        lambda m: m + 1e-9 * fused.soa(m)[:n_tot],
        flat,
        B,
    )
    # coalescence-only kernel on NORMALIZED moments (bench.py's op)
    from cloudy_tpu.spec import get_moments_normalizing_factors

    mn = jnp.asarray(
        get_moments_normalizing_factors(spec.nprogmoms, norms), jnp.float32
    )
    flat_n = flat / mn[:, None]
    stage("kernel_coal", lambda m: m + 1e-9 * coal.soa(m), flat_n, B)

    # XLA-side floor: stencil + RK AXPYs with a trivial flux (flat form:
    # lane-shift + periodic top-of-column mask, same as the fused RHS)
    def rhs_stencil(y, t):
        del t
        j = jax.lax.broadcasted_iota(jnp.int32, (1, y.shape[-1]), 1)
        top = (j % nz) == (nz - 1)
        f_up = jnp.where(top, 0.0, jnp.roll(y, -1, axis=-1))
        return -(f_up - y) / config.dz

    stage(
        "stencil_rk",
        lambda y: st.ssprk33_step(rhs_stencil, y, 0.0, dt),
        state_soa,
        E,
    )

    doc = {
        "hardware": "TPU v5e, 1 chip (axon tunnel)",
        "workload": {
            "spec": "2x gamma",
            "n_columns": E,
            "nz": nz,
            "dtype": "float32",
            "coal": "fused Pallas, f2_exact, gammainc_gl_nodes=12 (proven "
                    "2.6e-7 bound, tests/test_special.py)",
            "vel": "50·x^(1/6)",
        },
        "stages": stages,
    }
    if stages.get("full_step_fused") and stages.get("full_step_coal_fn"):
        doc["speedup_fused_vs_coal_fn"] = (
            stages["full_step_coal_fn"]["seconds"]
            / stages["full_step_fused"]["seconds"]
        )
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
