"""Scaling measurements where hardware actually exists (VERDICT r1 #5).

Two measurements, replacing the rhetorical evidence the round-1 SCALING.json
carried:

1. ``--tpu``: the pod workload (rainshaft ensemble: 32 z-levels, 2 gamma
   modes, coalescence through the fused Pallas kernel at the bench config +
   upwind sedimentation, one full SSPRK33 step) on the single real v5e chip
   at several batch sizes — shows the per-device term of the scaling law
   saturating, which is the term a pod multiplies.
2. ``--cpu2``: weak scaling at exactly 2 devices on the 2 physical host
   cores (the only configuration in this sandbox where devices map 1:1 onto
   hardware). The column-sharded step has zero collectives, so efficiency
   here is the honest small-scale proxy for the ≥80% BASELINE target; the
   8-virtual-device sweep (kept for sharding-overhead evidence) measures
   oversubscription, not scaling.

Timing uses the adaptive differential chained-readback protocol (see
bench.py): chain length chosen so the differential device time is ~0.5 s.

Usage:
    python -u tools/scaling_measure.py --tpu          # on the axon chip
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
        python -u tools/scaling_measure.py --cpu2     # 2 devices, 2 cores

Each run prints JSON records and merges them into SCALING.json.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_step(use_pallas: bool, mesh=None):
    import jax
    import jax.numpy as jnp

    from cloudy_tpu.spec import Family, SpectrumSpec
    from cloudy_tpu import kernels as K
    from cloudy_tpu.coalescence import build_coalescence_data
    from cloudy_tpu.models import rainshaft as rs
    from cloudy_tpu import stepper as st

    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(
        spec, ker, (5e-10, np.inf), norms=norms, gammainc_iters=12,
        f2_exact=True,
    )
    config = rs.RainshaftConfig(
        spec=spec, nz=32, zmax=3000.0, norms=norms, dt=1.0
    )
    coal = None
    if use_pallas:
        from cloudy_tpu.ops import pallas_coalescence as pc

        coal = pc.make_pallas_coal_fn(data, block_cols=4096)
    rhs = rs.make_rainshaft_rhs(config, data, coal_fn=coal)

    if mesh is None:
        def step(y):
            return st.ssprk33_step(rhs, y, jnp.asarray(0.0, y.dtype), 1.0)

        return spec, config, step
    from cloudy_tpu.parallel.ensemble import ensemble_rainshaft_step

    return spec, config, ensemble_rainshaft_step(rhs, config.dt, mesh)


def timed_column_rate(step, state, reps=5, n1=2):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def chain(y, n):
        return jnp.sum(
            jax.lax.fori_loop(0, n, lambda _, yy: step(yy), y)[..., 1]
        )

    def t(n):
        float(chain(state, n))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(state, n))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt_pilot = max((t(n1 + 4) - t(n1)) / 4, 1e-9)
    n2 = n1 + int(np.clip(round(0.5 / dt_pilot), 8, 2000))
    dt = max((t(n2) - t(n1)) / (n2 - n1), 1e-12)
    return state.shape[0] / dt


def make_state(config, n_columns, dtype):
    import jax.numpy as jnp

    from cloudy_tpu.models import rainshaft as rs

    ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
    ic = np.concatenate([ic1, np.zeros_like(ic1)], axis=-1)
    return jnp.asarray(np.tile(ic[None], (n_columns, 1, 1)), dtype)


def run_tpu(records):
    import jax
    import jax.numpy as jnp

    spec, config, step = build_step(use_pallas=True)
    for b_log2 in (17, 19, 20):
        B = 1 << b_log2
        state = make_state(config, B, jnp.float32)
        rate = timed_column_rate(step, state)
        rec = {
            "kind": "real_tpu_single_chip",
            "hardware": "TPU v5e, 1 chip",
            "workload": "rainshaft ensemble step (nz=32, 2 gamma modes, "
                        "fused Pallas coalescence f2_exact + upwind "
                        "sedimentation, SSPRK33), f32",
            "n_columns": B,
            "column_updates_per_s": rate,
            "level_updates_per_s": rate * config.nz,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)


def run_cpu2(records):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices("cpu")
    assert len(devs) >= 2, (
        "launch with XLA_FLAGS=--xla_force_host_platform_device_count=2"
    )
    from cloudy_tpu.parallel.mesh import make_mesh

    cols_per_dev = 512
    base = None
    for d in (1, 2):
        mesh = make_mesh(("columns",), (d,), devices=devs[:d])
        spec, config, step = build_step(use_pallas=False, mesh=mesh)
        state = make_state(config, cols_per_dev * d, jnp.float32)
        state = jax.device_put(state, NamedSharding(mesh, P("columns")))
        rate = timed_column_rate(step, state)
        if base is None:
            base = rate / d
        rec = {
            "kind": "two_core_cpu_weak_scaling",
            "hardware": "host CPU, 2 physical cores, 1 device per core",
            "devices": d,
            "columns": cols_per_dev * d,
            "columns_per_s": rate,
            "efficiency": rate / (base * d),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--cpu2", action="store_true")
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    records = []
    if args.cpu2:
        run_cpu2(records)
    if args.tpu:
        run_tpu(records)

    # merge into SCALING.json
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    for rec in records:
        kind = rec.pop("kind")
        doc.setdefault(kind, [])
        if not isinstance(doc[kind], list):
            doc[kind] = [doc[kind]]
        doc[kind].append(rec)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged {len(records)} records into {args.out}", flush=True)


if __name__ == "__main__":
    main()
