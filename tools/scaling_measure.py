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
    """use_pallas=True → the round-3 production path: the fully fused
    Pallas RHS kernel in the flat SoA layout (state [n_tot, E·nz]);
    use_pallas=False → the XLA path on the AoS layout (the CPU-portable
    configuration the cpu2 weak-scaling measurement uses)."""
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
        f2_exact=True, gammainc_gl_nodes=12,
    )
    config = rs.RainshaftConfig(
        spec=spec, nz=32, zmax=3000.0, norms=norms, dt=1.0
    )
    if use_pallas:
        from cloudy_tpu.ops import pallas_coalescence as pc

        fused = pc.make_pallas_rainshaft_rhs_fn(
            data, config.vel, config.norms, block_cols=4096
        )
        rhs = rs.make_rainshaft_rhs_fused(config, fused)
        if mesh is None:
            def step(y):
                return st.ssprk33_step(rhs, y, jnp.asarray(0.0, y.dtype), 1.0)

            return spec, config, step
        from cloudy_tpu.parallel.ensemble import ensemble_rainshaft_step_soa

        return spec, config, ensemble_rainshaft_step_soa(rhs, config.dt, mesh)

    rhs = rs.make_rainshaft_rhs(config, data)
    if mesh is None:
        def step(y):
            return st.ssprk33_step(rhs, y, jnp.asarray(0.0, y.dtype), 1.0)

        return spec, config, step
    from cloudy_tpu.parallel.ensemble import ensemble_rainshaft_step

    return spec, config, ensemble_rainshaft_step(rhs, config.dt, mesh)


def timed_column_rate(step, state, n_columns, reps=5, n1=2):
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
    return n_columns / dt


def make_state(config, n_columns, dtype):
    import jax.numpy as jnp

    from cloudy_tpu.models import rainshaft as rs

    ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
    ic = np.concatenate([ic1, np.zeros_like(ic1)], axis=-1)
    return jnp.asarray(np.tile(ic[None], (n_columns, 1, 1)), dtype)


def run_tpu(records):
    import jax
    import jax.numpy as jnp

    from cloudy_tpu.models import rainshaft as rs

    spec, config, step = build_step(use_pallas=True)
    for b_log2 in (17, 19, 20):
        B = 1 << b_log2
        state = rs.to_soa(make_state(config, B, jnp.float32))
        rate = timed_column_rate(step, state, B)
        rec = {
            "kind": "real_tpu_single_chip",
            "hardware": "TPU v5e, 1 chip",
            "workload": "rainshaft ensemble step (nz=32, 2 gamma modes, "
                        "FULLY FUSED Pallas RHS — coal f2_exact/GL-12 + "
                        "sedi flux in one kernel, flat SoA layout — + "
                        "upwind stencil, SSPRK33), f32",
            "n_columns": B,
            "column_updates_per_s": rate,
            "level_updates_per_s": rate * config.nz,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)


def run_cpu2_point(core: int, cols: int = 512):
    """One single-device measurement PINNED to one physical core
    (os.sched_setaffinity) — the per-host unit of a multi-host deployment
    (one process, one device). Prints a JSON rate record."""
    os.sched_setaffinity(0, {core})
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    spec, config, step = build_step(use_pallas=False)
    state = make_state(config, cols, jnp.float32)
    rate = timed_column_rate(jax.jit(step), state, cols)
    print(json.dumps({"core": core, "columns_per_s": rate}), flush=True)


def run_cpu2(records):
    """Process-level weak scaling on the 2 physical cores: N independent
    single-device processes, each pinned to its own core — the exact
    structure of a multi-host pod deployment (one process per host/device,
    `jax.distributed`; the step has zero collectives, so per-process rates
    add). Why not an in-process 2-device mesh: XLA:CPU shares ONE intra-op
    thread pool across all host 'devices', so a single device already
    consumes both cores (measured 42k columns/s unpinned vs 22k pinned) —
    an in-process sweep measures thread-pool contention, not device
    scaling. The real multi-process path is separately correctness-tested
    by tests/test_distributed.py's 2-process jax.distributed cluster."""
    import subprocess

    cols = 512

    def launch(core):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        return subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--cpu2-point", str(core)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )

    def collect(p):
        out, err = p.communicate(timeout=1800)
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        return json.loads(line)["columns_per_s"]

    collect(launch(0))  # warm the persistent compile cache
    r1 = collect(launch(0))
    ps = [launch(0), launch(1)]
    r2 = sum(collect(p) for p in ps)
    for d, rate in ((1, r1), (2, r2)):
        rec = {
            "kind": "two_core_cpu_weak_scaling",
            "hardware": "host CPU, 2 physical cores; one single-device "
                        "process pinned per core (multi-host structure)",
            "devices": d,
            "columns": cols * d,
            "columns_per_s": rate,
            "efficiency": rate / (r1 * d),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--cpu2", action="store_true")
    ap.add_argument("--cpu2-point", type=int, default=-1, metavar="CORE",
                    help="internal: one single-device point pinned to CORE")
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    if args.cpu2_point >= 0:
        run_cpu2_point(args.cpu2_point)
        return

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
