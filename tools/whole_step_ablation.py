"""Whole-step-kernel family ablations on the real chip.

SCALING.json's single-kernel whole-SSPRK33-step record (the pod production
path) is measured for the two-gamma config only; this tool puts measured
numbers behind the same kernel's OTHER family paths — a lognormal
thresholded mode (in-kernel Φ partial moments + quadrature grid: the
config with the most extra transcendental work) and MovingThreshold
(per-column, per-RK-stage Newton percentile inversion) — at the full 1M
column x 32 level scale, and appends `whole_step_family_records` to
ROOFLINE.json (companion of `family_records`, which covers the RHS-only
kernel).
"""

import argparse
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

    ap = argparse.ArgumentParser()
    ap.add_argument("--columns", type=int, default=1 << 20)
    ap.add_argument("--nz", type=int, default=32)
    ap.add_argument("--case", default=None, help="run only this case name")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.json"),
    )
    args = ap.parse_args()

    E, nz = args.columns, args.nz
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    cases = [
        # (name, families, thresholds, moving, f2_exact, kernel kwargs) —
        # mirrors tools/roofline.py run_families for the RHS-only kernel
        ("2gamma-exact", (Family.GAMMA, Family.GAMMA),
         (5e-10, np.inf), False, True, {}),
        ("lognorm-gamma-grid", (Family.LOGNORMAL, Family.GAMMA),
         (5e-10, np.inf), False, False,
         dict(quad_rule="gauss", gauss_nodes=12)),
        # proven-bound lognormal fast path: density-recentered GL-16 window
        # (4.0e-4 worst case) + exact gamma F2
        ("lognorm-gamma-window", (Family.LOGNORMAL, Family.GAMMA),
         (5e-10, np.inf), False, True, dict(lognorm_gl_nodes=16)),
        # the 12-node point of the node/accuracy tradeoff (1.3e-2 bound vs
        # 4.0e-4 at 16 — see tests/test_coalescence.py). Measured equal to
        # GL-16: [12, TB] tiles pad the sublane dim to 16 — the SOL model
        # counts padded rows (round-5 calibration).
        ("lognorm-gamma-window12", (Family.LOGNORMAL, Family.GAMMA),
         (5e-10, np.inf), False, True, dict(lognorm_gl_nodes=12)),
        # in-situ model validation: padding-aligned node counts 8/24 give
        # the measured marginal cost per 8-node slab, compared against the
        # bundle model's prediction (docs/performance.md)
        ("lognorm-gamma-window8", (Family.LOGNORMAL, Family.GAMMA),
         (5e-10, np.inf), False, True, dict(lognorm_gl_nodes=8)),
        ("lognorm-gamma-window24", (Family.LOGNORMAL, Family.GAMMA),
         (5e-10, np.inf), False, True, dict(lognorm_gl_nodes=24)),
        ("moving-2gamma-exact", (Family.GAMMA, Family.GAMMA),
         (0.9, 1.0), True, True,
         dict(thr_newton_iters=8, thr_gammainc_iters=12)),
        # VERDICT r3 #7: complete the family matrix — exp-mixture and
        # monodisperse whole-step rows
        ("exp-gamma-exact", (Family.EXPONENTIAL, Family.GAMMA),
         (5e-10, np.inf), False, True, {}),
        ("mono-gamma-closed", (Family.MONODISPERSE, Family.GAMMA),
         (5e-10, np.inf), False, True, {}),
    ]

    if args.case is not None:
        cases = [c for c in cases if c[0] == args.case]

    records = []
    for name, fams, thr, moving, f2x, kw in cases:
        kw = dict(kw)
        data_kw = (
            {"lognorm_gl_nodes": kw.pop("lognorm_gl_nodes")}
            if "lognorm_gl_nodes" in kw
            else {}
        )
        spec = SpectrumSpec(fams)
        data = build_coalescence_data(
            spec, ker, thr, norms=norms, moving=moving,
            gammainc_iters=12, f2_exact=f2x, gammainc_gl_nodes=12, **data_kw,
        )
        config = rs.RainshaftConfig(
            spec=spec, nz=nz, zmax=3000.0, norms=norms, dt=1.0
        )
        step = pc.make_pallas_rainshaft_step_fn(
            data, config.vel, config.norms, nz=nz, dz=config.dz, dt=1.0,
            block_cols=4096, **kw,
        )

        # mode-1 top-hat pulse (first nprog moments of a physically
        # consistent triple), higher modes empty — families with 2
        # prognostic moments (exp/mono) take the first two
        ic1 = rs.initial_condition(config.z, [1e8, 1e-2, 2e-12])
        ic = np.concatenate(
            [ic1[:, : spec.nprogmoms[0]],
             np.zeros((ic1.shape[0], spec.n_tot - spec.nprogmoms[0]))],
            axis=-1,
        )
        state = rs.to_soa(jnp.asarray(
            np.tile(ic[None], (E, 1, 1))
            * np.linspace(0.5, 1.5, E)[:, None, None],
            jnp.float32,
        ))

        @partial(jax.jit, static_argnames=("n",))
        def chain(y, n, step=step):
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
            "name": name,
            "families": [f.name for f in fams],
            "moving": moving,
            "f2_exact": f2x,
            "n_columns": E,
            "nz": nz,
            "column_updates_per_s": E / sec,
            "level_updates_per_s": E * nz / sec,
        }
        # speed-of-light accounting (VERDICT r4 #1): per-hardware-class op
        # model of the whole-step kernel × MEASURED per-class costs
        # (tools/op_microbench.py) → the calibrated SOL column rate and
        # utilization. The legacy flat-8-slot fields are kept for
        # comparison against the round-4 rows.
        try:
            from roofline import (
                whole_step_op_classes, load_op_costs, sol_column_rate,
                VPU_OPS_PER_S, TRANSCENDENTAL_SLOTS,
            )

            classes_exp = whole_step_op_classes(
                data, n_vel=len(config.vel), nz=nz
            )
            alu = classes_exp["alu"]
            trans = sum(v for k, v in classes_exp.items() if k != "alu")
            lvl = rec["level_updates_per_s"]
            rec.update({
                "op_classes_per_level_step": {
                    k: round(v, 1) for k, v in classes_exp.items()
                },
                "ops_per_level_step": alu + trans,
                "trans_per_level_step": trans,
                "plain_ops_per_s": lvl * (alu + trans),
                "vpu_utilization_slotweighted_legacy": lvl
                * (alu + TRANSCENDENTAL_SLOTS * trans) / VPU_OPS_PER_S,
            })
            costs = load_op_costs(args.out)
            if costs is not None:
                # primary: bundle model (measured special-function units);
                # fallback to the expanded class model when the bundle
                # costs are absent or the config is off-production
                try:
                    classes_b = whole_step_op_classes(
                        data, n_vel=len(config.vel), nz=nz, use_bundles=True
                    )
                    assert all(
                        k in costs for k, v in classes_b.items() if v
                    )
                except (ValueError, AssertionError):
                    classes_b = None
                model = classes_b if classes_b is not None else classes_exp
                sol = sol_column_rate(model, costs, nz)
                rec.update({
                    "sol_model": "bundles" if classes_b is not None
                    else "expanded-classes",
                    "op_bundles_per_level_step": (
                        {k: round(v, 1) for k, v in classes_b.items() if v}
                        if classes_b is not None else None
                    ),
                    "sol_calibrated_column_updates_per_s": sol,
                    "calibrated_utilization": rec["column_updates_per_s"]
                    / sol,
                })
        except ValueError:
            pass  # lognormal grid ladder: no proven op model
        records.append(rec)
        print(json.dumps(rec), flush=True)

    doc = json.load(open(args.out))
    key = "whole_step_family_records"
    # merge by (name, nz, n_columns): replace matching records, keep the
    # rest (ADVICE r3 #3 — a default re-run must not drop e.g. the nz=128
    # depth-invariance record docs/performance.md cites)
    def _k(r):
        return (r["name"], r["nz"], r["n_columns"])

    new_keys = {_k(r) for r in records}
    kept = [r for r in doc.get(key, []) if _k(r) not in new_keys]
    doc[key] = kept + records
    json.dump(doc, open(args.out, "w"), indent=1)
    print(f"wrote whole_step_family_records to {args.out}", flush=True)


if __name__ == "__main__":
    main()
