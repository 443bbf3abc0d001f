"""Measure per-op-class VPU costs on the real chip (VERDICT r4 #1).

The whole-step speed-of-light model used a single assumed constant —
``transcendental_slots = 8.0`` for every exp/log/div/sqrt — and produced
family rows on BOTH sides of 1.0 utilization, which certifies nothing. This
tool replaces the assumption with measurement.

Method. Each *chain kernel* applies K serial links of a small op bundle to
ILP independent [64, 1024] f32 blocks resident in VMEM; the link-to-link
dependency prevents CSE/DCE while the 64 vregs/block × ILP independent
streams expose enough instruction-level parallelism to fill the VPU's issue
ports (a single serial stream measured ~1.7e12 mul/s; the production kernel
sustains >2.2e12 plain ops/s — chains must offer at least the kernel's ILP
or the derived "speed of light" is an underestimate the kernel itself
disproves). Two chain lengths (K = 32, 160) are timed and differenced to
cancel launch + load/store overhead; timing uses the chained-scalar-readback
protocol (axon's block_until_ready does not wait — CLAUDE.md gotcha 2).

Per-op costs are NOT additive on a multi-port machine (an exp+sub link
measures *cheaper* than a sub link alone — the scalar ops co-issue with the
transcendental), so instead of subtracting companions we solve a nonnegative
least-squares system: each chain contributes one equation
``Σ_class n_class(chain) · t_class = sec_per_link(chain)`` and the mixed
chains make the system overdetermined. The residual is reported — it is the
additivity error of the whole model and bounds how literally the per-class
costs can be read.

Outputs (merged into ROOFLINE.json under ``op_costs``): per class,
``sec_per_elem_op`` (the unit tools/roofline.py `sol_column_rate` consumes)
and ``slots_vs_mul``.

Usage: python -u tools/op_microbench.py [--out ROOFLINE.json] [--ilp 8]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

R, C = 64, 1024  # 64 vregs per stream per link
K1, K2 = 32, 160
# composite bundles carry hundreds of interior ops per link — shorter
# chains keep the fully-unrolled Mosaic programs compilable in seconds
K1_BUNDLE, K2_BUNDLE = 4, 20

# chain name -> (per-link op-class counts, link function)
# classes: mul, add (incl. sub/neg/min/max/cmp-ish scalars), div, exp, log,
# sqrt, sel (select_n)
CHAINS = {
    "mul": ({"mul": 1}, lambda jnp, x: x * 1.0000001),
    "add": ({"add": 1}, lambda jnp, x: x + 1e-6),
    "muladd": ({"mul": 1, "add": 1}, lambda jnp, x: x * 0.999999 + 1e-4),
    "div": ({"div": 1, "add": 2}, lambda jnp, x: (x + 2.0) / (x + 3.0)),
    "exp": ({"exp": 1, "add": 1}, lambda jnp, x: jnp.exp(0.3 - x)),
    "log": ({"log": 1, "add": 1}, lambda jnp, x: jnp.log(x + 1.5)),
    "sqrt": ({"sqrt": 1, "add": 1}, lambda jnp, x: jnp.sqrt(x + 0.5)),
    "sel": (
        {"sel": 1, "mul": 1, "add": 2},
        lambda jnp, x: jnp.where(x > 0.6, x * 0.699999, x + 0.25),
    ),
    # mixed validation chains (overdetermine the LS system)
    "expdiv": (
        {"exp": 1, "div": 1, "add": 2},
        lambda jnp, x: jnp.exp(-x) / (x + 1.5) + 0.4,
    ),
    "explog": (
        {"exp": 1, "log": 1, "add": 2},
        lambda jnp, x: jnp.log(jnp.exp(0.3 - x) + 0.9),
    ),
    "poly": (
        {"mul": 3, "add": 3},
        lambda jnp, x: ((0.01 * x + 0.2) * x + 0.1) * x + 0.3,
    ),
    "expmul4": (
        {"exp": 1, "mul": 4, "add": 1},
        lambda jnp, x: jnp.exp(0.3 - x) * (0.9999 * 1.0001)
        * ((1.0 + 1e-7) * x + 1e-6) * 0.5,
    ),
}


def _special():
    from cloudy_tpu.ops import special

    return special


# Composite BUNDLE chains: whole special-function evaluations measured
# in-kernel (their interior op mix is what the source-level class model gets
# wrong — compiler folding/CSE/pipelining live here). The SOL model uses
# measured bundle costs directly; the class columns in each row are only
# the chain's own glue ops. lgamma(4.5) = 2.4537365708424423 (gln constant
# for the GL chain — matches the production gln-dedup call shape).
_GLN_45 = 2.4537365708424423
BUNDLES = {
    "lgamma": (
        {"lgamma": 1, "add": 1},
        lambda jnp, x: _special().lgamma(x + 2.2),
    ),
    # round-5 divide optimization: the fast tier's 1-divide Stirling-shift
    # lgamma (the production exact-F2 lga01 site)
    "lgamma_stirling": (
        {"lgamma_stirling": 1, "add": 1},
        lambda jnp, x: _special().lgamma_stirling(x + 2.2),
    ),
    "gammainc_gl12": (
        {"gammainc_gl12": 1, "mul": 1, "add": 1},
        lambda jnp, x: _special().gammainc_gl(
            4.5, 0.5 + 3.0 * x, n_nodes=12, gln=_GLN_45
        ),
    ),
    "erf_approx": (
        {"erf_approx": 1, "mul": 1, "add": 2},
        lambda jnp, x: 0.1 + 0.7 * jnp.abs(_special().erf_approx(x)),
    ),
    "gamma_ratio": (
        {"gamma_ratio": 1, "mul": 1, "add": 2},
        lambda jnp, x: 0.2 + 0.5 * _special().gamma_ratio(x + 0.5, 1.0 / 6.0),
    ),
    "gammaincinv_gl12": (
        {"gammaincinv_gl12": 1, "mul": 1},
        lambda jnp, x: 0.1
        * _special().gammaincinv_gl_impl(2.5, x, n_iter=3, n_nodes=12),
    ),
}
CHAINS.update(BUNDLES)

CLASSES = (
    "mul", "add", "div", "exp", "log", "sqrt", "sel",
    "lgamma", "lgamma_stirling", "gammainc_gl12", "erf_approx",
    "gamma_ratio", "gammaincinv_gl12",
)


def _kernel(name: str, k: int, ilp: int):
    import jax.numpy as jnp

    _, link = CHAINS[name]

    def kernel(*refs):
        ins, outs = refs[:ilp], refs[ilp:]
        xs = [r[...] for r in ins]
        for _ in range(k):
            xs = [link(jnp, x) for x in xs]
        for o, x in zip(outs, xs):
            o[...] = x

    return kernel


def measure(name: str, timed, ilp: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.uniform(0.3, 0.9, (R, C)), jnp.float32)
        for _ in range(ilp)
    ]

    def run_k(k):
        call = pl.pallas_call(
            _kernel(name, k, ilp),
            out_shape=[jax.ShapeDtypeStruct((R, C), jnp.float32)] * ilp,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * ilp,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * ilp,
        )
        return timed(call, xs)

    if name == "gammaincinv_gl12":
        # ~600 interior ops per link: K2=20 × ILP8 produced a ~100k-op
        # Mosaic program whose tunnel compile exceeded an hour; 2/6 links
        # keep it minutes while the 4-link difference still cancels the
        # load/store overhead
        k1, k2 = 2, 6
    elif name in BUNDLES:
        k1, k2 = K1_BUNDLE, K2_BUNDLE
    else:
        k1, k2 = K1, K2
    t1, t2 = run_k(k1), run_k(k2)
    per_link = max((t2 - t1) / (k2 - k1), 1e-15)
    return per_link / (R * C * ilp)  # seconds per element per link


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.json"),
    )
    ap.add_argument("--ilp", type=int, default=8)
    ap.add_argument(
        "--refit", action="store_true",
        help="re-solve the LS system from the stored chain measurements",
    )
    ap.add_argument(
        "--all", action="store_true",
        help="re-measure every chain (default: only chains missing from "
        "the stored record)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    def timed(call, xs, reps=5, n1=3):
        @partial(jax.jit, static_argnames=("n",))
        def chain(xs, n):
            out = jax.lax.fori_loop(
                0, n, lambda _, t: tuple(call(*t)), tuple(xs)
            )
            return jnp.sum(out[0])

        def t(n):
            float(chain(xs, n))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(xs, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        dt_pilot = max((t(n1 + 10) - t(n1)) / 10, 1e-9)
        n2 = n1 + int(np.clip(round(0.3 / dt_pilot), 20, 20000))
        return max((t(n2) - t(n1)) / (n2 - n1), 1e-12)

    links = {}
    if (args.refit or not args.all) and os.path.exists(args.out):
        with open(args.out) as f:
            links.update(
                json.load(f).get("op_costs", {}).get(
                    "chain_sec_per_elem_link", {}
                )
            )
    if not args.refit:
        for name in CHAINS:
            if name in links and not args.all:
                continue  # keep the stored measurement (use --all to redo)
            links[name] = measure(name, timed, args.ilp)
            print(
                json.dumps({"chain": name, "sec_per_elem_link": links[name]}),
                flush=True,
            )
    links = {n: v for n, v in links.items() if n in CHAINS}

    # Nonnegative least squares over the chain system, with an explicit
    # per-link MEMORY column: with 512 live vregs across the ILP streams
    # the chain value spills to VMEM between links, so every link pays one
    # load+store regardless of its op count — without this column the
    # 1-op chains read ~2x slower per op than the 6-op chains (measured
    # residuals up to 44%) and the fit is dominated by whichever mix the
    # chain set happens to contain. The op costs below are therefore
    # MARGINAL costs (the right quantity for the fused production kernel,
    # whose ops-per-VMEM-round-trip is far higher than any chain's).
    from scipy.optimize import nnls

    names = list(CHAINS)
    A = np.array(
        [[CHAINS[n][0].get(c, 0) for c in CLASSES] + [1.0] for n in names],
        float,
    )
    b = np.array([links[n] for n in names])
    # weight equations equally in RELATIVE terms (cheap chains matter too)
    w = 1.0 / b
    t_fit, _ = nnls(A * w[:, None], b * w)
    pred = A @ t_fit
    resid_rel = np.abs(pred / b - 1.0)

    costs = dict(zip(CLASSES, t_fit[:-1]))
    mem_per_link = float(t_fit[-1])
    mul = max(costs["mul"], 1e-15)
    classes_out = {
        c: {
            "sec_per_elem_op": float(costs[c]),
            "slots_vs_mul": float(costs[c] / mul),
            "elem_ops_per_s": float(1.0 / costs[c]) if costs[c] > 0 else None,
        }
        for c in CLASSES
    }
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    doc["op_costs"] = {
        "note": (
            "measured per-op VPU costs (ILP-parallel two-chain-length Pallas "
            "microbenchmarks, f32, VMEM-resident; per-class costs from a "
            "nonnegative least-squares fit over the chain system — additivity "
            "residual below bounds how literally they can be read)"
        ),
        "block_shape": [R, C],
        "ilp": args.ilp,
        "chain_lengths": [K1, K2],
        "mem_sec_per_elem_link": mem_per_link,
        "chain_sec_per_elem_link": links,
        "ls_residual_rel_max": float(resid_rel.max()),
        "ls_residual_rel": {
            n: float(r) for n, r in zip(names, resid_rel)
        },
        "classes": classes_out,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    for cname, cc in classes_out.items():
        print(
            f"{cname}: {cc['sec_per_elem_op']:.3e} s/elem-op, "
            f"{cc['slots_vs_mul']:.2f} slots (mul=1)",
            flush=True,
        )
    print(f"LS residual (rel, max): {resid_rel.max():.3f}", flush=True)
    print(f"wrote op_costs to {args.out}", flush=True)


if __name__ == "__main__":
    main()
