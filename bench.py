"""Benchmark: coalescence moment-updates/s per chip.

Runs the flagship analytical-coalescence RHS (closure inversion + Simpson/
incomplete-gamma autoconversion integrals + fused Q/R/S bilinear form) over a
large batch of independent columns on one chip and reports throughput as
moment-updates/s (columns/s x prognostic moments per column).

`vs_baseline` contextualizes against the reference's single-CPU-core budget:
Cloudy.jl publishes no throughput numbers (BASELINE.md); its CI enforces
~27 us per `moment_source_helper` call (performance_tests.jl:83-89) and the
exp+gamma `get_coal_ints` performs 6 such integrals plus the Q/R/S sums
=> ~170 us/column => ~2.9e4 moment-updates/s on one CPU core. That figure is
the denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

REFERENCE_MOMENT_UPDATES_PER_S = 2.94e4  # see module docstring

# The exact fast-path configuration benched on-chip. Accuracy at THIS
# configuration is gated by tests/test_golden.py::
# test_pallas_gauss_trajectory_allclose[bench] (trajectory error vs the
# stored f64 reference-parity trajectory) AND, since round 3, by a PROVEN
# worst-case bound: the incomplete gamma is evaluated by the fixed
# Gauss-Legendre scheme (special.gammainc_gl, BENCH_GL_NODES nodes) whose
# max absolute error over the entire reachable (a, x) domain is pinned
# against scipy in tests/test_special.py (2.6e-7 at 12 nodes for
# a in [4, 26] — the fixed-iteration series/CF it replaces had 1.7e-2 at
# its x ~ a corner at the same cost).
#
# BENCH_F2_EXACT selects the exact autoconversion factorization
# F2(p,q) = M_p·M_q·P(2k+p+q, T/θ) (coalescence._msh_matrix_gamma_exact):
# one row-shaped incomplete gamma per column instead of a 12-point
# quadrature grid of them — zero quadrature error AND ~10x less
# transcendental work. BENCH_GAUSS_NODES only applies with
# BENCH_F2_EXACT=0 (the quadrature fallback).
BENCH_F2_EXACT = True
BENCH_GAUSS_NODES = 12
BENCH_GAMMAINC_ITERS = 12
BENCH_GL_NODES = 12


def main():
    import jax
    import jax.numpy as jnp
    # persistent compile cache: the axon-tunnel compiles cost minutes; cache
    # them across invocations (single-writer discipline — see CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from cloudy_tpu.spec import Family, SpectrumSpec
    from cloudy_tpu import kernels as K
    from cloudy_tpu import distributions as pdists
    from cloudy_tpu.coalescence import build_coalescence_data, get_coal_ints

    dtype = jnp.float32
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    f2_exact = bool(int(os.environ.get("BENCH_F2_EXACT", int(BENCH_F2_EXACT))))
    gl_nodes = int(os.environ.get("BENCH_GL_NODES", BENCH_GL_NODES))
    data = build_coalescence_data(
        spec, ker, (5e-10, np.inf), norms=norms, gammainc_iters=12,
        f2_exact=f2_exact, gammainc_gl_nodes=gl_nodes,
    )

    impl = os.environ.get("BENCH_IMPL", "pallas")
    B = int(os.environ.get("BENCH_COLUMNS", 1048576))
    rng = np.random.default_rng(0)
    mom_norms = np.concatenate([1e6 * 1e-9 ** np.arange(3)] * 2)
    base = np.array([1e8, 1e-2, 2e-12, 1.0, 1e-8, 2e-16]) / mom_norms
    # physically consistent per-column variation: joint amplitude and mass
    # scalings per mode (independent per-moment noise creates degenerate
    # states whose k-clip amplifies into f32 overflow)
    amp = np.repeat(rng.uniform(0.5, 2.0, (B, 2)), 3, axis=1)
    msc = np.repeat(rng.uniform(0.8, 1.25, (B, 2)), 3, axis=1) ** np.tile(
        np.arange(3.0), 2
    )
    mom = jnp.asarray(base[None, :] * amp * msc, dtype)

    from functools import partial

    if impl == "pallas":
        from cloudy_tpu.ops import pallas_coalescence as pc

        fn = pc.make_pallas_coal_fn(
            data,
            block_cols=int(os.environ.get("BENCH_BLOCK_COLS", 4096)),
            quad_rule="gauss",
            gauss_nodes=int(os.environ.get("BENCH_GAUSS_NODES", BENCH_GAUSS_NODES)),
            gammainc_iters=int(
                os.environ.get("BENCH_GAMMAINC_ITERS", BENCH_GAMMAINC_ITERS)
            ),
        )
        mom = mom.T  # structure-of-arrays layout [n_tot, B]

        def rhs_step(mm):
            return mm + 1e-9 * fn.soa(mm)

    elif impl == "pallas_numerical":
        # direct SCE quadrature with the Long kernel function (BASELINE
        # configs[2] hot path) — fused Pallas, kink-aware panels
        from cloudy_tpu.ops import pallas_numerical as pnum

        B = int(os.environ.get("BENCH_COLUMNS", 262144))
        mom = mom[:B].T
        kf = K.LongKernelFunction(5.236e-10, 9.44e9, 5.78).normalized(norms)
        fn = pnum.make_pallas_numerical_fn(spec, kf, block_cols=512)

        def rhs_step(mm):
            return mm + 1e-9 * fn.soa(mm)

    else:

        def rhs_step(mm):
            dm = get_coal_ints(data, pdists.params_from_moments(spec, mm))
            return mm + 1e-9 * dm

    @partial(jax.jit, static_argnames=("n",))
    def chain(m, n):
        # n sequential RHS evaluations with a data dependency between steps
        # (an Euler relaxation), so no iteration can be elided or overlapped;
        # returns a scalar so the host readback forces full completion.
        out = jax.lax.fori_loop(0, n, lambda _, mm: rhs_step(mm), m)
        return jnp.sum(out)

    # The axon-tunneled runtime's block_until_ready does not reliably wait;
    # a scalar readback does, at a fixed RPC cost. Subtract it by timing two
    # chain lengths (readback + compile-cache effects cancel). The chain
    # length is chosen adaptively so the *differential* device time is
    # ~0.5 s — far above the ~30 ms RPC jitter (at the exact-F2 rate a
    # fixed 20-step chain runs in ~3 ms and measures only noise).
    def timed(n, reps=5):
        float(chain(mom, n))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(mom, n))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    n1 = 3
    dt_pilot = max((timed(n1 + 10) - timed(n1)) / 10, 1e-9)
    n2 = n1 + int(np.clip(round(0.5 / dt_pilot), 20, 3000))
    dt = max((timed(n2) - timed(n1)) / (n2 - n1), 1e-12)

    updates_per_s = B * spec.n_tot / dt
    print(
        json.dumps(
            {
                "metric": "coalescence_moment_updates_per_s_per_chip",
                "value": float(updates_per_s),
                "unit": "moment-updates/s",
                "vs_baseline": float(updates_per_s / REFERENCE_MOMENT_UPDATES_PER_S),
            }
        )
    )


if __name__ == "__main__":
    main()
