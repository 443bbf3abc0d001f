"""Measure the fused coalescence kernel against its speed-of-light bound.

VERDICT r1 #2: "measure the roofline instead of asserting it". This tool
times the fused Pallas analytical-coalescence kernel on the real chip across
ablations (F2 method, gammainc iterations, block size, batch size), counts
the kernel's arithmetic work analytically from the same static data the
kernel is built from, and reports measured utilization against both the
VPU compute ceiling and the HBM bandwidth ceiling.

The kernel is pure element-wise VPU work (no matmuls: the Q/R/S contraction
is unrolled sparse FMAs on [1, TB] rows), so the relevant compute ceiling is
the VPU, not the MXU. Round 5 replaced the flat-8-slot transcendental
bracketing with MEASURED per-op and per-bundle costs
(tools/op_microbench.py -> ROOFLINE.json `op_costs`; load with
`load_op_costs`) and a per-hardware-class op model
(`whole_step_op_classes`, with `use_bundles=True` for the production
configuration). The legacy `_op_counts`/(alu, trans) view and the
TRANSCENDENTAL_SLOTS constant remain only for the historical RHS-kernel
ablation records.

Timing uses the chained-scalar-readback protocol from bench.py (the axon
runtime's block_until_ready does not wait; two chain lengths cancel the
fixed RPC + readback cost).

Usage:  python -u tools/roofline.py [--quick]   (runs on the default
        platform — the axon TPU in this sandbox; writes ROOFLINE.json)
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VPU_OPS_PER_S = 3.9e12  # v5e: ~940 MHz x (8, 128) vreg x 4 ALUs
HBM_BYTES_PER_S = 8.1e11  # v5e
TRANSCENDENTAL_SLOTS = 8.0  # exp/log/div occupancy estimate (bracketing)


def _op_counts(data, f2_exact, gauss_nodes, gammainc_iters):
    """Analytic per-column arithmetic-work model of the fused kernel,
    split into plain ALU ops and transcendental-class ops (exp/log/div/
    lgamma-chains). Mirrors the kernel structure in
    ops/pallas_coalescence.py; counts are per column (lane)."""
    from cloudy_tpu.spec import Family
    from cloudy_tpu.ops.pallas_coalescence import _wb_nonzeros, _wf_nonzeros

    spec, M = data.spec, data.M
    alu = 0.0
    trans = 0.0

    # closure inversion (_invert_rows): per 3-moment gamma mode ~8 alu + 2 div
    for fam in spec.families:
        if fam == Family.GAMMA:
            alu += 10
            trans += 3  # m2/m1, mean/denom, mean/k
        elif fam == Family.LOGNORMAL:
            alu += 12
            trans += 5  # logs, sqrt, exp
        else:
            alu += 5
            trans += 1

    # diagnostic moment recurrence: (M-1) fused mul-adds per mode
    for fam in spec.families:
        alu += 2 * (M - 1)
        if fam == Family.LOGNORMAL:
            trans += M - 1  # exp per order

    # lgamma (Lanczos): 9 divides + ~12 alu + 2 logs
    lanczos_trans, lanczos_alu = 11.0, 14.0

    # gammainc_impl at `iters`: series iters*(1 div + 2 alu) +
    # contfrac iters*(2 div + 6 alu) + 2 exp + 1 log(ap1) + lgamma + ~10 alu
    gi_trans = gammainc_iters * 3.0 + 3.0 + lanczos_trans
    gi_alu = gammainc_iters * 8.0 + 10.0 + lanczos_alu

    n_thresholded = sum(
        1
        for i in range(spec.n_modes - 1)
        if data.moving or np.isfinite(data.thresholds[i])
    )
    for _ in range(n_thresholded):
        if f2_exact:
            # one gammainc + 1 log + 1 exp + lgamma (delta0) at ROW shape,
            # deltas: (2M-3)*(1 div + 2 alu), downward adds 2M-2,
            # f2 products ~ 2 per (p<=q) pair
            trans += gi_trans + 2.0 + lanczos_trans + (2 * M - 3)
            alu += gi_alu + (2 * M - 3) * 2 + (2 * M - 2) + M * (M + 1)
        else:
            # per grid point: gammainc + 2 exp + 1 log + delta chain,
            # integrand rows: M muls, reductions: M*(M+1)/2 dot-terms
            g = gauss_nodes
            trans += g * (gi_trans + 3.0 + (M - 2))
            alu += g * (gi_alu + 2 * (M - 2) + M + M * (M + 1))
            trans += 2 * lanczos_trans + M  # prefactor chain (row shape)
            alu += 3 * M

    # Q/R/S sparse FMA contraction + F2 clamp/where
    alu += 2.0 * (len(_wb_nonzeros(data)) + len(_wf_nonzeros(data)))
    alu += 3.0 * n_thresholded * M * (M + 1) / 2

    return alu, trans


def _gl_gammainc_ops(n_nodes, with_gln):
    """(alu, trans) of one special.gammainc_gl evaluation: window setup
    (sqrt + ~10 alu), optional Lanczos lgamma (11 trans + 14 alu), per node
    1 log + 1 exp + ~6 alu, final select/clip ~8 alu."""
    trans = 2.0 * n_nodes + 1.0 + (0.0 if with_gln else 11.0)
    alu = 6.0 * n_nodes + 18.0 + (0.0 if with_gln else 14.0)
    return alu, trans


OP_CLASSES = ("alu", "sel", "div", "exp", "log", "sqrt")
#: whole special-function evaluations measured as units in-kernel
#: (tools/op_microbench.py BUNDLES) — the compiler-transform-sensitive
#: interiors the source-level class model cannot count faithfully
OP_BUNDLES = (
    "lgamma", "lgamma_stirling", "gammainc_gl12", "erf_approx",
    "gamma_ratio", "gammaincinv_gl12",
)


def _cadd(acc, times=1.0, **kw):
    for k, v in kw.items():
        acc[k] = acc.get(k, 0.0) + times * float(v)


def _lgamma_classes():
    """Lanczos lgamma (ops/special.py:88-109): 8-term c/(z-1+i) series +
    2 branch logs + the shift-branch log; 2 shift selects (both branches
    evaluated)."""
    return dict(div=8, log=3, sel=2, alu=15)


def _gammainc_gl_classes(G, with_gln=True):
    """special.gammainc_gl: window setup (1 sqrt, ~12 alu incl. the two
    endpoint ladders, 1 xu select), per node [1 log + 1 exp + ~8 alu],
    tail combine (above/x>0 selects + clip ≈ 4 sel, ~7 alu); optional
    Lanczos if the caller has no lnΓ(a)."""
    c = dict(exp=G, log=G, sqrt=1, sel=5, alu=8 * G + 18)
    if not with_gln:
        _cadd(c, **_lgamma_classes())
    return c


def _gamma_ratio_classes():
    """special.gamma_ratio: Stirling difference (2 log, 2 div) + product
    front factor (1 div — round-5 divide optimization) + 1 exp + ~24 alu."""
    return dict(div=3, log=2, exp=1, alu=24)


def _lgamma_stirling_classes():
    """special.lgamma_stirling (round 5): shift-4 product (1 log, ~8 alu)
    + Stirling at z = x+4 (1 log, 1 div, ~14 alu)."""
    return dict(div=1, log=2, alu=22)


def _erf_approx_classes():
    """special.erf_approx (A&S 7.1.26): 1 div (t), 1 exp, 5-term poly ~13
    alu + sign handling ~2 selects."""
    return dict(exp=1, div=1, sel=2, alu=13)


def _gammaincinv_gl_classes(G):
    """special.gammaincinv_gl_impl at n_iter=3 (ops/special.py:457-519).
    ndtri(p) and log(p) fold away (p is a compile-time percentile constant);
    WH start (1 div, 1 sqrt, 1 select), x_small (1 div, 1 exp), lgamma(a+1),
    gln4 (1 log), then 3 Halley iterations: log_x + d-exp + d-select +
    deriv/downward/step divides (7) + step/denom clips (~4 sel) + inlined
    shift-4 GL top."""
    c = dict(div=2, exp=1, log=1, sqrt=1, sel=1, alu=17)
    _cadd(c, **_lgamma_classes())
    per_iter = dict(div=7, exp=1, log=1, sel=5, alu=28)
    _cadd(per_iter, **_gammainc_gl_classes(G, with_gln=True))
    _cadd(c, times=3.0, **per_iter)
    return c


def whole_step_op_classes(
    data, n_vel: int = 1, nz: int = 32, use_bundles: bool = False
):
    """Analytic per-LEVEL arithmetic-work model of the single-kernel whole
    SSPRK33 step (ops/pallas_coalescence.make_pallas_rainshaft_step_fn) at
    the PRODUCTION fast tier (f2_exact for gamma/exp modes, GL-`gl_nodes`
    incomplete gamma with the gln dedup, gamma_ratio sedimentation base,
    Halley/GL MovingThreshold inversion, recentered-window lognormal) —
    VERDICT r4 #1: the op counts are split by HARDWARE CLASS (alu / sel /
    div / exp / log / sqrt) so the speed-of-light can be computed from
    MEASURED per-class costs (tools/op_microbench.py) instead of an
    assumed flat slot weight. Mirrors the kernel structure term by term;
    returns a dict of per-level per-step counts (3 RHS + RK). Supported:
    gamma/exp/mono any mix + window-rule lognormal; legacy lognormal grid
    modes raise ValueError (no proven op count for the grid ladder).

    ``use_bundles=True`` (requires the production 12-node configuration)
    counts whole special-function evaluations — lgamma, gammainc_gl12,
    erf_approx, gamma_ratio, gammaincinv_gl12 — as single BUNDLE units
    whose costs tools/op_microbench.py measures in-kernel, instead of
    expanding their interiors into scalar classes. The interiors are
    where compiler folding/CSE/pipelining defeat source-level counting
    (the expanded model put measured rows on both sides of 1.0
    utilization); measured bundles absorb those effects."""
    from cloudy_tpu.spec import Family
    from cloudy_tpu.ops.pallas_coalescence import _wb_nonzeros, _wf_nonzeros

    spec, M = data.spec, data.M
    gl = data.gammainc_gl_nodes
    if not (data.f2_exact and gl):
        raise ValueError("model covers the production fast tier only")
    if Family.LOGNORMAL in spec.families and not data.lognorm_gl_nodes:
        raise ValueError(
            "legacy lognormal grid ladder not modeled (use lognorm_gl_nodes)"
        )
    n_tot = spec.n_tot
    if use_bundles and gl != 12:
        raise ValueError(
            "bundle costs are measured at the production 12-node "
            "configuration; use use_bundles=False for other node counts"
        )
    c = {k: 0.0 for k in OP_CLASSES}

    # ---- per-RHS terms ----------------------------------------------------
    # clip negatives (max) + normalize-mul + eps-compare + mask-and per row
    _cadd(c, alu=4 * n_tot)
    # closure inversion (_invert_rows, ops/pallas_numerical.py:79-118)
    for fam in spec.families:
        if fam == Family.GAMMA:
            # m1/m0, m2/m1, mean/denom, mean/k; valid/denom/n/θ/k selects
            _cadd(c, div=4, sel=7, alu=7)
        elif fam == Family.LOGNORMAL:
            # mu (log, pow-1.5 = exp·log, pow-0.5 = sqrt, div), sig2 (log,
            # div), sigma (sqrt), n (exp, div); valid selects
            _cadd(c, exp=2, log=3, sqrt=2, div=3, sel=6, alu=10)
        else:  # exp / mono: m1s/m0s; valid selects
            _cadd(c, div=1, sel=4, alu=3)
    # diagnostic moment recurrence, (M-1) orders per mode
    for fam in spec.families:
        if fam == Family.GAMMA:
            _cadd(c, alu=3 * (M - 1))
        elif fam == Family.EXPONENTIAL:
            _cadd(c, alu=2 * (M - 1))
        elif fam == Family.MONODISPERSE:
            _cadd(c, alu=1 * (M - 1))
        else:  # lognormal: exp per order
            _cadd(c, exp=M - 1, alu=4 * (M - 1))

    def _thresholded(i):
        if i >= spec.n_modes - 1:
            return False
        return data.moving or bool(np.isfinite(data.thresholds[i]))

    # MovingThreshold per-column inversion
    if data.moving:
        for i in range(spec.n_modes - 1):
            fam = spec.families[i]
            if fam == Family.GAMMA:
                if use_bundles:
                    _cadd(c, gammaincinv_gl12=1)
                else:
                    _cadd(c, **_gammaincinv_gl_classes(gl))
                _cadd(c, alu=2)  # p1·inv + floor-max
            elif fam == Family.EXPONENTIAL:
                _cadd(c, alu=2)
            elif fam == Family.LOGNORMAL:
                _cadd(c, exp=1, alu=3)
            else:  # mono: thr = p1
                _cadd(c, alu=1)

    # F2 per thresholded mode
    for i in range(spec.n_modes):
        npairs = M * (M + 1) / 2
        if not _thresholded(i):
            # mm fallback pairs consumed by the contraction (f2_lookup):
            # mul + eps-compare + select per pair
            _cadd(c, sel=npairs, alu=2 * npairs)
            continue
        fam = spec.families[i]
        if fam == Family.MONODISPERSE:
            # closed form: θ<T/2 compare + per-pair select + mirror + clamp
            _cadd(c, sel=2 * npairs, alu=2 + 3 * npairs)
            continue
        if fam == Family.LOGNORMAL:
            # recentered GL window (_f2_lognormal_window). Two hardware
            # facts shape the counts (both established round 5):
            # - [G, TB] tiles pad the sublane dim to a multiple of 8, so
            #   grid-shaped work costs ceil(G/8)·8 rows (the measured
            #   GL-12 == GL-16 null result);
            # - divisions of a [G, TB] value by a broadcast [1, TB] row
            #   strength-reduce to one row reciprocal + grid multiplies,
            #   so the g0 and z divides are ROW divs, not grid divs.
            Gw = 8 * ((data.lognorm_gl_nodes + 7) // 8)
            # setup: logT + window arithmetic + (M+1) row reciprocals
            _cadd(c, log=1, div=M + 1, alu=10)
            # per node: x-exp, g0-exp, logrem-log, ~12 alu (incl. the
            # reciprocal-multiplies that replaced the divides)
            _cadd(c, exp=2 * Gw, log=Gw, alu=12 * Gw)
            # per (node, q): z (3 alu) + erf_approx + pm combine
            # (3 alu + 1 rem>0 select)
            eq = dict(sel=1, alu=7)
            if use_bundles:
                _cadd(eq, erf_approx=1)
            else:
                _cadd(eq, **_erf_approx_classes())
            _cadd(c, times=Gw * M, **eq)
            # per-q row prefactor exps
            _cadd(c, exp=M, alu=4 * M)
            # ypow updates + pair reductions + n² muls
            _cadd(c, alu=(M - 1) * Gw + npairs * (2 * Gw + 2))
            # clamp (min + eps-select) + mirror
            _cadd(c, sel=npairs, alu=2 * npairs)
            continue
        # gamma / exponential exact factorization (_f2_gamma_exact).
        # EXPONENTIAL modes have k ≡ 1: a0 is a compile-time constant, so
        # the Lanczos chain folds away and the delta-chain divides
        # strength-reduce to multiplies.
        a_const = fam == Family.EXPONENTIAL
        _cadd(c, div=1, log=1, alu=4)  # x = T/θ (clamped) + log_x
        if not a_const:
            # fast tier: the 1-divide Stirling-shift lgamma (round 5)
            if use_bundles:
                _cadd(c, lgamma_stirling=1)
            else:
                _cadd(c, **_lgamma_stirling_classes())
            _cadd(c, alu=2)
        _cadd(c, exp=1, sel=1, alu=4)  # delta0 + x>0 select
        # delta chain, 2M-3 terms + prod
        if a_const:
            _cadd(c, alu=4 * (2 * M - 3))
        else:
            _cadd(c, div=2 * M - 3, alu=3 * (2 * M - 3))
        _cadd(c, log=0 if a_const else 1, alu=1)  # gln for the GL top
        if use_bundles:
            _cadd(c, gammainc_gl12=1)
        else:
            gl_c = _gammainc_gl_classes(gl, with_gln=True)
            if a_const:
                gl_c = dict(gl_c)
                gl_c["sqrt"] = 0  # window setup folds (a constant)
                gl_c["alu"] = gl_c["alu"] - 8
            _cadd(c, **gl_c)
        # downward clips (add + clip≈1 sel + 1 alu) + pair products +
        # clamp (min + eps-select) + mirror
        _cadd(
            c,
            sel=(2 * M - 2) + npairs,
            alu=2 * (2 * M - 2) + M * (M + 1) + 2 * npairs,
        )

    # Q/R/S sparse contraction (each nonzero: 1 mul + 1 fma-add = 2 alu)
    _cadd(c, alu=2 * (len(_wb_nonzeros(data)) + len(_wf_nonzeros(data))))

    # sedimentation ladder (fast tier: gamma_ratio base)
    for i, fam in enumerate(spec.families):
        npm = spec.nprogmoms[i]
        if fam == Family.LOGNORMAL:
            # direct closed form per (vel term, ladder order)
            _cadd(c, times=n_vel * npm, exp=1, alu=5)
        else:
            _cadd(c, log=1, alu=1)  # logp1 (once per mode)
            if fam == Family.GAMMA:
                base = dict(exp=1, alu=3)
                if use_bundles:
                    _cadd(base, gamma_ratio=1)
                else:
                    _cadd(base, **_gamma_ratio_classes())
            else:  # exp / mono: exp(e·logp1) (+ static Γ(1+e) for exp fam)
                base = dict(exp=1, alu=3)
            _cadd(c, times=n_vel, **base)
            _cadd(c, times=n_vel * (npm - 1), alu=5)  # ladder + accumulate
        _cadd(c, alu=npm)  # negate

    # coal out rows (empty select + denorm) + flux denorm + upwind stencil
    # (roll + top select + divergence fma)
    _cadd(c, sel=2 * n_tot, alu=2 * n_tot + 1 * n_tot + 4 * n_tot)

    # ---- 3 RHS per step + RK combinations --------------------------------
    c = {k: 3.0 * v for k, v in c.items()}
    c["alu"] += 10.0 * n_tot  # u1 (2) + u2 (4) + out (4) per row
    return c


def load_op_costs(path=None):
    """Measured per-class costs (seconds per element-op) from
    tools/op_microbench.py's ``op_costs`` record in ROOFLINE.json. Returns
    {class: sec_per_elem_op} keyed by OP_CLASSES ('alu' uses the measured
    mul cost), or None when no measurement exists yet."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        doc = json.load(f)
    rec = doc.get("op_costs", {}).get("classes")
    if not rec:
        return None
    # the model's 'alu' bucket mixes muls and adds/subs/compares/min/max
    # (selects are counted separately — measured ~3x a mul on this chip)
    alu = (
        rec["mul"]["sec_per_elem_op"] + rec["add"]["sec_per_elem_op"]
    ) / 2.0
    out = {
        "alu": alu,
        "sel": rec["sel"]["sec_per_elem_op"],
        "div": rec["div"]["sec_per_elem_op"],
        "exp": rec["exp"]["sec_per_elem_op"],
        "log": rec["log"]["sec_per_elem_op"],
        "sqrt": rec["sqrt"]["sec_per_elem_op"],
    }
    for b in OP_BUNDLES:
        if b in rec:
            out[b] = rec[b]["sec_per_elem_op"]
    return out


def sol_column_rate(classes, costs, nz):
    """Calibrated speed-of-light column rate: 1 / (nz · Σ_class n_c · t_c)
    with measured per-class (and per-bundle) seconds-per-element costs."""
    t_level = sum(n * costs[k] for k, n in classes.items() if n)
    return 1.0 / (nz * t_level)


def whole_step_op_counts(data, n_vel: int = 1, nz: int = 32):
    """Back-compat wrapper of `whole_step_op_classes`: ``(alu, trans)``
    with every non-alu class folded into `trans` (the legacy flat-slot
    view; the calibrated path consumes the class dict directly)."""
    c = whole_step_op_classes(data, n_vel=n_vel, nz=nz)
    alu = c["alu"]
    trans = sum(v for k, v in c.items() if k != "alu")
    return alu, trans


def _family_moments(families, B, seed=7):
    """Physically consistent random moments for any family mix (draw
    parameters, map to moments — as the parity tests do)."""
    import jax.numpy as jnp

    from cloudy_tpu.spec import Family
    from cloudy_tpu import distributions as pd

    rng = np.random.default_rng(seed)
    cols = []
    for fam in families:
        if fam == Family.LOGNORMAL:
            cols.append(np.stack(
                [rng.uniform(10, 200, B), rng.uniform(-2.0, 0.5, B),
                 rng.uniform(0.3, 1.0, B)], -1))
        elif fam == Family.MONODISPERSE:
            cols.append(np.stack(
                [rng.uniform(10, 200, B), rng.uniform(0.05, 0.6, B),
                 np.zeros(B)], -1))
        else:
            cols.append(np.stack(
                [rng.uniform(10, 200, B), rng.uniform(0.05, 5.0, B),
                 rng.uniform(0.5, 5.0, B)], -1))
    params = np.stack(cols, axis=1)
    return np.asarray(pd.get_moments(None or _spec(families), jnp.asarray(params)))


def _spec(families):
    from cloudy_tpu.spec import SpectrumSpec

    return SpectrumSpec(families)


def run_families(records, timed_rate, B=1 << 19):
    """Measured throughput for every distribution family as a THRESHOLDED
    mode, plus MovingThreshold and a 3-mode spec (VERDICT r2 #6: put
    numbers behind the four-family Pallas claims). The arithmetic-work
    model only covers the fixed-threshold gamma paths, so these records
    report measured rates without utilization fields."""
    import jax.numpy as jnp

    from cloudy_tpu.spec import Family
    from cloudy_tpu import kernels as K
    from cloudy_tpu.coalescence import build_coalescence_data
    from cloudy_tpu.ops import pallas_coalescence as pc

    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    cases = [
        # (name, families, thresholds, moving, f2_exact, kernel kwargs)
        ("exp-gamma-exact", (Family.EXPONENTIAL, Family.GAMMA),
         (5e-10, np.inf), False, True, {}),
        ("lognorm-gamma-grid", (Family.LOGNORMAL, Family.GAMMA),
         (5e-10, np.inf), False, False,
         dict(quad_rule="gauss", gauss_nodes=12)),
        # proven-bound lognormal fast path (VERDICT r3 #6): recentered
        # GL-16 window (4.0e-4 worst case) + exact gamma F2
        ("lognorm-gamma-window", (Family.LOGNORMAL, Family.GAMMA),
         (5e-10, np.inf), False, True, dict(lognorm_gl_nodes=16)),
        ("mono-gamma-closed", (Family.MONODISPERSE, Family.GAMMA),
         (5e-10, np.inf), False, True, {}),
        ("moving-2gamma-exact", (Family.GAMMA, Family.GAMMA),
         (0.9, 1.0), True, True,
         dict(thr_newton_iters=8, thr_gammainc_iters=12)),
        ("3mode-exp-logn-gamma", (Family.EXPONENTIAL, Family.LOGNORMAL,
                                  Family.GAMMA),
         (2e-10, 5e-10, np.inf), False, True,
         dict(quad_rule="gauss", gauss_nodes=12)),
    ]
    for name, fams, thr, moving, f2x, kw in cases:
        kw = dict(kw)
        data_kw = (
            {"lognorm_gl_nodes": kw.pop("lognorm_gl_nodes")}
            if "lognorm_gl_nodes" in kw
            else {}
        )
        spec = _spec(fams)
        data = build_coalescence_data(
            spec, ker, thr, norms=norms, moving=moving,
            gammainc_iters=12, f2_exact=f2x, gammainc_gl_nodes=12, **data_kw,
        )
        fn = pc.make_pallas_coal_fn(data, block_cols=4096, **kw)
        mom = jnp.asarray(_family_moments(fams, B).T, jnp.float32)
        cols_per_s = timed_rate(fn.soa, mom)
        rec = {
            "name": name,
            "families": [f.name for f in fams],
            "moving": moving,
            "f2_exact": f2x,
            "columns": B,
            "columns_per_s": cols_per_s,
            "moment_updates_per_s": cols_per_s * spec.n_tot,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer ablations")
    ap.add_argument("--families", action="store_true",
                    help="only the family/moving ablations; append to --out")
    ap.add_argument("--out", default="ROOFLINE.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    # persistent compile cache: the axon-tunnel compiles cost minutes; cache
    # them across invocations (single-writer discipline — see CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from cloudy_tpu.spec import Family, SpectrumSpec
    from cloudy_tpu import kernels as K
    from cloudy_tpu.coalescence import build_coalescence_data
    from cloudy_tpu.ops import pallas_coalescence as pc

    dtype = jnp.float32
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    norms = (1e6, 1e-9)
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)

    rng = np.random.default_rng(0)
    B_max = 1 << 20
    mom_norms = np.concatenate([1e6 * 1e-9 ** np.arange(3)] * 2)
    base = np.array([1e8, 1e-2, 2e-12, 1.0, 1e-8, 2e-16]) / mom_norms
    amp = np.repeat(rng.uniform(0.5, 2.0, (B_max, 2)), 3, axis=1)
    msc = np.repeat(rng.uniform(0.8, 1.25, (B_max, 2)), 3, axis=1) ** np.tile(
        np.arange(3.0), 2
    )
    mom_all = jnp.asarray((base[None, :] * amp * msc).T, dtype)  # [n_tot, B]

    def timed_rate(fn_soa, mom, reps=5, n1=3):
        @partial(jax.jit, static_argnames=("n",))
        def chain(m, n):
            out = jax.lax.fori_loop(
                0, n, lambda _, mm: mm + 1e-9 * fn_soa(mm), m
            )
            return jnp.sum(out)

        def t(n):
            float(chain(mom, n))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(mom, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        # adaptive chain length: differential device time ~0.5 s, far above
        # the ~30 ms tunnel RPC jitter (see bench.py)
        dt_pilot = max((t(n1 + 10) - t(n1)) / 10, 1e-9)
        n2 = n1 + int(np.clip(round(0.5 / dt_pilot), 20, 3000))
        dt = max((t(n2) - t(n1)) / (n2 - n1), 1e-12)
        return mom.shape[1] / dt  # columns/s

    records = []

    if args.families:
        run_families(records, timed_rate)
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["family_records"] = records
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"appended family_records to {args.out}", flush=True)
        return

    def run(name, f2_exact, iters, block_cols, B, gauss_nodes=12):
        data = build_coalescence_data(
            spec, ker, (5e-10, np.inf), norms=norms,
            gammainc_iters=iters, f2_exact=f2_exact,
        )
        fn = pc.make_pallas_coal_fn(
            data, block_cols=block_cols, quad_rule="gauss",
            gauss_nodes=gauss_nodes, gammainc_iters=iters,
        )
        cols_per_s = timed_rate(fn.soa, mom_all[:, :B])
        alu, trans = _op_counts(data, f2_exact, gauss_nodes, iters)
        ops = cols_per_s * (alu + trans)
        slots = cols_per_s * (alu + TRANSCENDENTAL_SLOTS * trans)
        bytes_per_s = cols_per_s * 2 * spec.n_tot * 4
        rec = {
            "name": name,
            "f2_exact": f2_exact,
            "gammainc_iters": iters,
            "gauss_nodes": None if f2_exact else gauss_nodes,
            "block_cols": block_cols,
            "columns": B,
            "columns_per_s": cols_per_s,
            "moment_updates_per_s": cols_per_s * spec.n_tot,
            "ops_per_column": alu + trans,
            "trans_per_column": trans,
            "plain_ops_per_s": ops,
            "slot_weighted_ops_per_s": slots,
            "vpu_utilization_plain": ops / VPU_OPS_PER_S,
            "vpu_utilization_slotweighted": slots / VPU_OPS_PER_S,
            "hbm_utilization": bytes_per_s / HBM_BYTES_PER_S,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # headline config (bench.py defaults)
    run("bench-exact", True, 12, 4096, B_max)
    if not args.quick:
        # F2 ablation: the old grid-quadrature fast path
        run("gauss12-grid", False, 12, 4096, B_max)
        # gammainc-iteration sensitivity at the exact config
        for it in (4, 24):
            run(f"exact-iters{it}", True, it, 4096, B_max)
        # block-size sweep
        for bc in (1024, 8192, 16384):
            run(f"exact-bc{bc}", True, 12, bc, B_max)
        # batch scaling (per-device saturation; VERDICT r1 #5)
        for b in (1 << 16, 1 << 18):
            run(f"exact-B{b}", True, 12, 4096, b)

    # MERGE into the existing document: ROOFLINE.json also carries
    # op_costs, whole_step_family_records, calibration_record etc. — a
    # fresh write here once destroyed them (recovered from git, round 5)
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    doc.update({
        "metric": "coalescence fused-kernel roofline (v5e, f32)",
        "vpu_ops_per_s": VPU_OPS_PER_S,
        "hbm_bytes_per_s": HBM_BYTES_PER_S,
        "transcendental_slots": TRANSCENDENTAL_SLOTS,
        "records": records,
    })
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
