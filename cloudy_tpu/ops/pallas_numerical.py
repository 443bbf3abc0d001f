"""Fused Pallas TPU kernel for the *numerical-quadrature* coalescence path.

BUILD-NEW component: the TPU-native form of the reference's
NumericalCoalStyle (src/Sources/Coalescence.jl:470-708 — doubly-nested
adaptive quadgk with an arbitrary kernel *function*). The XLA einsum path
(coalescence_numerical.py) is quadrature-identical but materializes the
``[B, G_outer, G_inner]`` density/kernel intermediates in HBM (~100 KB per
column at default node counts); this kernel fuses

    closure inversion → per-column support bounds → log-grid Gauss-Legendre
    outer nodes → densities → R inner integral → triangular Q/S inner
    integrals → gated moment assembly

in VMEM, reading ``n_tot`` floats per column and writing ``n_tot``. Unlike
the analytical Pallas kernel (pallas_coalescence.py), this path needs only
*density evaluations* — no incomplete gamma — so it supports all four
families (gamma, exponential, lognormal, monodisperse) and any kernel
function (Constant/Linear/Golovin, Hydrodynamic, Long piecewise).

Layout: columns on lanes; the outer quadrature nodes ride the sublane
dimension ([G_outer, TB] tiles), and the inner triangular integral unrolls
over static Gauss nodes s ∈ (0, 1) with y = s·x.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cloudy_tpu.spec import Family
from cloudy_tpu.distributions import GAMMA_K_RANGE
from cloudy_tpu.ops import special
from cloudy_tpu.ops.gauss import gauss_legendre

_SQRT2PI = float(np.sqrt(2.0 * np.pi))


@contextlib.contextmanager
def _cache_bypass(interpret: bool):
    """Keep interpret-mode pallas_call executions OUT of the persistent
    compilation cache.

    Interpret-mode pallas lowers to an XLA program that embeds the Python
    emulation; this sandbox's jax (0.9.0) will happily persist such an
    executable when its compile exceeds the write threshold, and loading it
    back CRASHES the process (observed: SIGSEGV in the zstandard write path
    and SIGABRT in `get_executable_and_time` on read). Compiled (Mosaic)
    kernels keep full cache participation.

    Mechanism: raise `persistent_cache_min_compile_time_secs` beyond any
    real compile for the duration — the threshold is read dynamically at
    write time (jax/_src/compiler.py: `config.persistent_cache_min_compile_
    time_secs.value`), so nothing persists and cache reads (which can only
    miss for never-written interpret keys) are untouched. The earlier
    implementation paired `enable_compilation_cache(False)` with
    `compilation_cache.reset_cache()` on both edges — tearing down the live
    cache handle dozens of times per test session, after which a later
    cache READ in the same process segfaulted (three full-suite runs died
    in `get_executable_and_time` right after the pallas-heavy files; the
    crash-site tests pass in isolation). No reset, no crash.
    """
    if not interpret:
        yield
        return
    try:
        from jax._src import config as _jconf
    except Exception:  # pragma: no cover - future-jax fallback
        yield
        return
    with _jconf.persistent_cache_min_compile_time_secs(1e18):
        yield


def _invert_rows(fam: Family, rows, eps, gamma_k_range=GAMMA_K_RANGE):
    """Closure inversion on [1, TB] row tiles (mirrors
    distributions._invert_* / reference ParticleDistributions.jl:456-541).
    `gamma_k_range` clips the gamma shape parameter; None bounds resolve to
    (eps, +inf) as in distributions._invert_gamma."""
    m0, m1 = rows[0], rows[1]
    valid = (m0 > eps) & (m1 > eps)
    m0s = jnp.where(valid, m0, 1.0)
    m1s = jnp.where(valid, m1, 1.0)
    if fam in (Family.EXPONENTIAL, Family.MONODISPERSE):
        n = jnp.where(valid, m0, 0.0)
        p1 = jnp.where(valid, m1s / m0s, 1.0)
        return n, p1, jnp.zeros_like(p1)
    m2 = rows[2]
    if fam == Family.GAMMA:
        k_lo = eps if gamma_k_range[0] is None else gamma_k_range[0]
        k_hi = np.inf if gamma_k_range[1] is None else gamma_k_range[1]
        m2s = jnp.where(valid, m2, 2.0)
        mean = m1s / m0s
        denom = m2s / m1s - mean
        denom = jnp.where(jnp.abs(denom) > 0, denom, eps)
        k = jnp.clip(mean / denom, k_lo, k_hi)
        theta = mean / k
        n = jnp.where(valid, m0, 0.0)
        return n, jnp.where(valid, theta, 1.0), jnp.where(valid, k, 1.0)
    if fam == Family.LOGNORMAL:
        valid = valid & (m2 > eps)
        m0s = jnp.where(valid, m0, 1.0)
        m1s = jnp.where(valid, m1, 1.0)
        m2s = jnp.where(valid, m2, 2.0)
        mu = jnp.log(m1s**2 / (m0s**1.5 * m2s**0.5))
        sig2 = jnp.log(jnp.maximum(m0s * m2s / m1s**2, 1.0))
        sigma = jnp.maximum(jnp.sqrt(sig2), eps)
        n = m1s / special.exp(mu + 0.5 * sigma**2)
        return (
            jnp.where(valid, n, 0.0),
            jnp.where(valid, mu, 1.0),
            jnp.where(valid, sigma, 1.0),
        )
    raise NotImplementedError(fam)


def _bounds_rows(fam: Family, n, p1, p2, dtype):
    """Per-mode support bounds on row tiles (mirrors
    coalescence_numerical.support_bounds)."""
    if fam == Family.EXPONENTIAL:
        lo, hi = p1 * 1e-8, p1 * 40.0
    elif fam == Family.GAMMA:
        lo = p1 * jnp.exp(
            jnp.log(jnp.asarray(1e-12, dtype)) / jnp.maximum(p2, 0.05)
        )
        lo = jnp.maximum(lo, p1 * 1e-12)
        hi = p1 * (p2 + 30.0 * jnp.sqrt(p2) + 40.0)
    elif fam == Family.LOGNORMAL:
        lo, hi = jnp.exp(p1 - 8.0 * p2), jnp.exp(p1 + 8.0 * p2)
    elif fam == Family.MONODISPERSE:
        lo, hi = p1 * 0.5, p1 * 2.5
    else:
        raise NotImplementedError(fam)
    active = n > 0.0
    return jnp.where(active, lo, jnp.inf), jnp.where(active, hi, 0.0)


def _density_rows(fam: Family, n, p1, p2, x, logx, normed: bool):
    """Mass density at node tile x (log x precomputed once per tile;
    mirrors distributions._density_one_mode)."""
    amp = jnp.ones_like(n) if normed else n
    if fam == Family.EXPONENTIAL:
        return amp / p1 * jnp.exp(-x / p1)
    if fam == Family.GAMMA:
        logf = (
            (p2 - 1.0) * logx - p2 * jnp.log(p1) - special.lgamma(p2) - x / p1
        )
        return amp * special.exp(logf)
    if fam == Family.LOGNORMAL:
        return (
            amp
            * special.exp(-((logx - p1) ** 2) / (2.0 * p2**2))
            / (jnp.maximum(x, jnp.finfo(x.dtype).tiny) * p2 * _SQRT2PI)
        )
    if fam == Family.MONODISPERSE:
        return jnp.where(
            jnp.abs(x - p1) < p1 / 10.0, amp / (2.0 * p1 / 10.0), 0.0
        )
    raise NotImplementedError(fam)


def make_pallas_numerical_fn(
    spec,
    kernel_func,
    n_outer: int = 96,
    n_inner: int = 48,
    block_cols: int = 512,
    interpret: bool = False,
    gamma_k_range=GAMMA_K_RANGE,
):
    """Build ``fn(mom_norm [B, n_tot]) -> [B, n_tot]`` of coalescence
    tendencies by direct quadrature of the SCE with `kernel_func` (an
    already-*normalized* kernel function, cf. box.make_box_rhs).

    ``n_outer``/``n_inner`` are total node budgets, divided EVENLY among the
    kink-aware panels: with a kinked kernel (Long), the outer budget splits
    into 3 panels (32 effective nodes each at the default 96) and the inner
    into 3 (16 each at 48), regardless of where a column's support lies — a
    column entirely below/above the kink clips two panels to zero width, so
    its effective resolution is ~1/3 of the budget. The (96, 48) defaults are
    converged to ~1e-5 relative on the BASELINE Long-kernel scenario with
    mass-conservation error ~1e-10 *including* that reduction (the panelized
    rule still gains >1000x accuracy over an unpanelized rule of the same
    budget); raise the budgets for near-singular gamma modes (k ≪ 1). The
    parity test uses identical counts on both paths. ``fn.soa`` takes/returns
    the transposed ``[n_tot, B]`` structure-of-arrays layout.
    """
    N = spec.n_modes
    n_tot = spec.n_tot
    n_mom = max(spec.nprogmoms)
    families = spec.families

    # kernel kinks -> panelized quadrature (see coalescence_numerical.py);
    # node budgets are divided among the panels. The Pallas path supports at
    # most one kink (the Long kernel) — min/max replaces a sort.
    kinks = tuple(float(t) for t in getattr(kernel_func, "x_kinks", ()))
    if len(kinks) > 1:
        raise NotImplementedError("pallas numerical path supports <=1 kink")
    outer_cuts = sorted({c for t in kinks for c in (t, 2.0 * t)})
    n_po = len(outer_cuts) + 1
    g_outer = max(n_outer // n_po, 8) if kinks else n_outer
    n_pi = 2 * len(kinks) + 1
    g_inner = max(n_inner // n_pi, 8) if kinks else n_inner

    xu_np, wu_np = gauss_legendre(g_outer)
    glx = np.stack([np.asarray(xu_np), np.asarray(wu_np)])  # [2, g_outer]
    su_np, ws_np = gauss_legendre(g_inner)
    s_nodes = [float(0.5 * (s + 1.0)) for s in np.asarray(su_np)]
    s_weights = [float(0.5 * w) for w in np.asarray(ws_np)]
    G_total = n_po * g_outer

    def kernel(mom_ref, glx_ref, out_ref):
        dtype = mom_ref.dtype
        eps = jnp.finfo(dtype).eps
        tiny = jnp.finfo(dtype).tiny
        TB = mom_ref.shape[1]

        # ---- closure inversion per mode ----------------------------------
        params = []
        for i, fam in enumerate(families):
            o = spec.offsets[i]
            rows = [
                mom_ref[o + j, :].reshape(1, TB)
                for j in range(spec.nprogmoms[i])
            ]
            params.append(_invert_rows(fam, rows, eps, gamma_k_range))

        # ---- per-column support bounds -----------------------------------
        x_lo = jnp.full((1, TB), jnp.inf, dtype)
        x_hi = jnp.zeros((1, TB), dtype)
        for fam, (n, p1, p2) in zip(families, params):
            lo, hi = _bounds_rows(fam, n, p1, p2, dtype)
            x_lo = jnp.minimum(x_lo, lo)
            x_hi = jnp.maximum(x_hi, hi)
        x_lo = jnp.minimum(x_lo, 1e30)
        x_hi = jnp.maximum(x_hi, 1e-30)
        x_lo = jnp.maximum(jnp.minimum(x_lo, x_hi * 1e-12), tiny)
        x_hi = jnp.maximum(2.0 * x_hi, 4.0 * tiny)

        # ---- outer log grid: x = exp(u) with GL nodes in u, one panel per
        # smooth kernel piece (empty panels collapse to zero weight) --------
        lo_l, hi_l = jnp.log(x_lo), jnp.log(x_hi)
        xu = glx_ref[0, :].reshape(g_outer, 1)
        wu = glx_ref[1, :].reshape(g_outer, 1)
        edges = (
            [lo_l]
            + [
                jnp.clip(jnp.log(jnp.asarray(c, dtype)), lo_l, hi_l)
                for c in outer_cuts
            ]
            + [hi_l]
        )
        Xp, Wp = [], []
        for a, b in zip(edges[:-1], edges[1:]):
            u = jnp.exp(a + 0.5 * (b - a) * (xu + 1.0))
            Xp.append(u)
            Wp.append(0.5 * (b - a) * wu * u)
        X = Xp[0] if n_po == 1 else jnp.concatenate(Xp, axis=0)  # [G, TB]
        WX = Wp[0] if n_po == 1 else jnp.concatenate(Wp, axis=0)
        logX = jnp.log(jnp.maximum(X, tiny))

        # ---- densities at the outer nodes --------------------------------
        F = [
            _density_rows(fam, n, p1, p2, X, logX, normed=False)
            for fam, (n, p1, p2) in zip(families, params)
        ]
        NF = [
            _density_rows(fam, n, p1, p2, X, logX, normed=True)
            for fam, (n, p1, p2) in zip(families, params)
        ]
        denom = NF[0]
        for v in NF[1:]:
            denom = denom + v
        wfrac, run = [], jnp.zeros_like(denom)
        for v in NF:
            run = run + v
            wfrac.append(jnp.where(denom == 0.0, 0.0, run / denom))

        # moment weights B_m = WX·x^m and C_m = B_m·x (inner Jacobian)
        Bm, xp = [], jnp.ones_like(X)
        for m in range(n_mom):
            if m > 0:
                xp = xp * X
            Bm.append(WX * xp)
        Cm = [b * X for b in Bm]

        # ---- R: inner ∫ K(x,y) f_j(y) dy on the same grid -----------------
        A = [jnp.zeros_like(X) for _ in range(N)]
        for y in range(G_total):
            Xy = X[y : y + 1, :]
            Ky = kernel_func(X, Xy)
            Wy = WX[y : y + 1, :]
            for j in range(N):
                A[j] = A[j] + (Wy * F[j][y : y + 1, :]) * Ky
        R = [
            [
                [
                    jnp.sum(Bm[m] * F[k] * A[j], axis=0, keepdims=True)
                    for k in range(N)
                ]
                for j in range(N)
            ]
            for m in range(n_mom)
        ]

        # ---- Q and S: triangular inner integrals y = s·x ------------------
        # with a kink t: per-x inner panels split at s = t/x and 1 − t/x
        if kinks:
            t = kinks[0]
            b1 = jnp.clip(t / X, 0.0, 1.0)
            b2 = jnp.clip(1.0 - t / X, 0.0, 1.0)
            c1, c2 = jnp.minimum(b1, b2), jnp.maximum(b1, b2)
            s_edges = [jnp.zeros_like(X), c1, c2, jnp.ones_like(X)]
        else:
            s_edges = None

        Gq = {(j, k): jnp.zeros_like(X) for j in range(N) for k in range(j + 1, N)}
        Gkk = [jnp.zeros_like(X) for _ in range(N)]
        for pidx in range(n_pi):
            for s01, w01 in zip(s_nodes, s_weights):
                if s_edges is None:
                    s, w = s01, w01
                else:
                    a, b = s_edges[pidx], s_edges[pidx + 1]
                    s = a + (b - a) * s01
                    w = (b - a) * w01
                XR, XS = X * (1.0 - s), X * s
                lr = jnp.log(jnp.maximum(XR, tiny))
                ls = jnp.log(jnp.maximum(XS, tiny))
                D = [
                    _density_rows(fam, n, p1, p2, XR, lr, normed=False)
                    for fam, (n, p1, p2) in zip(families, params)
                ]
                E = [
                    _density_rows(fam, n, p1, p2, XS, ls, normed=False)
                    for fam, (n, p1, p2) in zip(families, params)
                ]
                KW = 0.5 * w * kernel_func(XR, XS)
                for j in range(N):
                    Gkk[j] = Gkk[j] + KW * D[j] * E[j]
                    for k in range(j + 1, N):
                        Gq[(j, k)] = Gq[(j, k)] + KW * (D[j] * E[k] + D[k] * E[j])

        def reduce(mat):
            return jnp.sum(mat, axis=0, keepdims=True)

        S1 = [
            [reduce(Cm[m] * wfrac[k] * Gkk[k]) for k in range(N)]
            for m in range(n_mom)
        ]
        S2 = [
            [reduce(Cm[m] * Gkk[k]) - S1[m][k] for k in range(N)]
            for m in range(n_mom)
        ]

        # ---- gated assembly (reference Coalescence.jl:479-488) ------------
        idx = 0
        for k in range(N):
            for m in range(spec.nprogmoms[k]):
                acc = S1[m][k]
                for j in range(N):
                    acc = acc - R[m][j][k]
                for j in range(k):
                    acc = acc + reduce(Cm[m] * Gq[(j, k)])
                if k > 0:
                    acc = acc + S2[m][k - 1]
                out_ref[idx, :] = acc[0, :]
                idx += 1

    def fn_soa(mom_t):
        """[n_tot, B] -> [n_tot, B] (structure-of-arrays layout)."""
        B = mom_t.shape[1]
        if B % block_cols != 0:
            raise ValueError(f"B={B} not a multiple of block_cols={block_cols}")
        # the unrolled node loops hold many [G, TB] temporaries live — allow
        # the kernel most of the chip's 128 MiB VMEM instead of the default
        # 16 MiB scoped limit
        kwargs = (
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                )
            }
        )
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(mom_t.shape, mom_t.dtype),
            grid=(B // block_cols,),
            **kwargs,
            in_specs=[
                pl.BlockSpec(
                    (n_tot, block_cols), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    glx.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (n_tot, block_cols), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )
        with _cache_bypass(interpret):
            return call(mom_t, jnp.asarray(glx, mom_t.dtype))

    def fn(mom):
        """[B, n_tot] -> [B, n_tot] (framework layout)."""
        return fn_soa(mom.T).T

    fn.soa = fn_soa
    return fn
