"""Special functions, implemented branch-free with fixed iteration counts.

The reference relies on Julia's SpecialFunctions (`gamma`, `gamma_inc`,
`gamma_inc_inv`; see src/ParticleDistributions/ParticleDistributions.jl:12).
Here every special function is written as pure element-wise jnp arithmetic with
*static* loop bounds, so the same code runs

- under `jit` on CPU/TPU (XLA),
- inside Pallas TPU kernels (Mosaic), and
- vectorized over arbitrary batch shapes,

with identical numerics everywhere. Fixed iteration counts replace adaptive
convergence tests (data-dependent control flow does not exist on the VPU).

Accuracy (validated in tests/test_special.py against scipy in float64):
- ``gammainc``:   < 1e-12 relative for a in [1e-3, 50], x in [0, 200]
- ``gammaincinv``: < 1e-10 relative over the same a-range, p in (1e-6, 1-1e-6)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# log-gamma
# --------------------------------------------------------------------------

# Lanczos coefficients (g=7, n=9), standard double-precision set.
_LANCZOS_G = 7.0
_LANCZOS_COEF = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)


def exp(x):
    """Overflow-safe exponential.

    This environment's XLA backend evaluates f64 `exp` at float32 range and
    precision (overflow to inf at x ≈ 88.7, measured in tests/test_special).
    Decomposing e^x = 2^frac(y) · 2^floor(y) with y = x·log2(e) keeps the
    mantissa computation in [1, 2) (no overflow) and applies the power of two
    exactly via `ldexp` — full f64 range at the backend's native precision.
    Also the Pallas-safe exp (same ops lower in Mosaic).
    """
    x = jnp.asarray(x)
    # f32 inputs: the backend's exp IS the correctly-rounded f32 exp with the
    # right overflow (x > 88.7 -> inf) / underflow / NaN behavior — the
    # dual-path range extension below only works around the axon backend's
    # f32-grade F64 transcendentals. One exp instead of two in the f32
    # production path (the fused coalescence kernel's hot rows).
    if x.dtype == jnp.float32:
        return jnp.exp(x)
    # direct path for the f32-safe argument range
    direct = jnp.exp(jnp.clip(x, -85.0, 85.0))
    # extended range via exp(x) = exp(x/9)^9 (|x|/9 <= 85 covers the full
    # f64 range |x| <= 745); 9 multiplies, ~9x the base rel error — only
    # used where the direct path would clamp
    y = jnp.exp(jnp.clip(x, -745.0, 745.0) * (1.0 / 9.0))
    y3 = y * y * y
    chain = y3 * y3 * y3
    out = jnp.where(jnp.abs(x) < 85.0, direct, chain)
    # pin true overflow/underflow and propagate NaN
    out = jnp.where(x > 745.0, jnp.inf, out)
    out = jnp.where(x < -745.0, 0.0, out)
    return jnp.where(jnp.isnan(x), x, out)


def powx(base, q):
    """Overflow-safe ``base**q`` for base > 0 (via exp(q·log base));
    returns 1 for q == 0 even when base is the degenerate placeholder."""
    base = jnp.asarray(base)
    b = jnp.maximum(base, jnp.finfo(base.dtype).tiny)
    return exp(jnp.asarray(q) * jnp.log(b))


def lgamma(x):
    """log Γ(x) for x > 0.

    Lanczos approximation — built from exp/log/div only so it lowers inside
    Pallas kernels (where `lax.lgamma` is unavailable). Relative error
    < 1e-13 in float64 for x > 0.5; the reflection branch is not needed
    because every caller has x > 0 (shape parameters, moment orders).
    """
    x = jnp.asarray(x)
    # Compute at z >= 1 for accuracy; for z in (0, 1) use
    # lgamma(z) = lgamma(z+1) - log(z).
    shift = x < 1.0
    z = jnp.where(shift, x + 1.0, x)

    zm1 = z - 1.0
    series = jnp.full_like(z, _LANCZOS_COEF[0])
    for i, c in enumerate(_LANCZOS_COEF[1:], start=1):
        series = series + c / (zm1 + i)
    t = zm1 + _LANCZOS_G + 0.5
    half_log_2pi = 0.9189385332046727
    out = half_log_2pi + (zm1 + 0.5) * jnp.log(t) - t + jnp.log(series)
    return jnp.where(shift, out - jnp.log(jnp.maximum(x, jnp.finfo(x.dtype).tiny)), out)


def gammafn(x):
    """Γ(x) for x > 0."""
    return exp(lgamma(x))


def lgamma_stirling(x):
    """log Γ(x) for x > 0 with ONE divide + 2 logs — the fast-tier
    replacement for the Lanczos chain on the exact-F2 hot path.

    The round-5 on-chip calibration (ROOFLINE.json `op_costs`) measured a
    divide at ~9 mul-slots on this VPU, making Lanczos' 8-divide series
    the single most expensive scalar block in the production kernel
    (measured 31 ps/eval vs ~0.27 ps/mul). This form shifts z = x + 3 into
    Stirling territory and removes the shift exactly:

        lgamma(x) = [(z−½)ln z − z + ½ln2π + 1/(12z) − 1/(360z³)
                     + 1/(1260z⁵) − 1/(1680z⁷)] − ln(x(x+1)(x+2)(x+3)),
        z = x + 4

    Absolute error < 4e-9 for x ∈ (0, 50] (the remainder of the truncated
    Stirling tail at z ≥ 4; pinned vs scipy in tests/test_special.py) —
    far inside the f32 production path's precision and the exact-F2
    path's 2.6e-7 gammainc bound. The f64 reference-parity path keeps
    `lgamma` (Lanczos, < 1e-13)."""
    x = jnp.asarray(x)
    tiny = jnp.finfo(x.dtype).tiny
    z = x + 4.0
    log_z = jnp.log(z)
    iz = 1.0 / z
    iz2 = iz * iz
    iz3 = iz * iz2
    tail = (
        iz * (1.0 / 12.0)
        - iz3 * (1.0 / 360.0)
        + iz3 * iz2 * (1.0 / 1260.0)
        - iz3 * iz2 * iz2 * (1.0 / 1680.0)
    )
    half_log_2pi = 0.9189385332046727
    lg_z = half_log_2pi + (z - 0.5) * log_z - z + tail
    shift = jnp.maximum(x * (x + 1.0) * (x + 2.0) * (x + 3.0), tiny)
    return lg_z - jnp.log(shift)


def gamma_ratio(k, e):
    """Γ(k+e)/Γ(k) for k > 0, e ∈ [0, 1] — WITHOUT evaluating two lgammas.

    The sedimentation-flux fractional-moment base ``M_e = n·θ^e·Γ(k+e)/Γ(k)``
    (reference Sedimentation.jl:22-37 with the examples' v = 50·x^{1/6})
    evaluates this ratio per mode per RK stage in the whole-step kernel; as
    a Lanczos-lgamma pair + exp it costs ~23 transcendental-class ops and
    was the dominant unaccounted term of the whole-step roofline (VERDICT
    r3 #1). This form costs 2 logs + 1 exp + ~7 divides:

        Γ(k+e)/Γ(k) = [Γ(z+e)/Γ(z)] · k(k+1)(k+2)/((k+e)(k+1+e)(k+2+e)),
        z = k + 3 ≥ 3,

    with ln Γ(z+e) − ln Γ(z) by the Stirling series through the 1/z⁵ term
    (remainder of the DIFFERENCE ~ e·7/(1680·z⁸) ≈ 1e-7 at z = 3).
    Worst-case relative error vs scipy is pinned < 5e-7 over
    k ∈ [1e-6, 50] × e ∈ [0, 1] in tests/test_special.py. Pallas-safe
    (log/exp/divide only). The k → 0 limit (ratio → k·Γ(1+e)-like → 0) is
    exact through the k/(k+e) front factor."""
    k = jnp.asarray(k)
    e = jnp.asarray(e, k.dtype)
    z = k + 3.0
    ze = z + e
    log_z = jnp.log(z)
    log_ze = jnp.log(ze)
    # Stirling: lnΓ(z) ≈ (z-½)ln z − z + ½ln2π + 1/(12z) − 1/(360z³) + 1/(1260z⁵)
    iz, ize = 1.0 / z, 1.0 / ze
    iz2, ize2 = iz * iz, ize * ize
    tail = (ize - iz) * (1.0 / 12.0) \
        - (ize * ize2 - iz * iz2) * (1.0 / 360.0) \
        + (ize * ize2 * ize2 - iz * iz2 * iz2) * (1.0 / 1260.0)
    d = (ze - 0.5) * log_ze - (z - 0.5) * log_z - e + tail
    # one divide of two triple products instead of three divides (divides
    # measured ~9 mul-slots on this VPU — round-5 op calibration)
    front = (k * (k + 1.0) * (k + 2.0)) / (
        (k + e) * (k + 1.0 + e) * (k + 2.0 + e)
    )
    return exp(d) * front


# --------------------------------------------------------------------------
# regularized incomplete gamma P(a, x) and Q(a, x)
# --------------------------------------------------------------------------


def _gammainc_series_sum(a, x, n_iters):
    """Lower-series sum of P(a,x) (without the prefactor); x < a + 1.

    sum_{n>=0} x^n / (a (a+1) ... (a+n)).
    """

    def body(_, carry):
        total, term, ap = carry
        ap = ap + 1.0
        term = term * x / ap
        return total + term, term, ap

    term0 = 1.0 / a
    term0, _ = jnp.broadcast_arrays(term0, x)
    # fully unrolled: straight-line HLO fuses into one kernel (a rolled loop
    # materializes the [batch]-shaped carry in HBM every iteration)
    total, _, _ = jax.lax.fori_loop(
        0, n_iters, body, (term0, term0, a + jnp.zeros_like(term0)), unroll=True
    )
    return total


def _gammainc_contfrac_h(a, x, n_iters):
    """Continued-fraction (modified Lentz) factor of Q(a,x) (without the
    prefactor); x >= a + 1."""
    tiny = jnp.finfo(x.dtype).tiny * 1e10

    b0 = x + 1.0 - a
    c0 = jnp.full_like(b0, 1.0 / tiny)
    d0 = 1.0 / jnp.where(jnp.abs(b0) < tiny, tiny, b0)
    h0 = d0

    def body(i, carry):
        h, c, d, b = carry
        fi = i.astype(x.dtype) + 1.0
        an = -fi * (fi - a)
        b = b + 2.0
        d = an * d + b
        d = jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = b + an / c
        c = jnp.where(jnp.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * d * c
        return h, c, d, b

    h, _, _, _ = jax.lax.fori_loop(0, n_iters, body, (h0, c0, d0, b0), unroll=True)
    return h


def gammainc_impl(a, x, n_iters: int = 128, log_x=None):
    """Unjitted body of `gammainc` (call this inside Pallas kernels — a
    nested pjit does not lower through Mosaic).

    Cost structure matters here (this is the inner loop of the fused
    coalescence kernel, where x is a [G, TB] grid and a is a [1, TB] row):
    everything that depends only on `a` — lgamma(a), log(a+1) — is evaluated
    at a's own (row) shape and broadcast lazily, instead of materializing a
    at x's shape first; the two branch prefactors share ONE log of x (pass
    ``log_x`` to reuse a log the caller already has).
    """
    a = jnp.asarray(a)
    x = jnp.asarray(x)
    dtype = jnp.result_type(a, x)
    a = a.astype(dtype)
    # Clamp very large x: P(a, x) has saturated to 1 long before 1e6 for any
    # a this framework sees (a ≲ 100); avoids inf/NaN propagation through the
    # continued fraction.
    x = jnp.minimum(x.astype(dtype), 1e6)

    ap1 = a + 1.0
    use_series = x < ap1
    x_safe_series = jnp.where(use_series, x, ap1)
    x_safe_cf = jnp.where(use_series, ap1, x)

    series_sum = _gammainc_series_sum(a, x_safe_series, n_iters)
    h_cf = _gammainc_contfrac_h(a, x_safe_cf, n_iters)

    # shared prefactor pieces: one [x]-shaped log + [a]-shaped lgamma/log
    tiny = jnp.finfo(dtype).tiny
    if log_x is None:
        log_x = jnp.log(jnp.maximum(x, tiny))
    log_ap1 = jnp.log(ap1)  # a-shaped
    lga = lgamma(a)  # a-shaped
    log_xs = jnp.where(use_series, log_x, log_ap1)
    log_xc = jnp.where(use_series, log_ap1, log_x)
    p_series = series_sum * exp(a * log_xs - x_safe_series - lga)
    q_cf = h_cf * exp(a * log_xc - x_safe_cf - lga)

    out = jnp.where(use_series, p_series, 1.0 - q_cf)
    out = jnp.clip(out, 0.0, 1.0)
    # P(a, x <= 0) = 0
    return jnp.where(x > 0.0, out, jnp.zeros_like(out))


@functools.partial(jax.jit, static_argnames=("n_iters",))
def gammainc(a, x, n_iters: int = 128):
    """Regularized lower incomplete gamma P(a, x), element-wise.

    Matches Julia's ``gamma_inc(a, x)[1]`` (the reference's workhorse in
    partial moments and `moment_source_helper`,
    src/ParticleDistributions/ParticleDistributions.jl:226-285, 557-612).
    Branch-free: evaluates both the series and the continued fraction at a
    *safe* argument each and selects, so no NaNs leak through `where`.
    """
    return gammainc_impl(a, x, n_iters=n_iters)


def gammaincc(a, x, n_iters: int = 128):
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    return 1.0 - gammainc(a, x, n_iters=n_iters)


def gammainc_gl(a, x, n_nodes: int = 12, gln=None):
    """P(a, x) via fixed Gauss–Legendre integration of the gamma density
    between x and a point deep in the far tail (the Numerical-Recipes
    'gammpapprox' scheme, made branch-free) — the PROVEN-accuracy fast path
    for moderate-to-large shape parameters.

    Why it exists: a fixed-iteration series/continued-fraction pair has its
    error concentrated at the branch point x ≈ a + 1, and the number of
    iterations needed there grows like √a — at a = 26 (the largest order the
    exact-F2 autoconversion path can request: a = 2k + 2M − 2 with the
    reference's k ≤ 10 clip and M = 4) twelve iterations leave 1.7e-2
    ABSOLUTE error, and ~32 are needed for 1e-6. This quadrature has no
    branch point: measured max |error| over the full reachable domain
    (a ∈ [4, 26] × x ∈ (0, 1e6]) is 2.6e-7 at 12 nodes in f64 (9.1e-6 at
    10, 2.5e-4 at 8), degrading to 5.1e-5 on a ∈ [2, 4] — pinned against
    scipy in tests/test_special.py. Requires a ≥ 2; callers with small a
    (gammaincinv's Newton at a = k, erf at a = ½) keep the series/CF pair,
    which converges fast there.

    Cost: `n_nodes` (log + exp) + O(n_nodes) ALU — comparable to 12
    series+CF iterations at ~65,000x better worst-case accuracy. Pallas-safe
    (nodes unroll as scalar constants; exp/log/where only). Pass ``gln`` to
    reuse an ln Γ(a) the caller already has (saves one Lanczos chain — the
    exact-F2 path derives it from its delta-chain lgamma for free).
    """
    a = jnp.asarray(a)
    x = jnp.asarray(x)
    dtype = jnp.result_type(a, x)
    a = a.astype(dtype)
    # same large-x clamp as gammainc_impl (P has saturated long before)
    x = jnp.minimum(x.astype(dtype), 1e6)
    tiny = jnp.finfo(dtype).tiny

    import numpy as _np

    y, w = _np.polynomial.legendre.leggauss(n_nodes)

    a1 = a - 1.0
    sqa = jnp.sqrt(jnp.maximum(a1, tiny))
    if gln is None:
        gln = lgamma(a)
    # integration endpoint deep in the negligible tail (NR gammpapprox
    # windows: 11.5σ/6σ above the mode, 7.5σ/5σ below, floored at 0)
    xu_hi = jnp.maximum(a1 + 11.5 * sqa, x + 6.0 * sqa)
    xu_lo = jnp.maximum(0.0, jnp.minimum(a1 - 7.5 * sqa, x - 5.0 * sqa))
    above = x > a1
    xu = jnp.where(above, xu_hi, xu_lo)
    half = 0.5 * (xu - x)

    s = None
    for yj, wj in zip(y.tolist(), w.tolist()):
        t = jnp.maximum(x + half * (yj + 1.0), tiny)
        f = exp(a1 * jnp.log(t) - t - gln)
        s = wj * f if s is None else s + wj * f
    s = s * half
    out = jnp.clip(jnp.where(above, 1.0 - s, -s), 0.0, 1.0)
    return jnp.where(x > 0.0, out, jnp.zeros_like(out))


# --------------------------------------------------------------------------
# inverse of P(a, .)
# --------------------------------------------------------------------------

# Acklam's rational approximation to the inverse normal CDF. Max abs error
# ~1.15e-9 — only used as a Newton starting point, final accuracy comes from
# the Newton iterations on gammainc itself.
_NDTRI_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
            1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_NDTRI_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
            6.680131188771972e+01, -1.328068155288572e+01)
_NDTRI_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
            -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_NDTRI_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
            3.754408661907416e+00)


def ndtri(p):
    """Inverse standard normal CDF (Acklam), Pallas-safe."""
    p = jnp.asarray(p)
    eps = jnp.finfo(p.dtype).tiny
    p = jnp.clip(p, eps, 1.0 - 1e-16)

    p_low = 0.02425
    a, b, c, d = _NDTRI_A, _NDTRI_B, _NDTRI_C, _NDTRI_D

    # central region
    p_c = jnp.clip(p, p_low, 1.0 - p_low)
    q = p_c - 0.5
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    x_central = num * q / den

    # lower tail
    p_l = jnp.minimum(p, p_low)
    ql = jnp.sqrt(-2.0 * jnp.log(p_l))
    num_l = ((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]
    den_l = (((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1.0
    x_low = num_l / den_l

    # upper tail (by symmetry)
    p_u = jnp.minimum(1.0 - p, p_low)
    qu = jnp.sqrt(-2.0 * jnp.log(p_u))
    num_u = ((((c[0] * qu + c[1]) * qu + c[2]) * qu + c[3]) * qu + c[4]) * qu + c[5]
    den_u = (((d[0] * qu + d[1]) * qu + d[2]) * qu + d[3]) * qu + 1.0
    x_up = -num_u / den_u

    return jnp.where(p < p_low, x_low, jnp.where(p > 1.0 - p_low, x_up, x_central))


def gammaincinv_impl(a, p, n_newton: int = 32, n_iters: int = 128,
                     unroll: bool = False):
    """Unjitted body of `gammaincinv` (call this inside Pallas kernels — a
    nested pjit does not lower through Mosaic; pass ``unroll=True`` there,
    Mosaic handles straight-line code best)."""
    a = jnp.asarray(a)
    p = jnp.asarray(p)
    a, p = jnp.broadcast_arrays(a, p)
    dtype = jnp.result_type(a, p)
    a = a.astype(dtype)
    tiny = jnp.finfo(dtype).tiny
    p = jnp.clip(p.astype(dtype), tiny, 1.0 - jnp.finfo(dtype).epsneg)

    # Wilson–Hilferty: x0 = a * (1 - 1/(9a) + z sqrt(1/(9a)))^3
    z = ndtri(p)
    t = 1.0 - 1.0 / (9.0 * a) + z * jnp.sqrt(1.0 / (9.0 * a))
    x0 = a * t * t * t
    # Small-a / small-p fallback: x0 = (p Γ(a+1))^(1/a)
    x_small = exp((jnp.log(p) + lgamma(a + 1.0)) / a)
    x0 = jnp.where((t > 0.0) & (x0 > 1e3 * tiny), x0, x_small)
    x0 = jnp.maximum(x0, tiny)

    lg = lgamma(a)

    def body(_, x):
        f = gammainc_impl(a, x, n_iters=n_iters) - p
        logdf = (a - 1.0) * jnp.log(jnp.maximum(x, tiny)) - x - lg
        step = f * exp(-logdf)
        # Damp: never move more than a factor of ~0.9 of x toward zero.
        step = jnp.clip(step, -9.0 * x, 0.9 * x)
        return x - step

    x = jax.lax.fori_loop(0, n_newton, body, x0, unroll=unroll)
    return x


def gammainc_gl_shift(a, x, n_nodes: int = 12, lga1=None, log_x=None,
                      shift: int = 4):
    """P(a, x) for ANY a > 0 at proven-uniform accuracy: GL quadrature at
    a + shift plus `shift` exact downward-recurrence terms.

    `gammainc_gl` needs a ≥ 2 and is weakest just above it; the identity
    ``P(a,x) = P(a+s,x) + Σ_{j=0}^{s-1} x^{a+j} e^{-x}/Γ(a+j+1)``
    is exact, and with s = 4 the GL argument a + 4 ≥ 4 sits in the 2.6e-7
    worst-case region for all a > 0 — the series/CF pair's branch-point
    error concentration is gone entirely, at the cost of the GL sweep +
    1 lgamma + 1 exp + (s−1) multiplies. Pass ``lga1`` (= ln Γ(a+1)) and
    ``log_x`` to reuse values the caller has. Pinned vs scipy in
    tests/test_special.py.
    """
    a = jnp.asarray(a)
    x = jnp.asarray(x)
    dtype = jnp.result_type(a, x)
    a = a.astype(dtype)
    x = jnp.minimum(x.astype(dtype), 1e6)
    tiny = jnp.finfo(dtype).tiny
    if lga1 is None:
        lga1 = lgamma(a + 1.0)
    if log_x is None:
        log_x = jnp.log(jnp.maximum(x, tiny))
    d = exp(a * log_x - x - lga1)
    d = jnp.where(x > 0.0, d, 0.0)
    total = d
    prod = jnp.ones_like(a)
    for j in range(1, shift):
        d = d * x / (a + j)
        total = total + d
        prod = prod * (a + j)
    # lgamma(a+shift) = lgamma(a+1) + log((a+1)...(a+shift-1)): one log
    p_hi = gammainc_gl(
        a + float(shift), x, n_nodes=n_nodes, gln=lga1 + jnp.log(prod)
    )
    return jnp.clip(p_hi + total, 0.0, 1.0)


def gammaincinv_gl_impl(a, p, n_iter: int = 3, n_nodes: int = 12):
    """Fast x with P(a, x) = p: Wilson–Hilferty start + `n_iter` HALLEY
    iterations with the SHIFT-4 GL incomplete gamma inside (the
    `gammainc_gl_shift` rule with its downward recurrence inlined so the
    hoisted ``gln4`` and the derivative term are shared) — the proven-bound
    replacement for `gammaincinv_impl`'s 32 damped-Newton × 128-iteration
    series/CF defaults on the MovingThreshold production path (VERDICT r3
    #2).

    Why it converges in 3 iterations: the WH/small-x start is good to
    ~1e-2 relative over the reachable domain (k ∈ (eps, 10], central
    percentiles); Halley is cubic (1e-2 → 1e-6 → inner floor), and the
    inner shift-4 GL error (< 5e-7 absolute in P, the
    `gammainc_gl_shift` bound pinned in tests/test_special.py) caps the
    fixed point. Measured worst-case relative error vs scipy is pinned in
    tests/test_special.py over the FULL production k-domain — down to the
    f64 k-clip floor 2.2e-16: < 2e-5 on k ∈ [0.02, 10], < 5e-9 on
    k < 0.02 wherever the true quantile is representable, and ≈ 0 (the
    `tiny` clamp) where it underflows. The Halley factor costs 2 divides
    on top of Newton (P''/P' = (a−1)/x − 1 is analytic) and roughly
    halves the iterations needed.

    Cost: n_iter × (n_nodes (log+exp) + ~4 exp/log/div) + 1 lgamma +
    ndtri — ~100 transcendental-class ops at n_iter=3, n_nodes=12, vs ~330
    for the 8×12 series/CF Newton it replaces in the kernel. Pallas-safe.
    """
    a = jnp.asarray(a)
    p = jnp.asarray(p)
    a, p = jnp.broadcast_arrays(a, p)
    dtype = jnp.result_type(a, p)
    a = a.astype(dtype)
    tiny = jnp.finfo(dtype).tiny
    p = jnp.clip(p.astype(dtype), tiny, 1.0 - jnp.finfo(dtype).epsneg)

    # Start: max(Wilson–Hilferty, small-x closed form). WH collapses for
    # a < 1 at small p (x0 → ~0 while the true quantile is O(1e-3) — too
    # far for 3 Halley steps to recover); x_small = (pΓ(a+1))^(1/a) is the
    # exact leading-order inverse there and a strict UNDERestimate
    # elsewhere (P(a,x) = x^a/Γ(a+1)·(1 − ax/(a+1) + …)), so the max is
    # always the better of two never-catastrophic starts.
    z = ndtri(p)
    t = 1.0 - 1.0 / (9.0 * a) + z * jnp.sqrt(1.0 / (9.0 * a))
    x_wh = jnp.where(t > 0.0, a * t * t * t, 0.0)
    lga1 = lgamma(a + 1.0)
    x_small = exp((jnp.log(p) + lga1) / a)
    x = jnp.maximum(jnp.maximum(x_wh, x_small), tiny)

    # hoisted out of the loop: lgamma(a+4) = lgamma(a+1) + log((a+1)(a+2)(a+3))
    gln4 = lga1 + jnp.log((a + 1.0) * (a + 2.0) * (a + 3.0))
    for _ in range(n_iter):
        xs = jnp.minimum(x, 1e6)
        log_x = jnp.log(jnp.maximum(xs, tiny))
        d = exp(a * log_x - xs - lga1)
        d = jnp.where(xs > 0.0, d, 0.0)
        deriv = d * a / jnp.maximum(xs, tiny)  # P'(a,x) = x^{a-1}e^{-x}/Γ(a)
        total = d
        for j in (1.0, 2.0, 3.0):
            d = d * xs / (a + j)
            total = total + d
        p4 = gammainc_gl(a + 4.0, xs, n_nodes=n_nodes, gln=gln4)
        f = jnp.clip(p4 + total, 0.0, 1.0) - p
        step_n = f / jnp.maximum(deriv, tiny)
        # Halley factor: f''/(2f') = ((a-1)/x - 1)/2, clipped for stability
        h = 0.5 * ((a - 1.0) / jnp.maximum(xs, tiny) - 1.0)
        denom = jnp.clip(1.0 - step_n * h, 0.5, 2.0)
        step = step_n / denom
        step = jnp.clip(step, -9.0 * x, 0.9 * x)
        x = x - step
    return x


@functools.partial(jax.jit, static_argnames=("n_iter", "n_nodes"))
def gammaincinv_gl(a, p, n_iter: int = 3, n_nodes: int = 12):
    """Jitted wrapper of `gammaincinv_gl_impl` (fast proven-bound inverse)."""
    return gammaincinv_gl_impl(a, p, n_iter=n_iter, n_nodes=n_nodes)


@functools.partial(jax.jit, static_argnames=("n_newton", "n_iters"))
def gammaincinv(a, p, n_newton: int = 32, n_iters: int = 128):
    """x such that P(a, x) = p — Julia's ``gamma_inc_inv(a, p, 1-p)``.

    Used for percentile thresholds of gamma modes (reference
    `compute_threshold`, src/ParticleDistributions/ParticleDistributions.jl:755-761).

    Wilson–Hilferty starting point followed by damped Newton iterations on
    g(x) = P(a,x) - p with analytic derivative P'(a,x) = x^(a-1) e^-x / Γ(a).
    """
    return gammaincinv_impl(a, p, n_newton=n_newton, n_iters=n_iters)


def erf(x):
    """Error function — thin wrapper (XLA provides a native lowering)."""
    return jax.lax.erf(x)


# Abramowitz & Stegun 7.1.26 rational approximation (Hastings): max absolute
# error 1.5e-7 over all x — the same order as gammainc_gl's 2.6e-7 bound.
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf_approx(x):
    """Rational-approximation error function (A&S 7.1.26), Pallas-safe.

    The fast path for the lognormal Φ partial moments: `erf_impl` evaluates
    erf through the full series/CF incomplete gamma (~150 slot-weighted ops
    per point); this is 1 exp + 1 div + 9 FMAs at a PROVEN 1.5e-7 absolute
    bound (pinned vs scipy in tests/test_special.py). Measured on-chip: the
    lognormal-thresholded F2 grid runs the erf per (grid point × moment
    order), so this swap is the dominant term of the lognormal family's
    throughput."""
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _ERF_P * ax)
    a1, a2, a3, a4, a5 = _ERF_A
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * exp(-ax * ax)
    return jnp.sign(x) * y


def erf_impl(x, n_iters: int = 128):
    """Pallas-safe error function: erf(z) = sign(z) · P(1/2, z²).

    `lax.erf` has no Mosaic lowering (probed on-chip: "Unimplemented
    primitive in Pallas TPU lowering: erf"), so inside Pallas kernels erf is
    evaluated through the same `gammainc_impl` machinery as everything else.
    The lognormal F2 path uses THIS implementation on the XLA side too
    (coalescence._msh_matrix_lognormal) so the two paths stay bit-identical.
    Accuracy follows gammainc: < 1e-12 relative in f64 at n_iters = 128.
    """
    x = jnp.asarray(x)
    p = gammainc_impl(jnp.asarray(0.5, x.dtype), x * x, n_iters=n_iters)
    return jnp.sign(x) * p
