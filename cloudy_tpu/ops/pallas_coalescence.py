"""Fused Pallas TPU kernel for the analytical coalescence step.

BUILD-NEW component (SURVEY.md §2): one kernel per block of columns fuses

    closure inversion → diagnostic moment recurrence → Simpson/incomplete-
    gamma autoconversion integrals (F2) → Q/R/S bilinear contraction

entirely in VMEM/registers. The XLA einsum path (coalescence.py) materializes
the ``[B, D²]`` outer product and ``[B, G, M]`` quadrature intermediates in
HBM (~150 floats/column of traffic); this kernel reads ``n_tot`` floats per
column and writes ``n_tot`` — the HBM-bandwidth speed-of-light for the
operation.

Data layout: columns ride the TPU *lane* dimension (structure-of-arrays,
``[n_tot, B]`` blocks of ``[n_tot, TB]``), so every physics step is an
element-wise VPU op over a ``[1, TB]`` or ``[G, TB]`` tile. The Q/R/S
contraction unrolls over the *static nonzero* entries of the assembly weight
tensors (typically 50-300 FMAs), not the dense D².

Restrictions (fall back to coalescence.get_coal_ints otherwise):
- FixedThreshold only (static Simpson grid per mode),
- gamma/exponential modes only for thresholded (non-last) modes
  (exp == gamma with k = 1; lognormal/monodisperse F2 needs the XLA path).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cloudy_tpu.spec import Family
from cloudy_tpu.coalescence import CoalescenceData
from cloudy_tpu.ops import special
from cloudy_tpu.ops.simpson import simpson_even_fast_weights


def _wb_nonzeros(data: CoalescenceData):
    """Static sparse view of the bilinear weights: [(out, i, j, coeff)]."""
    out = []
    n_out, D, _ = data.wb.shape
    for o in range(n_out):
        for i in range(D):
            for j in range(D):
                c = data.wb[o, i, j]
                if c != 0.0:
                    out.append((o, i, j, float(c)))
    return out


def _wf_nonzeros(data: CoalescenceData):
    out = []
    n_out, N, M, _ = data.wf.shape
    for o in range(n_out):
        for k in range(N):
            for p in range(M):
                for q in range(M):
                    c = data.wf[o, k, p, q]
                    if c != 0.0:
                        out.append((o, k, p, q, float(c)))
    return out


def pallas_supported(data: CoalescenceData) -> bool:
    if data.moving:
        return False
    for i, fam in enumerate(data.spec.families):
        thresholded = i < data.spec.n_modes - 1 and np.isfinite(data.thresholds[i])
        if thresholded and fam not in (Family.GAMMA, Family.EXPONENTIAL):
            return False
    return True


def _static_grid(threshold: float, n_bins_per_log_unit: int = 15):
    """Reference log grid + Simpson weights for a static threshold
    (ParticleDistributions.jl:579-585 semantics, incl. the masked last
    point)."""
    t = float(threshold)
    x_lo = min(1e-5, 1e-5 * t)
    n_bins = int(np.floor(n_bins_per_log_unit * np.log10(t / x_lo)))
    x_min = np.log(x_lo)
    dx = (np.log(t) - x_min) / n_bins
    j = np.arange(1, n_bins + 2)
    x = np.exp(x_min + (j - 1) * dx)
    w = simpson_even_fast_weights(n_bins)
    mask = (j <= n_bins).astype(np.float64)
    return x, w * mask, dx


def _static_grid_gauss(threshold: float, n_nodes: int = 24):
    """Gauss–Legendre nodes in log-x on the same interval as the reference
    grid — ~3x fewer quadrature points at better-than-Simpson accuracy (the
    fast-path rule; the f64 reference-parity path keeps the Simpson grid).
    The log-space Jacobian is folded into the weights; `dx` returns 1."""
    t = float(threshold)
    x_lo = min(1e-5, 1e-5 * t)
    u, wu = np.polynomial.legendre.leggauss(n_nodes)
    a, b = np.log(x_lo), np.log(t)
    uu = a + 0.5 * (b - a) * (u + 1.0)
    x = np.exp(uu)
    # NB: the kernel's integrand rows are x^{p+k}·e^{-x/θ} — the log-space
    # Jacobian x is already folded into the power (as in the reference
    # Simpson formulation), so the weights carry only the interval scale.
    w = 0.5 * (b - a) * wu
    return x, w, 1.0


def make_pallas_coal_fn(
    data: CoalescenceData,
    block_cols: int = 512,
    interpret: bool = False,
    gammainc_iters: Optional[int] = None,
    quad_rule: str = "reference",
    gauss_nodes: int = 24,
):
    """Build ``fn(mom_norm [B, n_tot]) -> [B, n_tot]`` running the fused
    kernel. ``B`` must be a multiple of `block_cols`. Use
    ``interpret=True`` for CPU testing. ``quad_rule``: "reference" keeps
    the reference's 76-point Simpson log grid; "gauss" uses `gauss_nodes`
    Gauss–Legendre points on the same interval (~3x fewer integrand
    evaluations at better accuracy — the fast path)."""
    if not pallas_supported(data):
        raise ValueError("configuration not supported by the Pallas kernel")
    spec = data.spec
    N, M, P = spec.n_modes, data.M, data.P
    n_tot = spec.n_tot
    iters = gammainc_iters or data.gammainc_iters

    wb_nz = _wb_nonzeros(data)
    wf_nz = _wf_nonzeros(data)

    # static quadrature grids per thresholded mode — passed as kernel INPUTS
    # (Pallas forbids captured array constants); row 0 = x nodes, row 1 =
    # weights (masked Simpson or GL).
    grids = {}
    grid_inputs = []
    thresholded_modes = []
    for i in range(N):
        if i < N - 1 and np.isfinite(data.thresholds[i]):
            if quad_rule == "gauss":
                x_np, w_np, dx = _static_grid_gauss(data.thresholds[i], gauss_nodes)
            else:
                x_np, w_np, dx = _static_grid(data.thresholds[i])
            grids[i] = (x_np.shape[0], dx)
            grid_inputs.append(np.stack([x_np, w_np]))
            thresholded_modes.append(i)

    def kernel(mom_ref, *refs):
        grid_refs = refs[:-1]
        out_ref = refs[-1]
        dtype = mom_ref.dtype
        eps = jnp.finfo(dtype).eps
        TB = mom_ref.shape[1]

        # ---- closure inversion per mode (rows are [1, TB] tiles) ----------
        params = []  # (n, theta, k) per mode
        for i, fam in enumerate(spec.families):
            o = spec.offsets[i]
            m0 = mom_ref[o, :].reshape(1, TB)
            m1 = mom_ref[o + 1, :].reshape(1, TB)
            valid = (m0 > eps) & (m1 > eps)
            m0s = jnp.where(valid, m0, 1.0)
            m1s = jnp.where(valid, m1, 1.0)
            if fam == Family.GAMMA:
                m2 = mom_ref[o + 2, :].reshape(1, TB)
                m2s = jnp.where(valid, m2, 2.0)
                mean = m1s / m0s
                denom = m2s / m1s - mean
                denom = jnp.where(jnp.abs(denom) > 0, denom, eps)
                k = jnp.clip(mean / denom, eps, 10.0)
                theta = mean / k
            elif fam == Family.EXPONENTIAL:
                theta = m1s / m0s
                k = jnp.ones_like(theta)
            else:
                raise NotImplementedError(fam)
            n = jnp.where(valid, m0, 0.0)
            theta = jnp.where(valid, theta, 1.0)
            k = jnp.where(valid, k, 1.0)
            params.append((n, theta, k))

        # ---- diagnostic moment recurrence: Mf[i][p], p = 0..M-1 ----------
        mf = []
        for i, fam in enumerate(spec.families):
            n, theta, k = params[i]
            rows = [n]
            m = n
            for p in range(M - 1):
                m = m * theta * (k + p)
                rows.append(m)
            mf.append(rows)

        # ---- F2 matrices for thresholded modes ---------------------------
        f2 = {}
        for slot, i in enumerate(thresholded_modes):
            G, dx = grids[i]
            n, theta, k = params[i]
            x = grid_refs[slot][0, :].reshape(G, 1)
            w = grid_refs[slot][1, :].reshape(G, 1)
            logx = jnp.log(x)
            T = jnp.asarray(float(data.thresholds[i]), dtype)

            inv_theta = 1.0 / theta  # [1, TB]
            rem = jnp.maximum(T - x, 0.0) * inv_theta  # [G, TB]
            log_rem = jnp.log(jnp.maximum(rem, jnp.finfo(dtype).tiny))

            # incomplete gamma at the TOP order, then the forward-stable
            # downward recurrence P(a, x) = P(a+1, x) + x^a e^{−x}/Γ(a+1)
            # (additions of positive Poisson terms — no cancellation; see
            # coalescence._msh_matrix_gamma). One CF/series + one exp/lgamma
            # chain total per grid point.
            delta = special.exp(k * log_rem - rem - special.lgamma(k + 1.0))
            delta = jnp.where(rem > 0.0, delta, 0.0)
            deltas = [delta]
            for q in range(1, M - 1):
                deltas.append(deltas[-1] * rem / (k + q))
            gi = special.gammainc_impl(k + (M - 1.0), rem, n_iters=iters)
            gis = [gi]
            for q in range(M - 2, -1, -1):
                gi = jnp.clip(gi + deltas[q], 0.0, 1.0)
                gis.append(gi)
            gis.reverse()

            # integrand rows Y_p = w · x^{p+k} e^{-x/θ}
            base = special.exp(k * logx - x * inv_theta) * w  # [G, TB]
            lgk = special.lgamma(k)
            logth = jnp.log(theta)
            # per-q prefactor n² θ^{q−k} Γ(q+k)/Γ(k)², advanced
            # multiplicatively from q = 0 (pref_{q+1} = pref_q · θ (k+q))
            prefs = [(n * n) * special.exp(-k * logth - lgk)]
            for q in range(1, M):
                prefs.append(prefs[-1] * theta * (k + q - 1.0))
            mm_rows = mf[i]
            f2i = {}
            ypow = base
            for p in range(M):
                if p > 0:
                    ypow = ypow * x
                for q in range(p, M):
                    if p >= data.n_2d_ints[i] or q >= data.n_2d_ints[i]:
                        continue
                    raw = jnp.sum(ypow * gis[q], axis=0, keepdims=True) * dx
                    msh = raw * prefs[q]
                    mm = mm_rows[p] * mm_rows[q]
                    val = jnp.minimum(mm, msh)
                    val = jnp.where(mm < eps, 0.0, val)
                    f2i[(p, q)] = val
                    f2i[(q, p)] = val
            f2[i] = f2i

        def f2_lookup(i, p, q):
            # non-thresholded / last modes use the mm fallback with the
            # reference's zero-structure (Coalescence.jl:207-240)
            if i in f2:
                return f2[i].get((p, q))
            if p >= data.n_2d_ints[i] or q >= data.n_2d_ints[i]:
                return None
            mm = mf[i][p] * mf[i][q]
            return jnp.where(mm < jnp.finfo(mm.dtype).eps, 0.0, mm)

        # ---- Q/R/S contraction: unrolled sparse FMAs ---------------------
        acc = [None] * n_tot
        flat = [row for rows in mf for row in rows]  # index i*M + p
        for (o, i, j, c) in wb_nz:
            term = c * flat[i] * flat[j]
            acc[o] = term if acc[o] is None else acc[o] + term
        for (o, k_, p, q, c) in wf_nz:
            v = f2_lookup(k_, p, q)
            if v is None:
                continue
            term = c * v
            acc[o] = term if acc[o] is None else acc[o] + term
        for o in range(n_tot):
            out_ref[o, :] = (
                acc[o][0, :] if acc[o] is not None else jnp.zeros((TB,), dtype)
            )

    def fn_soa(mom_t):
        """[n_tot, B] -> [n_tot, B] (native layout)."""
        B = mom_t.shape[1]
        if B % block_cols != 0:
            raise ValueError(f"B={B} not a multiple of block_cols={block_cols}")
        grid = (B // block_cols,)
        in_specs = [
            pl.BlockSpec(
                (n_tot, block_cols), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ]
        grid_args = []
        for g in grid_inputs:
            shape = g.shape
            in_specs.append(
                pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            grid_args.append(jnp.asarray(g, mom_t.dtype))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(mom_t.shape, mom_t.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (n_tot, block_cols), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(mom_t, *grid_args)

    def fn(mom):
        """[B, n_tot] -> [B, n_tot] (framework layout; transposes at entry)."""
        return fn_soa(mom.T).T

    fn.soa = fn_soa
    return fn
