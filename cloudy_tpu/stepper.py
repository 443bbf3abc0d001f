"""Explicit time integration under `jit`/`lax.scan`.

The reference delegates stepping to OrdinaryDiffEq's SSPRK33 with fixed dt
(e.g. test/examples/Analytical/box_single_gamma.jl:36). Here the stepper is a
first-class subsystem: explicit SSP-RK stages as pure functions, scanned on
device — no host round-trips, no per-step dispatch. This is the BUILD-NEW
"SSP-RK scan stepper" of SURVEY.md §2.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def euler_step(f: Callable, y, t, dt):
    return y + dt * f(y, t)


def ssprk33_step(f: Callable, y, t, dt):
    """3-stage, 3rd-order strong-stability-preserving Runge–Kutta
    (Shu–Osher), the reference's integrator of record."""
    u1 = y + dt * f(y, t)
    u2 = 0.75 * y + 0.25 * (u1 + dt * f(u1, t + dt))
    return y / 3.0 + 2.0 / 3.0 * (u2 + dt * f(u2, t + 0.5 * dt))


def rk4_step(f: Callable, y, t, dt):
    k1 = f(y, t)
    k2 = f(y + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = f(y + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = f(y + dt * k3, t + dt)
    return y + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


STEPPERS = {
    "euler": euler_step,
    "ssprk33": ssprk33_step,
    "rk4": rk4_step,
}


_ORDERS = {"euler": 1, "ssprk33": 3, "rk4": 4}


def integrate_adaptive(
    f: Callable,
    y0,
    t0: float,
    t1: float,
    rtol: float = 1e-6,
    atol: float = 1e-9,
    dt0: Optional[float] = None,
    method: str = "ssprk33",
    max_steps: int = 100_000,
    safety: float = 0.9,
):
    """Adaptive-Δt integration to ``t1`` under ONE `lax.while_loop`.

    An added capability beyond the reference: the reference's parcel example
    passes reltol/abstol to OrdinaryDiffEq's SSPRK33
    (parcel_example.jl:105-110), but SSPRK33 has no embedded error estimator
    and is fixed-step-only — those tolerances are inert there, so the true
    parity path is fixed-dt `integrate`. This function provides real
    adaptivity the XLA-compatible way: error estimation by step doubling —
    each trial compares one full step against two half steps; their
    difference Δ scaled by 1/(2^p − 1) estimates the local error of the
    (kept, more accurate) two-half-step solution — and the standard
    controller ``dt ← dt·clip(safety·err^(-1/(p+1)), 0.2, 5)`` with
    rejection when the weighted RMS error exceeds 1. Static shapes, no
    data-dependent Python control flow: jit/vmap-compatible (while_loop is
    forward-mode only — for `jax.grad` through a trajectory use fixed-dt
    `integrate`, whose scan reverse-differentiates).

    Returns ``(y1, stats)`` with ``stats = {"n_accept", "n_reject",
    "dt_last", "t_final", "reached"}`` (scalars). ``reached`` is True iff
    the integration actually arrived at ``t1`` — if `max_steps` trials are
    exhausted (stiff RHS, or a NaN RHS rejecting every trial), ``y1`` is
    short of ``t1`` and callers must check this flag. Cost per trial is 3
    steps of ``method`` (full + 2 half); use fixed-dt `integrate` when the
    dynamics' stiffness is known and a trajectory is wanted.
    """
    step = STEPPERS[method]
    p = _ORDERS[method]
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    dt_init = (
        (t1 - t0) / 100.0 if dt0 is None else jnp.asarray(dt0, dtype)
    )
    scale_err = 1.0 / (2.0**p - 1.0)

    def cond(carry):
        y, t, dt, na, nr = carry
        return (t < t1) & (na + nr < max_steps)

    def body(carry):
        y, t, dt, na, nr = carry
        dt = jnp.minimum(dt, t1 - t)
        y_full = step(f, y, t, dt)
        y_half = step(f, y, t, 0.5 * dt)
        y_two = step(f, y_half, t + 0.5 * dt, 0.5 * dt)
        delta = (y_two - y_full) * scale_err
        tol = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_two))
        err = jnp.sqrt(jnp.mean((delta / tol) ** 2))
        accept = err <= 1.0
        # err can be 0 (exact/linear segments) — guard the power law; a NaN
        # err (NaN RHS) must not poison dt itself or the loop spins at the
        # cap with dt = NaN
        grow = safety * jnp.maximum(err, 1e-12) ** (-1.0 / (p + 1))
        dt_next = dt * jnp.clip(jnp.nan_to_num(grow, nan=0.2), 0.2, 5.0)
        y = jnp.where(accept, y_two, y)
        t = jnp.where(accept, t + dt, t)
        return (
            y,
            t,
            dt_next,
            na + accept.astype(jnp.int32),
            nr + (~accept).astype(jnp.int32),
        )

    y1, t_f, dt_f, na, nr = jax.lax.while_loop(
        cond,
        body,
        (y0, t0, dt_init, jnp.int32(0), jnp.int32(0)),
    )
    return y1, {
        "n_accept": na,
        "n_reject": nr,
        "dt_last": dt_f,
        "t_final": t_f,
        "reached": t_f >= t1,
    }


def integrate(
    f: Callable,
    y0,
    t0: float,
    dt: float,
    n_steps: int,
    method: str = "ssprk33",
    save_every: int = 1,
    remat: bool = False,
):
    """Fixed-dt integration of dy/dt = f(y, t) via `lax.scan`.

    Returns (ts [n_saved + 1], ys [n_saved + 1, ...]) including the initial
    state. ``save_every`` thins the saved trajectory (inner `lax.scan` of
    unsaved substeps — constant memory); `remat=True` wraps the step in
    `jax.checkpoint` to trade recompute for memory under autodiff.
    """
    if n_steps % save_every != 0:
        raise ValueError("n_steps must be divisible by save_every")
    step = STEPPERS[method]

    def one(y, t):
        return step(f, y, t, dt)

    if remat:
        one = jax.checkpoint(one)

    def chunk(carry, _):
        y, t = carry

        def sub(c, _):
            yy, tt = c
            return (one(yy, tt), tt + dt), None

        (y, t), _ = jax.lax.scan(sub, (y, t), None, length=save_every)
        return (y, t), y

    y0 = jnp.asarray(y0)
    (_, _), ys = jax.lax.scan(
        chunk, (y0, jnp.asarray(t0, y0.dtype)), None, length=n_steps // save_every
    )
    ys = jnp.concatenate([y0[None], ys], axis=0)
    ts = t0 + dt * save_every * jnp.arange(n_steps // save_every + 1)
    return ts, ys
