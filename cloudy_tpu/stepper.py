"""Explicit time integration under `jit`/`lax.scan`.

The reference delegates stepping to OrdinaryDiffEq's SSPRK33 with fixed dt
(e.g. test/examples/Analytical/box_single_gamma.jl:36). Here the stepper is a
first-class subsystem: explicit SSP-RK stages as pure functions, scanned on
device — no host round-trips, no per-step dispatch. This is the BUILD-NEW
"SSP-RK scan stepper" of SURVEY.md §2.
"""

from __future__ import annotations

import functools
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
