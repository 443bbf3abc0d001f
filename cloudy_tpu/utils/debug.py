"""Debugging aids: retrace guards, NaN checks, HLO size probes.

The JAX analogue of the reference's JET type-stability / allocation tests
(SURVEY.md §4): instead of `@test_opt` and `@allocated`, assert that a jitted
step does not retrace across calls, contains no host callbacks, and stays
below an HLO-size budget.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax


def trace_counter(fn: Callable):
    """Wrap `fn` so invocations of its traced body are counted.
    Use with jax.jit to assert no-retrace behavior."""
    counts = {"n": 0}

    def wrapped(*args, **kwargs):
        counts["n"] += 1
        return fn(*args, **kwargs)

    return wrapped, counts


def assert_no_retrace(fn: Callable, args_list) -> None:
    """Jit `fn` with a trace counter and call it on every argument tuple in
    `args_list` (same shapes/dtypes); raises if the body traces more than
    once — the analogue of the reference's type-stability CI gate."""
    body, counts = trace_counter(fn)
    jitted = jax.jit(body)
    for args in args_list:
        jax.block_until_ready(jitted(*args))
    if counts["n"] > 1:
        raise AssertionError(f"function retraced {counts['n']} times")


def hlo_text(fn: Callable, *args) -> str:
    """Optimized HLO of a jitted function (size/structure assertions)."""
    return jax.jit(fn).lower(*args).compile().as_text()


def count_hlo_ops(fn: Callable, *args, opname: str = "while") -> int:
    txt = hlo_text(fn, *args)
    return txt.count(f" {opname}(")


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Temporarily enable jax_debug_nans (reference analogue: none — the
    Julia code simply propagates NaNs)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
