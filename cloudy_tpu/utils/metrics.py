"""Observability: step timing, conservation monitors, profiling hooks.

The reference's only performance tooling is CI-enforced BenchmarkTools
budgets (SURVEY.md §5/§6); here observability is first-class: wall-clock step
timers with device sync, physics invariant monitors (mass conservation,
positivity), `jax.profiler` trace capture, and a roofline estimate for the
coalescence kernel.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class StepTimer:
    """Accumulates per-step wall times (device-synchronized)."""

    times: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def time_step(self, result_holder=None):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def timed_call(self, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.times.append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, float]:
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "n": len(self.times),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "min_s": float(t.min()),
        }


def conservation_report(spec, mom_flat) -> Dict[str, float]:
    """Mass/number totals + positivity violations for a state
    ``[..., n_tot]`` — the psum-able invariants of the SCE (gain−loss
    structure conserves total M1 exactly; M0 must fall, M2 rise)."""
    mom = jnp.asarray(mom_flat)
    m0 = sum(mom[..., spec.dist_moment_ind(i, 0)] for i in range(spec.n_modes))
    m1 = sum(mom[..., spec.dist_moment_ind(i, 1)] for i in range(spec.n_modes))
    return {
        "total_number": float(jnp.sum(m0)),
        "total_mass": float(jnp.sum(m1)),
        "negative_fraction": float(jnp.mean((mom < 0).astype(jnp.float32))),
        "nonfinite_fraction": float(
            jnp.mean((~jnp.isfinite(mom)).astype(jnp.float32))
        ),
    }


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def coalescence_roofline(
    n_columns: int,
    n_modes: int,
    M: int,
    n_grid: int = 0,
    gammainc_iters: int = 12,
    dtype_bytes: int = 4,
    vpu_flops: float = 3.9e12,  # v5e VPU: ~940 MHz x (8,128) vreg x 4 ALUs
    hbm_bw: float = 8.1e11,  # TPU v5e bytes/s
    transcendental_slots: float = 8.0,
) -> Dict[str, float]:
    """Speed-of-light estimate for the fused coalescence step.

    The fused kernel is pure element-wise VPU work (the Q/R/S contraction is
    unrolled sparse FMAs on lane rows — no matmuls), so the compute ceiling
    is the VPU, not the MXU. Cost per column with the exact-F2 path
    (``n_grid = 0``): one gammainc chain (~3·iters transcendental-class ops
    + ~8·iters ALU) + closure inversion + moment recurrence + the bilinear
    form (~2·D² FMA upper bound). With a quadrature grid (``n_grid > 0``)
    the gammainc chain runs per grid point. Transcendental-class ops
    (exp/log/div) are weighted `transcendental_slots`.

    MEASURED against this model on the v5e (ROOFLINE.json, round 2): the
    bench configuration runs at ~0.9 of the slot-weighted VPU ceiling and
    ~0.2 of HBM — compute-bound, near speed of light. See tools/roofline.py
    for the per-term op model and docs/performance.md for the numbers.
    """
    D = n_modes * M
    n_out = 3 * n_modes  # upper bound
    reps = max(n_grid, 1) * max(n_modes - 1, 1)
    trans = reps * (3.0 * gammainc_iters + 15.0) + 10.0 * n_modes
    alu = (
        reps * (8.0 * gammainc_iters + 25.0)
        + 2.0 * D * D
        + 2.0 * n_out * D
        + 20.0 * n_modes
    )
    flops = n_columns * (alu + trans)
    slots = n_columns * (alu + transcendental_slots * trans)
    bytes_ = n_columns * (2 * n_out) * dtype_bytes
    ai = flops / bytes_
    t_compute = slots / vpu_flops
    t_mem = bytes_ / hbm_bw
    return {
        "flops": flops,
        "slot_weighted_ops": slots,
        "bytes": bytes_,
        "arithmetic_intensity": ai,
        "t_compute_s": t_compute,
        "t_memory_s": t_mem,
        "bound": "compute" if t_compute > t_mem else "memory",
        "speed_of_light_s": max(t_compute, t_mem),
    }


class JsonlLogger:
    """Append-only JSONL metrics log (one dict per line)."""

    def __init__(self, path: str):
        self.path = path

    def log(self, record: Dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
