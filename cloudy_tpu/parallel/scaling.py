"""Column-updates/s scaling measurement: 1 device → N devices.

The BASELINE north-star metric: column-updates/s scaling efficiency on a
column-sharded rainshaft ensemble at 1 chip → 1 host → N hosts (target ≥80%).
On real pods every host runs this same harness under
`jax.distributed.initialize`; in the sandbox it runs on the virtual CPU mesh
(communication-free column sharding means the efficiency structure is the
same — the only cross-device traffic is the diagnostics psum).
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cloudy_tpu.parallel.mesh import make_mesh
from cloudy_tpu.parallel.ensemble import ensemble_rainshaft_step


def measure_column_rate(
    rhs,
    dt: float,
    n_columns: int,
    nz: int,
    n_tot: int,
    devices: Sequence,
    n_steps: int = 20,
    dtype=jnp.float32,
    seed: int = 0,
) -> float:
    """Columns/s for one SSP-RK33 step of `rhs` on a column-sharded mesh over
    `devices` (chained steps, single readback — robust to lazy runtimes)."""
    mesh = make_mesh(("columns",), (len(devices),), devices=devices)
    step = ensemble_rainshaft_step(rhs, dt, mesh)

    rng = np.random.default_rng(seed)
    state = jnp.asarray(
        np.abs(rng.normal(1.0, 0.2, (n_columns, nz, n_tot))), dtype
    )
    state = jax.device_put(state, NamedSharding(mesh, P("columns")))

    @jax.jit
    def chain(y):
        def body(_, yy):
            return step(yy)

        return jnp.sum(jax.lax.fori_loop(0, n_steps, body, y))

    float(chain(state))  # compile + warm

    def timed(n_reps=3):
        ts = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            float(chain(state))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = timed()
    return n_columns * n_steps / t


def scaling_sweep(
    rhs, dt, nz, n_tot, columns_per_device: int = 8192, device_counts=None
) -> List[Dict]:
    """Weak-scaling sweep: fixed columns/device, growing device count.
    Returns [{'devices': d, 'columns_per_s': r, 'efficiency': e}]."""
    all_devs = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8) if d <= len(all_devs)]
    out = []
    base = None
    for d in device_counts:
        rate = measure_column_rate(
            rhs, dt, columns_per_device * d, nz, n_tot, all_devs[:d]
        )
        if base is None:
            base = rate / d
        out.append(
            {
                "devices": d,
                "columns_per_s": rate,
                "efficiency": rate / (base * d),
            }
        )
    return out
