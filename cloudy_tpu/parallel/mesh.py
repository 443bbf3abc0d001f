"""Device mesh construction and multi-host initialization.

TPU-native scaling design (SURVEY.md §5/§7): columns are embarrassingly
parallel (the only inter-column coupling in the physics is zero), so the
primary mesh axis shards the column ensemble; an optional second axis shards
the vertical (z) dimension with a one-cell halo for the sedimentation flux
(cloudy_tpu/parallel/halo.py). Collectives ride ICI within a host / pod
slice; cross-host traffic is limited to diagnostics reductions (psum of
conservation sums).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` with arguments
    resolved from the environment when omitted (TPU pod metadata). Safe to
    call in single-process runs (no-op on failure to detect a cluster)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process / already initialized
        pass


def make_mesh(
    axis_names: Sequence[str] = ("columns",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    With `axis_sizes=None`, all devices go on the first axis and remaining
    axes get size 1. Example: ``make_mesh(("columns", "z"), (4, 2))`` on
    8 devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {tuple(axis_sizes)} != {n} devices")
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))
