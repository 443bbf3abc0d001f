"""Distributed backend: device meshes, sharded column ensembles, halo
exchange. All BUILD-NEW capability (the reference is single-threaded CPU with
no parallelism of any kind — SURVEY.md §2)."""

from cloudy_tpu.parallel.mesh import make_mesh, initialize_distributed
from cloudy_tpu.parallel.ensemble import shard_columns, ensemble_rainshaft_step
from cloudy_tpu.parallel.halo import make_z_sharded_rainshaft_rhs

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "shard_columns",
    "ensemble_rainshaft_step",
    "make_z_sharded_rainshaft_rhs",
]
