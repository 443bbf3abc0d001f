"""Numerical-quadrature box with lognormal modes (reference n_particles_lognorm.jl)."""
from common import *

run_box_example(
    "n_particles_lognorm",
    SpectrumSpec((Family.LOGNORMAL, Family.LOGNORMAL)),
    [1e8, 1e-2, 2e-12, 1.0, 1e-8, 2e-16],
    kernel_func=K.LinearKernelFunction(5.0),
    numerical=True,
    t_end=60.0, dt=5.0,
)
