"""Numerical-quadrature box with exponential modes (reference n_particles_exp.jl)."""
from common import *

run_box_example(
    "n_particles_exp",
    SpectrumSpec((Family.EXPONENTIAL, Family.EXPONENTIAL)),
    [1e8, 1e-2, 1.0, 1e-8],
    kernel_func=K.LinearKernelFunction(5.0),
    numerical=True,
    t_end=60.0, dt=5.0,
)
