"""Numerical-quadrature box, one gamma mode (reference single_particle_gamma.jl)."""
from common import *

run_box_example(
    "single_particle_gamma",
    SpectrumSpec((Family.GAMMA,)),
    [1e8, 1e-2, 2e-12],
    kernel_func=K.LinearKernelFunction(5.0),
    numerical=True,
    t_end=120.0, dt=10.0,
)
