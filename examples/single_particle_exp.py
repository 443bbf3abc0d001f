"""Numerical-quadrature box, one exponential mode (reference single_particle_exp.jl)."""
from common import *

run_box_example(
    "single_particle_exp",
    SpectrumSpec((Family.EXPONENTIAL,)),
    [1e8, 1e-2],
    kernel_func=K.LinearKernelFunction(5.0),
    numerical=True,
    t_end=120.0, dt=10.0,
)
