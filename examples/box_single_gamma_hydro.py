"""Single gamma mode, hydrodynamic kernel (reference box_single_gamma_hydro.jl)."""
from common import *

run_box_example(
    "box_single_gamma_hydro",
    SpectrumSpec((Family.GAMMA,)),
    [1e8, 1e-2, 2e-12],
    kernel=K.CoalescenceTensor.from_function(K.HydrodynamicKernelFunction(5.0), 2, 1e-6),
    t_end=3600.0, dt=60.0,
)
