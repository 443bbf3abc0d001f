"""1-D rainshaft, single gamma (reference rainshaft_single_gamma.jl)."""
from common import *

run_rainshaft_example(
    "rainshaft_single_gamma",
    SpectrumSpec((Family.GAMMA,)),
    [1e8, 1e-2, 2e-12],
    kernel=K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6),
)
