"""Single lognormal mode (reference box_single_lognorm.jl)."""
from common import *

run_box_example(
    "box_single_lognorm",
    SpectrumSpec((Family.LOGNORMAL,)),
    [1e8, 1e-2, 2e-12],
    kernel=K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6),
)
