"""1-D rainshaft, two gamma modes (reference rainshaft_gamma_mixture.jl)."""
from common import *

run_rainshaft_example(
    "rainshaft_gamma_mixture",
    SpectrumSpec((Family.GAMMA, Family.GAMMA)),
    [1e8, 1e-2, 2e-12],
    kernel=K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6),
    thresholds=(5e-10, np.inf),
)
