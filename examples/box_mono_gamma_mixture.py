"""Monodisperse + gamma mixture (reference box_mono_gamma_mixture.jl)."""
from common import *

run_box_example(
    "box_mono_gamma_mixture",
    SpectrumSpec((Family.MONODISPERSE, Family.GAMMA)),
    [1e8, 1e-2, 1.0, 1e-8, 2e-16],
    kernel=K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6),
    thresholds=(5e-10, np.inf),
)
