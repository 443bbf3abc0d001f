"""Condensation-only box, exp+gamma mixture (reference condensation_exp_gamma.jl)."""
from common import *

run_condensation_example(
    "condensation_exp_gamma",
    SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA)),
    [9e7, 5e-3, 1e7, 5e-3, 6e-13],
)
