"""Condensation-only box, single gamma (reference condensation_single_gamma.jl)."""
from common import *

run_condensation_example(
    "condensation_single_gamma",
    SpectrumSpec((Family.GAMMA,)),
    [1e8, 1e-2, 2e-12],
)
