"""Performance-structure guards — the JAX analogue of the reference's JET
type-stability and allocation CI gates (SURVEY.md §4/§6):

- a step must not retrace across same-shape calls,
- the coalescence RHS must compile loop-free (no `while` in optimized HLO;
  a regression to rolled special-function loops costs ~10x in HBM traffic),
- the scanned integrator must compile to a single program containing one
  loop (the time scan itself).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cloudy_tpu.spec import Family, SpectrumSpec
from cloudy_tpu import kernels as K
from cloudy_tpu import distributions as pd
from cloudy_tpu.coalescence import build_coalescence_data, get_coal_ints
from cloudy_tpu.utils import debug


def _rhs_setup():
    spec = SpectrumSpec((Family.GAMMA, Family.GAMMA))
    ker = K.CoalescenceTensor.from_function(K.LinearKernelFunction(5.0), 1, 1e-6)
    data = build_coalescence_data(
        spec, ker, (5e-10, np.inf), norms=(1e6, 1e-9), gammainc_iters=32
    )
    rhs = lambda m: get_coal_ints(data, pd.params_from_moments(spec, m))
    mom = jnp.asarray(
        np.abs(np.random.default_rng(0).normal(1, 0.1, (32, 6)))
        * np.array([1e2, 1e1, 2.0, 1e-6, 1e-5, 2e-4])
    )
    return rhs, mom


def test_rhs_no_retrace():
    rhs, mom = _rhs_setup()
    debug.assert_no_retrace(rhs, [(mom,), (mom * 1.5,), (mom * 0.5,)])


def test_rhs_compiles_loop_free():
    """The unrolled incomplete-gamma evaluation must stay unrolled: a rolled
    `while` materializes [B, G] carries in HBM every iteration (measured 8x
    step-time regression)."""
    rhs, mom = _rhs_setup()
    assert debug.count_hlo_ops(rhs, mom, opname="while") == 0


def test_integrate_single_scan():
    from cloudy_tpu import stepper

    f = lambda y, t: -y
    y0 = jnp.ones(4)

    def run(y):
        _, ys = stepper.integrate(f, y, 0.0, 0.1, 10, save_every=5)
        return ys

    txt = debug.hlo_text(run, y0)
    # outer scan over saved chunks + inner scan over substeps = at most 2
    assert txt.count(" while(") <= 2


def test_step_output_count():
    """The jitted RHS should return exactly one array (no accidental
    auxiliary outputs forcing extra HBM writes)."""
    rhs, mom = _rhs_setup()
    out = jax.jit(rhs)(mom)
    assert out.shape == mom.shape
