"""MXU 4-step engine parity (interpreter mode — CPU-runnable).

fourstep_mxu_lanes must match fourstep_ntt_lanes/fourstep_intt_lanes
bit-for-bit in the GPU calling convention (pre-transposed input,
pre-permuted INTT input, fused n^-1).
"""

import numpy as np
import pytest

import jax

from gpuntt_tpu import NTTParameters4Step, ReductionPolynomial
from gpuntt_tpu.ops.fourstep import (FourStepPlan, fourstep_intt_lanes,
                                     fourstep_ntt_lanes)
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
from gpuntt_tpu.ops.pallas_mxu_4step import FourStepMXUPlan, fourstep_mxu_lanes


@pytest.mark.parametrize("logn", [12, 13])
def test_mxu_4step_parity(logn, rng):
    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    eplan = FourStepPlan.from_params(p)
    mplan = FourStepMXUPlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    exp_f = from_lanes(jax.jit(lambda v: fourstep_ntt_lanes(v, eplan))(lanes), True)
    got_f = from_lanes(fourstep_mxu_lanes(lanes, mplan, interpret=True), True)
    np.testing.assert_array_equal(got_f, exp_f)

    exp_i = from_lanes(jax.jit(lambda v: fourstep_intt_lanes(v, eplan))(lanes), True)
    got_i = from_lanes(fourstep_mxu_lanes(lanes, mplan, inverse=True,
                                          interpret=True), True)
    np.testing.assert_array_equal(got_i, exp_i)


@pytest.mark.parametrize("logn", [12, 13])
def test_mxu_4step_row_delegation(logn, rng, monkeypatch):
    """The n2 > ROW_MATMUL_MAX branch (production path for logn >= 17,
    where rows go through the in-VMEM merge kernel) — exercised at a
    lowered threshold so it runs in interpreter mode."""
    from gpuntt_tpu.ops import pallas_mxu_4step as m4

    monkeypatch.setattr(m4, "ROW_MATMUL_MAX", 64)
    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    eplan = FourStepPlan.from_params(p)
    mplan = m4.FourStepMXUPlan.from_params(p)
    assert mplan.row_plan is not None  # delegation branch built
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    exp_f = from_lanes(jax.jit(lambda v: fourstep_ntt_lanes(v, eplan))(lanes), True)
    got_f = from_lanes(m4.fourstep_mxu_lanes(lanes, mplan, interpret=True), True)
    np.testing.assert_array_equal(got_f, exp_f)

    exp_i = from_lanes(jax.jit(lambda v: fourstep_intt_lanes(v, eplan))(lanes), True)
    got_i = from_lanes(m4.fourstep_mxu_lanes(lanes, mplan, inverse=True,
                                             interpret=True), True)
    np.testing.assert_array_equal(got_i, exp_i)


@pytest.mark.parametrize("logn", [12, 13])
def test_mxu32_4step_parity(logn, rng):
    from gpuntt_tpu.ops.pallas_mxu_4step import (FourStep32MXUPlan,
                                                 fourstep32_mxu_lanes)

    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus, dtype=np.uint32)
    eplan = FourStepPlan.from_params(p)
    mplan = FourStep32MXUPlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n),
                     dtype=np.uint64).astype(np.uint32)

    exp_f = np.asarray(jax.jit(lambda v: fourstep_ntt_lanes(v, eplan))(x))
    got_f = np.asarray(fourstep32_mxu_lanes(x, mplan, interpret=True))
    np.testing.assert_array_equal(got_f, exp_f)

    exp_i = np.asarray(jax.jit(lambda v: fourstep_intt_lanes(v, eplan))(x))
    got_i = np.asarray(fourstep32_mxu_lanes(x, mplan, inverse=True,
                                            interpret=True))
    np.testing.assert_array_equal(got_i, exp_i)


def test_mxu32_4step_row_delegation(rng, monkeypatch):
    from gpuntt_tpu.ops import pallas_mxu_4step as m4

    monkeypatch.setattr(m4, "ROW_MATMUL_MAX", 64)
    p = NTTParameters4Step(12, ReductionPolynomial.X_N_minus, dtype=np.uint32)
    eplan = FourStepPlan.from_params(p)
    mplan = m4.FourStep32MXUPlan.from_params(p)
    assert mplan.row_plan is not None
    x = rng.integers(0, p.modulus.value, size=(2, p.n),
                     dtype=np.uint64).astype(np.uint32)
    exp = np.asarray(jax.jit(lambda v: fourstep_ntt_lanes(v, eplan))(x))
    got = np.asarray(m4.fourstep32_mxu_lanes(x, mplan, interpret=True))
    np.testing.assert_array_equal(got, exp)
    expi = np.asarray(jax.jit(lambda v: fourstep_intt_lanes(v, eplan))(x))
    goti = np.asarray(m4.fourstep32_mxu_lanes(x, mplan, inverse=True,
                                              interpret=True))
    np.testing.assert_array_equal(goti, expi)
