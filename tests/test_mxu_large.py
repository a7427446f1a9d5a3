"""Large-ring MXU composition parity (interpreter mode — CPU-runnable).

The six-step composition (column digit-matmul kernel with factored W,
then the in-VMEM MXU kernel over rows) must be bit-exact vs the golden
for both reduction polynomials, forward and inverse.  Tests run at a
reduced a_col so small rings exercise the exact production code path;
full-size on-TPU runs are exercised by benchmarks/sweep.py.
"""

import numpy as np
import pytest

from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
from gpuntt_tpu.ops.pallas_mxu_large import MXULargePlan, pallas_mxu_large_u64


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
@pytest.mark.parametrize("logn,a_col", [(13, 4), (14, 8)])
def test_mxu_large_parity(poly, logn, a_col, rng):
    p = NTTParameters(logn, poly, dtype=np.uint64)
    plan = MXULargePlan.from_params(p, a_col=a_col)
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)

    got = from_lanes(
        pallas_mxu_large_u64(to_lanes(x, True), plan, interpret=True), True
    )
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)

    back = from_lanes(
        pallas_mxu_large_u64(to_lanes(exp, True), plan, inverse=True,
                             interpret=True),
        True,
    )
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
def test_mxu32_large_parity(poly, rng):
    """The u32 large-ring composition at a reduced a_col."""
    from gpuntt_tpu.ops.pallas_mxu32 import MXU32LargePlan, pallas_mxu32_large

    p = NTTParameters(13, poly, dtype=np.uint32)
    plan = MXU32LargePlan.from_params(p, a_col=4)
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n),
                     dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pallas_mxu32_large(x, plan, interpret=True))
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = np.asarray(pallas_mxu32_large(exp.astype(np.uint32), plan,
                                         inverse=True, interpret=True))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
def test_mxu_large_row_matmul_branch(poly, rng):
    """B <= 512 takes the single-matmul row branch (production: logn 18)."""
    p = NTTParameters(13, poly, dtype=np.uint64)
    plan = MXULargePlan.from_params(p, a_col=32)  # B = 256
    assert plan.row_plan is None and plan.row_fwd is not None
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    got = from_lanes(
        pallas_mxu_large_u64(to_lanes(x, True), plan, interpret=True), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(
        pallas_mxu_large_u64(to_lanes(exp, True), plan, inverse=True,
                             interpret=True), True)
    np.testing.assert_array_equal(back, x)
