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
def test_mxu_large_recursive_rows(poly, rng):
    """Rows beyond max_row_logn recurse into a nested MXULargePlan —
    the production logn 27-28 composition, exercised at a reduced split
    (A=8, nested A=8) so interpret mode stays cheap."""
    p = NTTParameters(14, poly, dtype=np.uint64)
    q = p.modulus.value
    plan = MXULargePlan.from_spec(
        q, p.logn, p.root_of_unity, p.inverse_root_of_unity,
        poly == ReductionPolynomial.X_N_plus, pow(p.n, q - 2, q),
        a_col=8, max_row_logn=9, row_kwargs=dict(a_col=8))
    assert isinstance(plan.row_plan, MXULargePlan)
    assert plan.row_plan.row_plan is None  # nested rows: single matmul
    gen = NTTCPU(p)
    x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64)
    got = from_lanes(
        pallas_mxu_large_u64(to_lanes(x, True), plan, interpret=True), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(
        pallas_mxu_large_u64(to_lanes(exp, True), plan, inverse=True,
                             interpret=True), True)
    np.testing.assert_array_equal(back, x)


def test_mxu_large_bigring_plan_shapes():
    """Default splits for the logn 24-28 range: A capped at 512 (the
    diagonal-accumulator exactness bound), rows in the in-VMEM kernel
    through 2^16 rows (logn 24-25), recursion beyond (logn 26-28: the
    in-VMEM inverse kernel exceeds scoped VMEM at 2^17,
    chiplog/r3_merge26.out)."""
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan

    p24 = NTTParameters(24, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    pl24 = MXULargePlan.from_params(p24)
    assert (pl24.A, pl24.B) == (256, 1 << 16)
    assert isinstance(pl24.row_plan, MXUMergePlan)
    p25 = NTTParameters(25, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    pl25 = MXULargePlan.from_params(p25)
    assert pl25.A == 512 and pl25.A * pl25.B == 1 << 25
    assert isinstance(pl25.row_plan, MXUMergePlan)
    # 2^26 rows (2^17) delegate BOTH directions since r5 (no nesting)
    p26 = NTTParameters(26, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    pl26 = MXULargePlan.from_params(p26)
    assert pl26.A == 512 and pl26.row_plan is None
    assert pl26.row_plan_fwd is not None and pl26.row_plan_inv is not None
    for lg in (27, 28):
        p = NTTParameters(lg, ReductionPolynomial.X_N_plus, dtype=np.uint64)
        pl = MXULargePlan.from_params(p)
        assert pl.A == 512
        assert isinstance(pl.row_plan, MXULargePlan)
        assert pl.row_plan.A <= 512
    # logn 18 splits by CONSUMER: from_params feeds the composed
    # single-program route, where the balanced A=512 split's ~8 MB of
    # inline digit tables crash the relay compile helper (6.4 MB MLIR,
    # benchmarks/merge18_diag.py r3) — it gets A=128 with delegated
    # rows; from_spec keeps A=512 for the staged/recursion consumers
    # (2^27 row phase), whose plans ride as jit arguments.
    p18 = NTTParameters(18, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    pl18 = MXULargePlan.from_params(p18)
    assert pl18.A == 128 and isinstance(pl18.row_plan, MXUMergePlan)
    q = p18.modulus.value
    pl18s = MXULargePlan.from_spec(
        q, 18, p18.root_of_unity, p18.inverse_root_of_unity, True,
        pow(p18.n, q - 2, q))
    assert pl18s.A == 512 and pl18s.row_plan is None


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
