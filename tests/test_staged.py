"""Staged big-N phase executors (interpreter mode — CPU-runnable).

The logn >= 24 dispatch runs each phase as its own CACHED jitted
program (the TPU analog of the reference's multi-launch big-N plans,
ntt.cuh:665-698) — these tests pin (a) bit-exactness of the staged
composition against the one-program engines and the golden models at
reduced splits, and (b) that repeat calls hit the jit cache instead of
re-lowering (round 2's 10.6 s/NTT at merge 2^24 was per-call
re-lowering of eagerly built pallas_call closures).
"""

import numpy as np
import pytest

import jax

from gpuntt_tpu import (NTTCPU, NTTParameters, NTTParameters4Step,
                        ReductionPolynomial)
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
from gpuntt_tpu.ops.pallas_mxu import plan_to_device


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
def test_staged_merge_parity(poly, rng):
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 staged_mxu_large_u64)

    p = NTTParameters(13, poly, dtype=np.uint64)
    plan = plan_to_device(MXULargePlan.from_params(p, a_col=4))
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    got = from_lanes(staged_mxu_large_u64(to_lanes(x, True), plan,
                                          interpret=True), True)
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(staged_mxu_large_u64(to_lanes(exp, True), plan,
                                           inverse=True, interpret=True),
                      True)
    np.testing.assert_array_equal(back, x)


def test_staged_merge_jit_cache_stable(rng):
    """Repeat staged calls must not add jit cache entries (the fix for
    the round-2 per-call re-lowering)."""
    import gpuntt_tpu.ops.pallas_mxu_large as M

    p = NTTParameters(13, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    plan = plan_to_device(M.MXULargePlan.from_params(p, a_col=4))
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)
    M.staged_mxu_large_u64(lanes, plan, interpret=True)
    n_col = M._col_phase._cache_size()
    n_row = M._row_phase._cache_size()
    for _ in range(3):
        M.staged_mxu_large_u64(lanes, plan, interpret=True)
    assert M._col_phase._cache_size() == n_col
    assert M._row_phase._cache_size() == n_row


def test_staged_merge_recursive_rows(rng):
    """Nested MXULargePlan rows (production logn 27-28 shape) through
    the staged executor."""
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 staged_mxu_large_u64)

    p = NTTParameters(14, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p.modulus.value
    plan = plan_to_device(MXULargePlan.from_spec(
        q, p.logn, p.root_of_unity, p.inverse_root_of_unity, True,
        pow(p.n, q - 2, q), a_col=8, max_row_logn=9, row_kwargs=dict(a_col=8)))
    assert isinstance(plan.row_plan, MXULargePlan)
    gen = NTTCPU(p)
    x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    got = from_lanes(staged_mxu_large_u64(to_lanes(x, True), plan,
                                          interpret=True), True)
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(staged_mxu_large_u64(to_lanes(exp, True), plan,
                                           inverse=True, interpret=True),
                      True)
    np.testing.assert_array_equal(back, x)


def test_staged_merge_fwd_split_rows(rng):
    """logB == max_row_logn + 1 (production merge 2^26): BOTH
    directions delegate rows to the in-VMEM kernel (2 programs each,
    r5 — the inverse carries the raised scoped-VMEM cap; pre-r5 only
    the forward delegated) — both bit-exact, reduced split."""
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 staged_mxu_large_u64)

    p = NTTParameters(14, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p.modulus.value
    assert q < 1 << 60  # the split is gated on the non-wide combine
    plan = MXULargePlan.from_spec(
        q, p.logn, p.root_of_unity, p.inverse_root_of_unity, True,
        pow(p.n, q - 2, q), a_col=8, max_row_logn=10)
    assert isinstance(plan.row_plan_fwd, MXUMergePlan)
    assert isinstance(plan.row_plan_inv, MXUMergePlan)
    assert plan.row_plan is None  # no nested plan is built at all (r5)
    plan = plan_to_device(plan)
    gen = NTTCPU(p)
    x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    got = from_lanes(staged_mxu_large_u64(to_lanes(x, True), plan,
                                          interpret=True), True)
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(staged_mxu_large_u64(to_lanes(exp, True), plan,
                                           inverse=True, interpret=True),
                      True)
    np.testing.assert_array_equal(back, x)


def test_fwd_split_gate_structure():
    """The delegated row plans exist exactly at
    logB == max_row_logn + 1, each stripped to its direction's tables
    (fwd_only/inv_only, ADVICE r3), the inverse carrying the raised
    scoped-VMEM cap (r5).  Checked at a small spec with the gate
    arithmetic scaled down (ADVICE r3: building the full 2^26/2^27
    plans host-side costs minutes for two attribute asserts; the
    production logB == 17 gate has chip evidence in RESULTS_r3/r5) plus
    a direct check of the production gate arithmetic."""
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan
    from gpuntt_tpu.ops.pallas_mxu_large import MXULargePlan

    p = NTTParameters(14, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    q = p.modulus.value
    # logB = 14 - 3 = 11 == max_row_logn + 1 -> delegated rows
    plan = MXULargePlan.from_spec(
        q, p.logn, p.root_of_unity, p.inverse_root_of_unity, False,
        pow(p.n, q - 2, q), a_col=8, max_row_logn=10)
    assert isinstance(plan.row_plan_fwd, MXUMergePlan)
    assert isinstance(plan.row_plan_inv, MXUMergePlan)
    assert plan.row_plan is None
    # each direction ships only its own tables (ADVICE r3)
    assert plan.row_plan_fwd.inv_left is None
    assert plan.row_plan_fwd.w_inv is None
    assert plan.row_plan_inv.fwd_left is None
    assert plan.row_plan_inv.w_fwd is None
    # the inverse kernel needs the raised scoped-VMEM cap (16.66M at
    # 2^17 vs the 16M Mosaic default); the forward keeps the default
    assert plan.row_plan_inv.vmem_limit > (1 << 24)
    assert plan.row_plan_fwd.vmem_limit == 0
    # logB = 15 - 3 = 12 > max_row_logn + 1 -> recursion only, no split
    p15 = NTTParameters(15, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    plan15 = MXULargePlan.from_spec(
        q, 15, p15.root_of_unity, p15.inverse_root_of_unity, False,
        pow(p15.n, q - 2, q), a_col=8, max_row_logn=10,
        row_kwargs=dict(a_col=8))
    assert plan15.row_plan_fwd is None
    # production gate arithmetic: logn 26 with the A-rule (A=512 above
    # 24) gives logB = 26 - 9 = 17 = default max_row_logn + 1 (split
    # fires); 27 gives logB 18 (recursion only)
    assert 26 - 9 == 16 + 1 and 27 - 9 > 16 + 1


@pytest.mark.parametrize("delegate_rows", [False, True])
def test_staged_fourstep_parity(delegate_rows, rng, monkeypatch):
    """Staged u64 4-step executor vs the XLA 4-step engine, both row
    variants (matmul rows and merge-kernel delegation — the production
    logn >= 17 and 24 shapes)."""
    from gpuntt_tpu.ops import pallas_mxu_4step as m4
    from gpuntt_tpu.ops.fourstep import (FourStepPlan, fourstep_intt_lanes,
                                         fourstep_ntt_lanes)

    if delegate_rows:
        monkeypatch.setattr(m4, "ROW_MATMUL_MAX", 64)
    p = NTTParameters4Step(12, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    eplan = FourStepPlan.from_params(p)
    mplan = plan_to_device(m4.FourStepMXUPlan.from_params(p))
    assert (mplan.row_plan is not None) == delegate_rows
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    exp_f = from_lanes(
        jax.jit(lambda v: fourstep_ntt_lanes(v, eplan))(lanes), True)
    got_f = from_lanes(
        m4.staged_fourstep_mxu_lanes(lanes, mplan, interpret=True), True)
    np.testing.assert_array_equal(got_f, exp_f)

    exp_i = from_lanes(
        jax.jit(lambda v: fourstep_intt_lanes(v, eplan))(lanes), True)
    got_i = from_lanes(
        m4.staged_fourstep_mxu_lanes(lanes, mplan, inverse=True,
                                     interpret=True), True)
    np.testing.assert_array_equal(got_i, exp_i)


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
def test_fused_polymul_inverse_kernel(poly, rng):
    """pallas_mxu_polymul_inv_u64 (pointwise product fused into the
    inverse kernel) must be bit-identical to pointwise-then-INTT, i.e.
    to the schoolbook polynomial product."""
    from gpuntt_tpu import schoolbook_poly_multiplication
    from gpuntt_tpu.ops.pallas_mxu import (MXUMergePlan,
                                           pallas_mxu_polymul_inv_u64)

    p = NTTParameters(12, poly, dtype=np.uint64)
    mp = plan_to_device(MXUMergePlan.from_params(p))
    gen = NTTCPU(p)
    a = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    b = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    fa = np.stack([gen.ntt(a[i]) for i in range(2)])
    fb = np.stack([gen.ntt(b[i]) for i in range(2)])
    got = from_lanes(
        pallas_mxu_polymul_inv_u64(to_lanes(fa, True), to_lanes(fb, True),
                                   mp, interpret=True), True)
    exp = np.stack([
        schoolbook_poly_multiplication(a[i], b[i], p.modulus,
                                       p.poly_reduction)
        for i in range(2)])
    np.testing.assert_array_equal(got, exp)


def test_fused_polymul_inverse_large(rng):
    """Large-ring fused variant (product inside the row-phase kernel)
    at a reduced split with delegated MXUMergePlan rows."""
    from gpuntt_tpu import schoolbook_poly_multiplication
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan
    from gpuntt_tpu.ops.pallas_mxu_large import (
        MXULargePlan, pallas_mxu_large_polymul_inv, pallas_mxu_large_u64)

    p = NTTParameters(13, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = plan_to_device(MXULargePlan.from_params(p, a_col=4))
    assert isinstance(plan.row_plan, MXUMergePlan)
    a = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    b = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    fa = pallas_mxu_large_u64(to_lanes(a, True), plan, interpret=True)
    fb = pallas_mxu_large_u64(to_lanes(b, True), plan, interpret=True)
    got = from_lanes(
        pallas_mxu_large_polymul_inv(fa, fb, plan, interpret=True), True)
    exp = np.stack([
        schoolbook_poly_multiplication(a[i], b[i], p.modulus,
                                       p.poly_reduction)
        for i in range(2)])
    np.testing.assert_array_equal(got, exp)


def test_staged_merge32_parity(rng):
    """u32 staged route (merge 24-25 analog) at a reduced split."""
    from gpuntt_tpu.ops.pallas_mxu32 import MXU32LargePlan, staged_mxu32_large

    p = NTTParameters(13, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    plan = plan_to_device(MXU32LargePlan.from_params(p, a_col=16))
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n),
                     dtype=np.uint64).astype(np.uint32)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    got = np.asarray(staged_mxu32_large(x, plan, interpret=True))
    np.testing.assert_array_equal(got, exp)
    back = np.asarray(staged_mxu32_large(exp, plan, inverse=True,
                                         interpret=True))
    np.testing.assert_array_equal(back, x)


def test_staged_polymul_fused(rng):
    """staged_mxu_large_polymul (product fused into the row-inverse
    phase program, merge 24-25 shape) == schoolbook, at a reduced
    split with delegated MXUMergePlan rows."""
    from gpuntt_tpu import schoolbook_poly_multiplication
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 staged_mxu_large_polymul)

    p = NTTParameters(13, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = plan_to_device(MXULargePlan.from_params(p, a_col=4))
    assert isinstance(plan.row_plan, MXUMergePlan)
    a = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    b = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    got = from_lanes(
        staged_mxu_large_polymul(to_lanes(a, True), to_lanes(b, True),
                                 plan, interpret=True), True)
    exp = np.stack([
        schoolbook_poly_multiplication(a[i], b[i], p.modulus,
                                       p.poly_reduction)
        for i in range(2)])
    np.testing.assert_array_equal(got, exp)


def test_staged_polymul_recursive_rows_raise(rng):
    """Recursive-row plans (merge 26-28) reject the fused entry —
    dispatch.staged_polymul_lanes then runs the unfused staged chain."""
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 staged_mxu_large_polymul)

    p = NTTParameters(14, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p.modulus.value
    plan = plan_to_device(MXULargePlan.from_spec(
        q, p.logn, p.root_of_unity, p.inverse_root_of_unity, True,
        pow(p.n, q - 2, q), a_col=8, max_row_logn=9, row_kwargs=dict(a_col=8)))
    x = to_lanes(rng.integers(0, q, size=(1, p.n), dtype=np.uint64), True)
    with pytest.raises(ValueError, match="MXUMergePlan rows"):
        staged_mxu_large_polymul(x, x, plan, interpret=True)


def test_staged_fourstep32_parity(rng):
    from gpuntt_tpu.ops import pallas_mxu_4step as m4
    from gpuntt_tpu.ops.fourstep import (FourStepPlan, fourstep_intt_lanes,
                                         fourstep_ntt_lanes)

    p = NTTParameters4Step(12, ReductionPolynomial.X_N_minus,
                           dtype=np.uint32)
    eplan = FourStepPlan.from_params(p)
    mplan = plan_to_device(m4.FourStep32MXUPlan.from_params(p))
    x = rng.integers(0, p.modulus.value, size=(2, p.n),
                     dtype=np.uint64).astype(np.uint32)

    exp_f = np.asarray(
        jax.jit(lambda v: fourstep_ntt_lanes(v, eplan))(x))
    got_f = np.asarray(
        m4.staged_fourstep32_mxu_lanes(x, mplan, interpret=True))
    np.testing.assert_array_equal(got_f, exp_f)

    exp_i = np.asarray(
        jax.jit(lambda v: fourstep_intt_lanes(v, eplan))(x))
    got_i = np.asarray(
        m4.staged_fourstep32_mxu_lanes(x, mplan, inverse=True,
                                       interpret=True))
    np.testing.assert_array_equal(got_i, exp_i)
