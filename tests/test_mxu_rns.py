"""Single-kernel RNS MXU engine (scalar-prefetch table gather) parity.

Bit-exactness vs the XLA RNS engine for cyclic and arbitrary (ordered)
modulus schedules, both directions, in interpret mode on CPU; the
compiled route is driven on the real chip by the verify recipe
(measured 2.5x the XLA RNS engine at 2^16 x 96, 3 moduli).
"""

import numpy as np
import pytest

from gpuntt_tpu import (Modulus64, NTTFactors, NTTParameters,
                        ReductionPolynomial)
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
from gpuntt_tpu.ops.pallas_mxu_rns import MXURNSPlan, pallas_mxu_rns_u64
from gpuntt_tpu.arith.host import find_ntt_primes, ntt_root_pair
from gpuntt_tpu.ops.rns import RNSMergePlan, rns_intt_lanes, rns_ntt_lanes

LOGN = 12


def _member(q, logn, poly):
    om, psi = ntt_root_pair(q, logn)
    return NTTParameters(logn, poly, dtype=np.uint64,
                         factors=NTTFactors(Modulus64(q), om, psi))


@pytest.fixture(scope="module")
def rns_setup():
    poly = ReductionPolynomial.X_N_plus
    members = [_member(q, LOGN,  poly) for q in
               (576460752303415297, 576460752303439873, 576460752304439297)]
    return (RNSMergePlan.from_params(members),
            MXURNSPlan.from_members(members))


@pytest.mark.parametrize("schedule", ["cyclic", "ordered"])
def test_rns_mxu_single_kernel_parity(rns_setup, schedule, rng):
    plan, rplan = rns_setup
    batch = 5
    n = 1 << LOGN
    if schedule == "cyclic":
        mod_idx = (np.arange(batch) % plan.mod_count).astype(np.int64)
    else:
        mod_idx = np.array([2, 0, 1, 2, 0], dtype=np.int64)
    qs = np.array(plan.qs, dtype=np.uint64)
    x = np.stack([rng.integers(0, qs[mod_idx[b]], n, dtype=np.uint64)
                  for b in range(batch)])
    lanes = to_lanes(x, True)

    exp = from_lanes(rns_ntt_lanes(lanes, plan, mod_idx), True)
    got = from_lanes(
        pallas_mxu_rns_u64(lanes, rplan, mod_idx, interpret=True), True)
    np.testing.assert_array_equal(got, exp)

    exp_i = from_lanes(rns_intt_lanes(to_lanes(exp, True), plan, mod_idx), True)
    got_i = from_lanes(
        pallas_mxu_rns_u64(to_lanes(exp, True), rplan, mod_idx,
                           inverse=True, interpret=True), True)
    np.testing.assert_array_equal(got_i, exp_i)
    np.testing.assert_array_equal(got_i, x)


def test_rns_mxu_plan_rejects_mixed_splits():
    """Members of different logn can't share stacked tables; the plan
    builder refuses (dispatch then falls back)."""
    poly = ReductionPolynomial.X_N_plus
    a = _member(576460752303415297, 12, poly)
    with pytest.raises(ValueError):
        MXURNSPlan.from_members(
            [a, _member(576460752303439873, 13, poly)])




@pytest.mark.parametrize("logn", [14, 17])
def test_large_ring_rns_parity(logn, rng):
    """Large-ring RNS composition (stacked column kernel + rows): logn 14
    exercises the single-matmul-row branch (B <= 512), logn 17 the
    nested-row branch (rows through the stacked in-VMEM RNS kernel).
    Reference: the XLA RNS engine."""
    from gpuntt_tpu.ops.pallas_mxu_rns import (MXULargeRNSPlan,
                                               pallas_mxu_large_rns_u64)

    poly = ReductionPolynomial.X_N_plus
    members = [_member(q, logn, poly) for q in find_ntt_primes(59, logn, 2)]
    plan = RNSMergePlan.from_params(members)
    lplan = MXULargeRNSPlan.from_members(members)
    assert (lplan.row_rns is None) == (logn == 14)
    batch = 3
    mod_idx = np.array([0, 1, 0], dtype=np.int64)
    qs = np.array(plan.qs, dtype=np.uint64)
    x = np.stack([rng.integers(0, qs[mod_idx[b]], 1 << logn, dtype=np.uint64)
                  for b in range(batch)])
    lanes = to_lanes(x, True)

    exp = from_lanes(rns_ntt_lanes(lanes, plan, mod_idx), True)
    got = from_lanes(
        pallas_mxu_large_rns_u64(lanes, lplan, mod_idx, interpret=True), True)
    np.testing.assert_array_equal(got, exp)

    back = from_lanes(
        pallas_mxu_large_rns_u64(to_lanes(exp, True), lplan, mod_idx,
                                 inverse=True, interpret=True), True)
    np.testing.assert_array_equal(back, x)


def test_u32_rns_single_kernel_parity(rng):
    """The u32 stacked kernel (4-digit machinery, per-modulus constants
    incl. the Barrett-by-one companion) matches the XLA RNS engine."""
    import jax.numpy as jnp

    from gpuntt_tpu import Modulus32
    from gpuntt_tpu.ops.pallas_mxu_rns import MXU32RNSPlan, pallas_mxu32_rns

    def member32(q, logn):
        om, psi = ntt_root_pair(q, logn)
        return NTTParameters(
            logn, ReductionPolynomial.X_N_plus, dtype=np.uint32,
            factors=NTTFactors(Modulus32(q), om, psi))

    members = [member32(q, LOGN) for q in (268460033, 268582913, 268664833)]
    plan = RNSMergePlan.from_params(members)
    rplan = MXU32RNSPlan.from_members(members)
    batch = 5
    mod_idx = np.array([1, 2, 0, 2, 1], dtype=np.int64)
    qs = np.array(plan.qs, dtype=np.uint64)
    x = np.stack([rng.integers(0, qs[mod_idx[b]], 1 << LOGN,
                               dtype=np.uint64)
                  for b in range(batch)]).astype(np.uint32)

    exp = np.asarray(rns_ntt_lanes(jnp.asarray(x), plan, mod_idx))
    got = np.asarray(
        pallas_mxu32_rns(jnp.asarray(x), rplan, mod_idx, interpret=True))
    np.testing.assert_array_equal(got, exp)

    exp_i = np.asarray(rns_intt_lanes(jnp.asarray(exp), plan, mod_idx))
    got_i = np.asarray(
        pallas_mxu32_rns(jnp.asarray(exp), rplan, mod_idx,
                         inverse=True, interpret=True))
    np.testing.assert_array_equal(got_i, exp_i)
    np.testing.assert_array_equal(got_i, x)
