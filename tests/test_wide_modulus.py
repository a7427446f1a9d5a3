"""Wide-modulus coverage: q in [2^60, 2^62) for u64, 30-bit for u32.

The reference documents Barrett validity for moduli up to 62 bits
(u64) / 30 bits (u32) (modular_arith.cuh:66-67).  The MXU digit-matmul
paths require q < 2^60, so this range MUST decline off them and stay
exact on the Shoup/Barrett butterfly engines — asserted here against
the golden models (the native oracle's __int128 mulmod is exact for
q < 2^63).

Primes found by Miller-Rabin search with q ≡ 1 (mod 2N) and psi of
exact order 2N; omega = psi^2.
"""

import numpy as np
import pytest

import jax

from gpuntt_tpu import (NTTCPU, NTTFactors, NTTParameters,
                        ReductionPolynomial)
from gpuntt_tpu.arith.modulus import Modulus32, Modulus64
from gpuntt_tpu.ops import dispatch
from gpuntt_tpu.ops.merge_ntt import (MergePlan, from_lanes, merge_intt_lanes,
                                      merge_ntt_lanes, to_lanes)
from gpuntt_tpu.params.merge import NTTLayout

# (q, psi) with psi of order 2^13 (logn 12)
WIDE61 = (1152921504606904321, 372252312640463555)
WIDE62 = (4611684918915809281, 4166544109213919754)
# psi of order 2^25 (logn 24) for the staged-route gate
WIDE61_L24 = (1152921504942391297, 723091248622492857)
# 30-bit u32 prime, psi of order 2^13
U32_30BIT = (1072766977, 685863465)


def _params(logn, q, psi, poly, dtype=np.uint64):
    mod = Modulus64(q) if dtype == np.uint64 else Modulus32(q)
    return NTTParameters(
        logn, poly, dtype=dtype,
        factors=NTTFactors(mod, psi * psi % q, psi))


@pytest.mark.parametrize("q,psi", [WIDE61, WIDE62])
def test_mxu_plans_decline_wide_modulus(q, psi):
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan
    from gpuntt_tpu.ops.pallas_mxu_large import MXULargePlan

    p = _params(12, q, psi, ReductionPolynomial.X_N_plus)
    with pytest.raises(ValueError, match="2\\^60"):
        MXUMergePlan.from_params(p)
    with pytest.raises(ValueError, match="2\\^60"):
        MXULargePlan.from_params(p)


@pytest.mark.parametrize("q,psi", [WIDE61, WIDE62])
def test_dispatch_declines_wide_modulus(q, psi, monkeypatch):
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    p = _params(12, q, psi, ReductionPolynomial.X_N_plus)
    plan = MergePlan.from_params(p)
    assert dispatch._kernel_path(plan, (4, p.n),
                                 NTTLayout.PerPolynomial) is None


def test_staged_route_declines_wide_modulus(monkeypatch):
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    q, psi = WIDE61_L24
    p = _params(24, q, psi, ReductionPolynomial.X_N_plus)
    plan = MergePlan.from_params(p)
    lanes = to_lanes(np.zeros((1, p.n), dtype=np.uint64), True)
    assert dispatch._staged_route(lanes, plan, NTTLayout.PerPolynomial,
                                  inverse=False) is None


@pytest.mark.parametrize("q,psi", [WIDE61, WIDE62])
@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus])
def test_xla_engine_exact_wide_modulus(q, psi, poly, rng):
    """Shoup butterfly engines stay bit-exact for q up to the 62-bit
    documented bound (lazy bound 3q < 2^64 over the transform)."""
    p = _params(12, q, psi, poly)
    plan = MergePlan.from_params(p)
    gen = NTTCPU(p)
    x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64)
    got = from_lanes(
        jax.jit(lambda v: merge_ntt_lanes(v, plan))(to_lanes(x, True)), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(
        jax.jit(lambda v: merge_intt_lanes(v, plan))(to_lanes(exp, True)),
        True)
    np.testing.assert_array_equal(back, x)


def test_u32_engine_exact_30bit_modulus(rng):
    """u32 at the reference's 30-bit modulus bound."""
    q, psi = U32_30BIT
    p = _params(12, q, psi, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    plan = MergePlan.from_params(p)
    gen = NTTCPU(p)
    x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64).astype(np.uint32)
    got = from_lanes(
        jax.jit(lambda v: merge_ntt_lanes(v, plan))(to_lanes(x, False)),
        False)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(
        jax.jit(lambda v: merge_intt_lanes(v, plan))(to_lanes(exp, False)),
        False)
    np.testing.assert_array_equal(back, x)
