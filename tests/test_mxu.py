"""MXU merge-NTT kernel parity (interpreter mode — CPU-runnable).

The digit-matmul factorization (balanced host digits x offset device
digits on the MXU, diagonal recombination, Horner Shoup reduction) must
be bit-exact vs the golden model for both reduction polynomials, odd
and even logn, forward and inverse.  Compiled on-TPU runs are exercised
by bench.py / verify.
"""

import numpy as np
import pytest

from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan, balanced_digits, pallas_mxu_u64


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
@pytest.mark.parametrize("logn", [8, 9, 12])
def test_mxu_u64_parity(poly, logn, rng):
    p = NTTParameters(logn, poly, dtype=np.uint64)
    plan = MXUMergePlan.from_params(p)
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(3, p.n), dtype=np.uint64)

    got = from_lanes(pallas_mxu_u64(to_lanes(x, True), plan, interpret=True), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(3)])
    np.testing.assert_array_equal(got, exp)

    back = from_lanes(
        pallas_mxu_u64(to_lanes(exp, True), plan, inverse=True, interpret=True),
        True,
    )
    np.testing.assert_array_equal(back, x)


def test_mxu_intt_matches_engine(rng):
    """Inverse kernel equals merge_intt_lanes on arbitrary residues (not
    just on forward outputs)."""
    import jax

    from gpuntt_tpu.ops.merge_ntt import MergePlan, merge_intt_lanes

    p = NTTParameters(9, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    mplan = MXUMergePlan.from_params(p)
    eplan = MergePlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    exp = from_lanes(jax.jit(lambda v: merge_intt_lanes(v, eplan))(to_lanes(x, True)), True)
    got = from_lanes(pallas_mxu_u64(to_lanes(x, True), mplan, inverse=True,
                                    interpret=True), True)
    np.testing.assert_array_equal(got, exp)


def test_balanced_digits_exact(rng):
    v = rng.integers(0, 1 << 62, size=257, dtype=np.uint64)
    d = balanced_digits(v).astype(np.int64)
    recon = np.zeros(v.shape, dtype=object)
    for i in range(d.shape[0]):
        recon += d[i].astype(object) * (256 ** i)
    assert all(int(a) == int(b) for a, b in zip(recon, v))
    assert d.max() <= 127 and d.min() >= -128


def test_mxu_plan_rejects_wide_modulus():
    # params-like object with a modulus past the q < 2^62 kernel bound
    class FakeMod:
        value = (1 << 62) + 1

    class FakeParams:
        modulus = FakeMod()
        n = 256
        logn = 8
        poly_reduction = ReductionPolynomial.X_N_minus
        root_of_unity = 3
        inverse_root_of_unity = 5
        n_inv = 7

    with pytest.raises(ValueError):
        MXUMergePlan.from_params(FakeParams())


def test_mxu_u64_small_modulus_generic_horner(rng):
    """A u64 plan over q < 2^40 (here the 30-bit prime 754974721) takes
    the GENERIC Horner product — 2^40 mod q != 2^40 — unlike the pool
    primes, which all ride the shoup_pow2_lazy shift fast path.  Keeps
    both Horner branches parity-tested."""
    from gpuntt_tpu import Modulus, NTTFactors

    q, psi = 754974721, 445365557  # 45*2^24 + 1; psi = 11^((q-1)/1024)
    omega = pow(psi, 2, q)
    fac = NTTFactors(Modulus(q), omega, psi)
    p = NTTParameters(9, ReductionPolynomial.X_N_plus, factors=fac,
                      dtype=np.uint64)
    plan = MXUMergePlan.from_params(p)
    assert plan.r40 != 1 << 40
    gen = NTTCPU(p)
    x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64)
    got = from_lanes(pallas_mxu_u64(to_lanes(x, True), plan,
                                    interpret=True), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(pallas_mxu_u64(to_lanes(exp, True), plan,
                                     inverse=True, interpret=True), True)
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
def test_mxu_u32_parity(poly, rng):
    """The 4-digit u32 variant (non-default engine) stays bit-exact."""
    from gpuntt_tpu.ops.pallas_mxu32 import MXU32Plan, pallas_mxu_u32

    p = NTTParameters(9, poly, dtype=np.uint32)
    plan = MXU32Plan.from_params(p)
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n),
                     dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pallas_mxu_u32(x, plan, interpret=True))
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = np.asarray(pallas_mxu_u32(exp.astype(np.uint32), plan,
                                     inverse=True, interpret=True))
    np.testing.assert_array_equal(back, x)


def test_mxu_u32_logn17_top_level(rng):
    """logn 17 is the u32 in-VMEM MXU engine's top-level size (r3): the
    whole-block VPU kernel overflows scoped VMEM there (22.11M vs 16M,
    benchmarks/u32vpu_diag.py), so dispatch routes u32 2^17 through ONE
    MXU digit-matmul block (A=256 x B=512).  Bit-exact both directions."""
    from gpuntt_tpu.ops.pallas_mxu32 import MXU32Plan, pallas_mxu_u32

    p = NTTParameters(17, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    plan = MXU32Plan.from_params(p)
    assert plan.A == 256 and plan.B == 512
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(1, p.n),
                     dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pallas_mxu_u32(x, plan, interpret=True))
    exp = gen.ntt(x[0])[None]
    np.testing.assert_array_equal(got, exp)
    back = np.asarray(pallas_mxu_u32(exp.astype(np.uint32), plan,
                                     inverse=True, interpret=True))
    np.testing.assert_array_equal(back, x)


def test_auto_digit_count_by_modulus_width(rng):
    """Narrow moduli get fewer balanced digits automatically (r5):
    nd=7 for q < 2^55, nd=6 for q < ~2^46.4 — 13/11 diagonals instead
    of 15, chip-measured -15%/-32% (benchmarks/nd_diag.py) — with the
    61-bit pool primes unchanged at nd=8.  Bit-exact at every width,
    both directions, through from_params (the dispatch path)."""
    from gpuntt_tpu import NTTFactors
    from gpuntt_tpu.arith.host import find_ntt_primes, ntt_root_pair
    from gpuntt_tpu.arith.modulus import Modulus64
    from gpuntt_tpu.ops.pallas_mxu import auto_nd

    p_pool = NTTParameters(9, ReductionPolynomial.X_N_plus,
                           dtype=np.uint64)
    assert auto_nd(p_pool.modulus.value) == 8  # 61-bit pool: unchanged
    for bits, want_nd in ((54, 7), (46, 6)):
        q = find_ntt_primes(bits, 9, 1)[0]
        assert auto_nd(q) == want_nd
        om, psi = ntt_root_pair(q, 9)
        p = NTTParameters(9, ReductionPolynomial.X_N_plus,
                          dtype=np.uint64,
                          factors=NTTFactors(Modulus64(q), om, psi))
        plan = MXUMergePlan.from_params(p)
        assert plan.fwd_left.shape[0] == want_nd
        gen = NTTCPU(p)
        x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64)
        got = from_lanes(pallas_mxu_u64(to_lanes(x, True), plan,
                                        interpret=True), True)
        exp = np.stack([gen.ntt(x[i]) for i in range(2)])
        np.testing.assert_array_equal(got, exp)
        back = from_lanes(pallas_mxu_u64(to_lanes(exp, True), plan,
                                         inverse=True, interpret=True),
                          True)
        np.testing.assert_array_equal(back, x)
