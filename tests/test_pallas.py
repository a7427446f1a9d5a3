"""Pallas kernel parity (interpreter mode — CPU-runnable).

The factorized kernel identity (merge == rowNTT . W . colNTT on the
(A, 128) view) plus the lazy Harvey arithmetic must be bit-exact vs the
golden for both dtypes and reduction polynomials.  On-TPU compiled runs
are exercised by bench.py / verify.
"""

import numpy as np
import pytest

from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
from gpuntt_tpu.ops.pallas_merge import KernelMergePlan
from gpuntt_tpu.ops.pallas_merge2 import pallas_merge2_u32
from gpuntt_tpu.ops.pallas_merge64 import pallas_merge2_u64


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
@pytest.mark.parametrize("logn", [8, 11, 13])
def test_pallas_u32_parity(poly, logn, rng):
    p = NTTParameters(logn, poly, dtype=np.uint32)
    plan = KernelMergePlan.from_params(p)
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(4, p.n), dtype=np.uint64).astype(np.uint32)

    got = np.asarray(pallas_merge2_u32(x, plan, interpret=True))
    exp = np.stack([gen.ntt(x[i]) for i in range(4)])
    np.testing.assert_array_equal(got, exp)

    back = np.asarray(
        pallas_merge2_u32(exp.astype(np.uint32), plan, inverse=True, interpret=True)
    )
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
@pytest.mark.parametrize("logn", [8, 12])
def test_pallas_u64_parity(poly, logn, rng):
    p = NTTParameters(logn, poly, dtype=np.uint64)
    plan = KernelMergePlan.from_params(p)
    gen = NTTCPU(p)
    x = rng.integers(0, p.modulus.value, size=(4, p.n), dtype=np.uint64)

    got = from_lanes(pallas_merge2_u64(to_lanes(x, True), plan, interpret=True), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(4)])
    np.testing.assert_array_equal(got, exp)

    back = from_lanes(
        pallas_merge2_u64(to_lanes(exp, True), plan, inverse=True, interpret=True),
        True,
    )
    np.testing.assert_array_equal(back, x)


def test_lazy_shoup_bounds(rng):
    """shoup_mul*_lazy outputs stay under their documented bounds for
    adversarial inputs (full-range x, w near q)."""
    import jax.numpy as jnp

    from gpuntt_tpu.ops import barrett as bo
    from gpuntt_tpu.ops.limb import u64_from_numpy, u64_to_numpy

    q = 469762049  # 29-bit pool modulus
    x = rng.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
    w = np.uint32(q - 1)
    ws = np.uint32(((q - 1) << 32) // q)
    r = np.asarray(bo.shoup_mul32_lazy(jnp.asarray(x), jnp.uint32(w), jnp.uint32(ws), q))
    assert (r.astype(np.uint64) < 2 * q).all()
    assert ((r.astype(np.uint64) - (x.astype(np.uint64) * w) % q) % q == 0).all()

    q64 = 576460756061519873
    x64 = rng.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    w64 = q64 - 1
    ws64 = ((q64 - 1) << 64) // q64
    r64 = u64_to_numpy(
        bo.shoup_mul64_lazy(
            u64_from_numpy(x64),
            bo.u64_const(w64),
            bo.u64_const(ws64),
            bo.u64_const(q64),
        )
    )
    assert (r64 < 3 * q64).all()
    for i in range(0, 4096, 111):
        assert (int(r64[i]) - int(x64[i]) * w64) % q64 == 0
