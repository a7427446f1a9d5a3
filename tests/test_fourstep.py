"""4-step engine parity vs golden model.

Mirrors gpu_4step_ntt_examples / gpu_4step_intt_examples
(test_4step_ntt.cu:147-178, test_4step_intt.cu:83-88, :151-179):
the GPU-convention core (caller-side transposes) and the full pipeline
must be bit-exact vs NTT_4STEP_CPU.
"""

import numpy as np
import pytest

import jax

from gpuntt_tpu import (
    NTT4StepCPU,
    NTTParameters4Step,
    ReductionPolynomial,
)
from gpuntt_tpu.ops.fourstep import (
    FourStepPlan,
    fourstep_intt_full,
    fourstep_intt_lanes,
    fourstep_ntt_full,
    fourstep_ntt_lanes,
    transpose_lanes,
)
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
@pytest.mark.parametrize("logn", [12, 13])
def test_fourstep_forward_parity(dtype, logn, rng):
    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus, dtype=dtype)
    plan = FourStepPlan.from_params(p)
    gen = NTT4StepCPU(p)
    batch = 2
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64).astype(dtype)

    got = from_lanes(
        jax.jit(lambda v: fourstep_ntt_full(v, plan))(to_lanes(x, plan.is64)),
        plan.is64,
    ).astype(dtype)
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
@pytest.mark.parametrize("logn", [12, 13])
def test_fourstep_inverse_parity(dtype, logn, rng):
    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus, dtype=dtype)
    plan = FourStepPlan.from_params(p)
    gen = NTT4StepCPU(p)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64).astype(dtype)

    got = from_lanes(
        jax.jit(lambda v: fourstep_intt_full(v, plan))(to_lanes(x, plan.is64)),
        plan.is64,
    ).astype(dtype)
    exp = np.stack([gen.intt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)


def test_gpu_calling_convention(rng):
    """The lanes-core matches the reference's caller-wrapped pipeline:
    GPU_Transpose -> GPU_4STEP_NTT -> GPU_Transpose (test_4step_ntt.cu:147-154)."""
    p = NTTParameters4Step(12, ReductionPolynomial.X_N_minus, dtype=np.uint32)
    plan = FourStepPlan.from_params(p)
    gen = NTT4StepCPU(p)
    x = rng.integers(0, p.modulus.value, size=p.n, dtype=np.uint64).astype(np.uint32)

    lanes = to_lanes(x, False)
    pre = transpose_lanes(lanes, p.n1, p.n2)
    core = fourstep_ntt_lanes(pre, plan)
    out = from_lanes(transpose_lanes(core, p.n1, p.n2), False).astype(np.uint32)
    np.testing.assert_array_equal(out, gen.ntt(x))

    # inverse: CPU-side intt_first_transpose pre-permute, then core, then transpose
    y = gen.ntt(x)
    pre_i = to_lanes(gen.intt_first_transpose(y), False)
    core_i = fourstep_intt_lanes(pre_i, plan)
    out_i = from_lanes(transpose_lanes(core_i, p.n1, p.n2), False).astype(np.uint32)
    np.testing.assert_array_equal(out_i, x)


def test_fourstep_roundtrip_u64(rng):
    p = NTTParameters4Step(14, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    plan = FourStepPlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(3, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)
    back = from_lanes(
        jax.jit(lambda v: fourstep_intt_full(fourstep_ntt_full(v, plan), plan))(lanes),
        True,
    )
    np.testing.assert_array_equal(back, x)
