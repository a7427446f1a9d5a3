"""Distributed 4-step NTT on a virtual 8-device CPU mesh.

No reference counterpart (single-GPU library); correctness target is
bit-exactness vs the single-chip engines and the golden model.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gpuntt_tpu import NTT4StepCPU, NTTParameters4Step, ReductionPolynomial
from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
from gpuntt_tpu.parallel.fourstep_dist import (
    DistFourStepPlan,
    dist_fourstep_intt,
    dist_fourstep_ntt,
)
from gpuntt_tpu.parallel.mesh import make_mesh


def _tput(x, mesh, spec):
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, spec)), x
    )


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4)])
def test_dist_fourstep_matches_golden(dtype, dp, sp, rng):
    p = NTTParameters4Step(13, ReductionPolynomial.X_N_minus, dtype=dtype)
    dplan = DistFourStepPlan.from_params(p)
    gen = NTT4StepCPU(p)
    mesh = make_mesh(dp=dp, sp=sp)
    batch = 4
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64).astype(dtype)

    lanes = to_lanes(x.reshape(batch, p.n1, p.n2), dplan.base.is64)
    lanes = _tput(lanes, mesh, P("dp", None, "sp"))
    spec_out = jax.jit(lambda v: dist_fourstep_ntt(v, dplan, mesh))(lanes)

    got = from_lanes(spec_out, dplan.base.is64).reshape(batch, p.n).astype(dtype)
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
    np.testing.assert_array_equal(got, exp)

    # inverse: back to the (B, n1, n2) time-domain layout
    back = jax.jit(lambda v: dist_fourstep_intt(v, dplan, mesh))(spec_out)
    got_back = from_lanes(back, dplan.base.is64).reshape(batch, p.n).astype(dtype)
    np.testing.assert_array_equal(got_back, x)


def test_dist_intt_matches_reference_intt(rng):
    """dist INTT inverts the reference spectrum layout exactly: feeding
    NTT_4STEP_CPU::ntt output returns the original input."""
    p = NTTParameters4Step(12, ReductionPolynomial.X_N_minus, dtype=np.uint32)
    dplan = DistFourStepPlan.from_params(p)
    gen = NTT4StepCPU(p)
    mesh = make_mesh(dp=1, sp=8)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64).astype(np.uint32)
    spec = np.stack([gen.ntt(x[i]) for i in range(2)])

    lanes = to_lanes(spec.reshape(2, p.n2, p.n1), False)
    lanes = _tput(lanes, mesh, P("dp", None, "sp"))
    back = dist_fourstep_intt(lanes, dplan, mesh)
    got = from_lanes(back, False).reshape(2, p.n).astype(np.uint32)
    np.testing.assert_array_equal(got, x)


def test_dist_output_sharding(rng):
    """Output carries the declared sharding (n1 over sp) — the layout
    contract downstream pointwise ops rely on."""
    p = NTTParameters4Step(12, ReductionPolynomial.X_N_minus, dtype=np.uint32)
    dplan = DistFourStepPlan.from_params(p)
    mesh = make_mesh(dp=1, sp=8)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64).astype(np.uint32)
    lanes = _tput(to_lanes(x.reshape(1, p.n1, p.n2), False), mesh, P("dp", None, "sp"))
    out = dist_fourstep_ntt(lanes, dplan, mesh)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, p.n2, p.n1 // 8)}


def test_dist_local_mxu_routing_bit_exact(rng, monkeypatch):
    """The MXU local-engine route (rows as digit matmuls inside
    shard_map) is bit-identical to the XLA stage sweeps, both
    directions.  The eligibility floor is lowered so a small ring
    exercises the route (bit-exactness is size-independent; the
    production-size compiled path is driven on real hardware by the
    verify recipe); Pallas runs in interpret mode on the CPU mesh."""
    import gpuntt_tpu.parallel.fourstep_dist as fd

    monkeypatch.setattr(fd, "MXU_LOCAL_MIN_LOGN", 8)
    p = NTTParameters4Step(13, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    dplan = DistFourStepPlan.from_params(p)
    assert dplan.row_mxu is not None          # n2 = 256 >= 2^8
    assert dplan.col_mxu is None              # n1 = 32 stays on XLA
    mesh = make_mesh(dp=2, sp=4)
    batch = 2
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)

    lanes = _tput(to_lanes(x.reshape(batch, p.n1, p.n2), True), mesh,
                  P("dp", None, "sp"))
    # reference is the NumPy golden model: the XLA-local dist path is
    # already asserted equal to it by test_dist_fourstep_matches_golden
    gen = NTT4StepCPU(p)
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
    got = dist_fourstep_ntt(lanes, dplan, mesh, local_engine="mxu",
                            interpret=True)
    np.testing.assert_array_equal(
        from_lanes(got, True).reshape(batch, p.n), exp)

    back_got = dist_fourstep_intt(got, dplan, mesh, local_engine="mxu",
                                  interpret=True)
    got_x = from_lanes(back_got, True).reshape(batch, p.n)
    np.testing.assert_array_equal(got_x, x)


def test_dist_pipeline_chunks_bit_exact(rng):
    """pipeline_chunks > 1 (independent per-chunk collective/compute
    chains for XLA overlap, SURVEY §7(e)) changes scheduling freedom,
    never values; odd local batches fall back to one chain."""
    p = NTTParameters4Step(12, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    dplan = DistFourStepPlan.from_params(p)
    mesh = make_mesh(dp=2, sp=4)
    batch = 8  # local batch 4 -> 2 chunks of 2
    x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                     dtype=np.uint64)
    lanes = to_lanes(x.reshape(batch, p.n1, p.n2), True)
    lanes = _tput(lanes, mesh, P("dp", None, "sp"))

    base = jax.jit(lambda v: dist_fourstep_ntt(v, dplan, mesh))(lanes)
    piped = jax.jit(lambda v: dist_fourstep_ntt(
        v, dplan, mesh, pipeline_chunks=2))(lanes)
    np.testing.assert_array_equal(np.asarray(base.hi), np.asarray(piped.hi))
    np.testing.assert_array_equal(np.asarray(base.lo), np.asarray(piped.lo))

    back = jax.jit(lambda v: dist_fourstep_intt(
        v, dplan, mesh, pipeline_chunks=2))(piped)
    got = from_lanes(back, True).reshape(batch, p.n)
    np.testing.assert_array_equal(got, x)

    # non-dividing chunk count: silent single-chain fallback, same values
    odd = jax.jit(lambda v: dist_fourstep_ntt(
        v, dplan, mesh, pipeline_chunks=3))(lanes)
    np.testing.assert_array_equal(np.asarray(base.hi), np.asarray(odd.hi))


def test_dist_colmat_route(rng):
    """The fused col-NTT+W column kernel (DistFourStepPlan.colmat, r4):
    explicitly forced MXU local engine in interpret mode, sp chosen so
    each shard holds whole W tiles — bit-exact vs the golden forward
    and exact roundtrip, and identical to the XLA route's output."""
    from gpuntt_tpu.parallel import fourstep_dist as fd

    p = NTTParameters4Step(13, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    dplan = DistFourStepPlan.from_params(p)
    assert dplan.colmat is not None
    mesh = make_mesh(dp=4, sp=2)  # n2/sp = 128 = one W tile per shard
    assert fd._colmat_ok(dplan, mesh, "mxu")
    gen = NTT4StepCPU(p)
    batch = 4
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)
    lanes = _tput(to_lanes(x.reshape(batch, p.n1, p.n2), True), mesh,
                  P("dp", None, "sp"))
    spec = jax.jit(lambda v: dist_fourstep_ntt(
        v, dplan, mesh, local_engine="mxu", interpret=True))(lanes)
    got = from_lanes(spec, True).reshape(batch, p.n)
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
    np.testing.assert_array_equal(got, exp)
    # identical to the unfused route
    spec_xla = jax.jit(lambda v: dist_fourstep_ntt(
        v, dplan, mesh, local_engine="xla"))(lanes)
    np.testing.assert_array_equal(
        from_lanes(spec_xla, True), from_lanes(spec, True))
    back = jax.jit(lambda v: dist_fourstep_intt(
        v, dplan, mesh, local_engine="mxu", interpret=True))(spec)
    np.testing.assert_array_equal(
        from_lanes(back, True).reshape(batch, p.n), x)
    # indivisible shard width falls back cleanly (n2/sp = 64 < tile)
    mesh4 = make_mesh(dp=2, sp=4)
    assert not fd._colmat_ok(dplan, mesh4, "mxu")
    lanes4 = _tput(to_lanes(x.reshape(batch, p.n1, p.n2), True), mesh4,
                   P("dp", None, "sp"))
    spec4 = jax.jit(lambda v: dist_fourstep_ntt(
        v, dplan, mesh4, local_engine="mxu", interpret=True))(lanes4)
    np.testing.assert_array_equal(
        from_lanes(spec4, True).reshape(batch, p.n), exp)
