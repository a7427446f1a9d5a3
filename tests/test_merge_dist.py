"""Distributed merge NTT (collective_permute butterfly exchange) parity.

Coefficient-sharded merge transforms must be bit-identical to the
single-chip engine on the virtual CPU mesh, for both reduction
polynomials, both dtypes, forward and inverse — including the batch
axis riding 'dp'.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gpuntt_tpu import NTTParameters, ReductionPolynomial
from gpuntt_tpu.ops.merge_ntt import (MergePlan, from_lanes, merge_intt_lanes,
                                      merge_ntt_lanes, to_lanes)
from gpuntt_tpu.parallel.merge_dist import dist_merge_intt, dist_merge_ntt
from gpuntt_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize(
    "poly", [ReductionPolynomial.X_N_minus, ReductionPolynomial.X_N_plus]
)
@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_dist_merge_parity(poly, dtype, rng):
    p = NTTParameters(10, poly, dtype=dtype)
    plan = MergePlan.from_params(p)
    mesh = make_mesh(dp=2, sp=4)
    batch = 4
    x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                     dtype=np.uint64).astype(dtype)
    sh = NamedSharding(mesh, P("dp", "sp"))
    lanes = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), to_lanes(x, plan.is64))

    got = from_lanes(jax.jit(
        lambda v: dist_merge_ntt(v, plan, mesh))(lanes), plan.is64)
    exp = from_lanes(jax.jit(
        lambda v: merge_ntt_lanes(v, plan))(to_lanes(x, plan.is64)), plan.is64)
    np.testing.assert_array_equal(got, exp)

    lanes_f = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), to_lanes(exp.astype(dtype), plan.is64))
    got_i = from_lanes(jax.jit(
        lambda v: dist_merge_intt(v, plan, mesh))(lanes_f), plan.is64)
    np.testing.assert_array_equal(got_i.astype(dtype), x)


def test_dist_merge_sp1_degenerate(rng):
    """sp=1 runs zero collectives and equals the engine exactly."""
    p = NTTParameters(9, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    mesh = make_mesh(dp=1, sp=1)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    sh = NamedSharding(mesh, P("dp", "sp"))
    lanes = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), to_lanes(x, True))
    got = from_lanes(jax.jit(
        lambda v: dist_merge_ntt(v, plan, mesh))(lanes), True)
    exp = from_lanes(jax.jit(
        lambda v: merge_ntt_lanes(v, plan))(to_lanes(x, True)), True)
    np.testing.assert_array_equal(got, exp)


def test_dist_merge_mxu_local_tails_bit_exact(rng, monkeypatch):
    """MXU local tails (per-shard from_eval plans: Omega = root^sp,
    Psi_r from the table-subtree identity) are bit-identical to the XLA
    stage sweeps for both reduction polynomials, both directions.  The
    eligibility floor is lowered so a small ring exercises all four
    shard twists quickly (bit-exactness is size-independent; production
    sizes are driven on real hardware by the verify recipe)."""
    from gpuntt_tpu.parallel import merge_dist as md
    from gpuntt_tpu.parallel.merge_dist import _merge_dist_mxu

    monkeypatch.setattr(md, "MXU_LOCAL_MIN_LOGN", 8)
    for poly in (ReductionPolynomial.X_N_plus, ReductionPolynomial.X_N_minus):
        p = NTTParameters(11, poly, dtype=np.uint64)
        plan = MergePlan.from_params(p)
        mesh = make_mesh(dp=2, sp=4)
        assert _merge_dist_mxu(plan, 4) is not None   # local 2^9 eligible
        batch = 4
        x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                         dtype=np.uint64)
        sh = NamedSharding(mesh, P(None, "sp"))
        lanes = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), to_lanes(x, True))
        # reference is the single-chip engine: the XLA-local dist path is
        # already asserted equal to it by test_dist_merge_parity (and its
        # compile at any size is minutes on CPU, so avoid it here)
        exp = from_lanes(merge_ntt_lanes(to_lanes(x, True), plan), True)
        got = dist_merge_ntt(lanes, plan, mesh, local_engine="mxu",
                             interpret=True)
        np.testing.assert_array_equal(from_lanes(got, True), exp)

        back_got = dist_merge_intt(got, plan, mesh, local_engine="mxu",
                                   interpret=True)
        np.testing.assert_array_equal(from_lanes(back_got, True), x)


def test_dist_merge_mxu_large_local_tails_bit_exact(rng, monkeypatch):
    """LARGE-engine local tails (MXULargePlan.from_eval per shard — the
    production regime for ring >= 2^20 at sp=8, where the tail exceeds
    the in-VMEM kernel) are bit-exact both directions, with the stacked
    tails passed through a user jit as a pytree ARGUMENT (the runtime-
    buffer path the north-star dryrun and chip cells use).  The large
    floor is lowered so a small ring exercises all four shard twists."""
    from gpuntt_tpu.parallel import merge_dist as md
    from gpuntt_tpu.parallel.merge_dist import (MergeDistMXULarge,
                                                merge_dist_mxu)

    monkeypatch.setattr(md, "MXU_LOCAL_LARGE_MIN_LOGN", 12)
    for poly in (ReductionPolynomial.X_N_plus, ReductionPolynomial.X_N_minus):
        p = NTTParameters(14, poly, dtype=np.uint64)
        plan = MergePlan.from_params(p)
        mesh = make_mesh(dp=1, sp=4)
        mxu = merge_dist_mxu(plan, 4)
        assert isinstance(mxu, MergeDistMXULarge)  # local 2^12 -> large
        batch = 2
        x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                         dtype=np.uint64)
        sh = NamedSharding(mesh, P(None, "sp"))
        lanes = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), to_lanes(x, True))
        exp = from_lanes(merge_ntt_lanes(to_lanes(x, True), plan), True)
        fwd = jax.jit(lambda v, pl, mx: dist_merge_ntt(
            v, pl, mesh, interpret=True, mxu=mx))
        got = fwd(lanes, plan, mxu)
        np.testing.assert_array_equal(from_lanes(got, True), exp)
        inv = jax.jit(lambda v, pl, mx: dist_merge_intt(
            v, pl, mesh, interpret=True, mxu=mx))
        back = inv(got, plan, mxu)
        np.testing.assert_array_equal(from_lanes(back, True), x)


def test_dist_merge_tableless_plan_uses_cross_tables(rng, monkeypatch):
    """A TPU-built table-skipped plan through the dist merge with MXU
    tails must NOT rebuild the full 2^n butterfly tables (the r5 review
    finding: with_tables() inside the caller's jit inlines 10s of MB);
    the cross-chip stages only index < sp, so an sp-entry table
    suffices — asserted bit-exact and small."""
    import jax as _jax

    from gpuntt_tpu.parallel import merge_dist as md
    from gpuntt_tpu.parallel.merge_dist import merge_dist_mxu

    monkeypatch.setattr(md, "MXU_LOCAL_MIN_LOGN", 8)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    p = NTTParameters(12, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    # force the TPU table-skip decision despite the small ring
    from gpuntt_tpu.ops import merge_ntt as mn

    monkeypatch.setattr(mn, "_bigring_engine_path", lambda _p: "mxu-large")
    plan = MergePlan.from_params(p)
    assert plan.fwd_table is None
    small = md._cross_only_plan(plan, 4)
    leaf = jax.tree_util.tree_leaves(small.fwd_table)[0]
    assert leaf.shape[0] == 4  # sp entries, not 2^12
    mesh = make_mesh(dp=1, sp=4)
    mxu = merge_dist_mxu(plan, 4)
    assert mxu is not None
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)
    sh = NamedSharding(mesh, P(None, "sp"))
    lanes = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), to_lanes(x, True))
    got = jax.jit(lambda v, pl, mx: dist_merge_ntt(
        v, pl, mesh, interpret=True, mxu=mx))(lanes, plan, mxu)
    exp = from_lanes(merge_ntt_lanes(to_lanes(x, True),
                                     plan.with_tables()), True)
    np.testing.assert_array_equal(from_lanes(got, True), exp)
    back = jax.jit(lambda v, pl, mx: dist_merge_intt(
        v, pl, mesh, interpret=True, mxu=mx))(got, plan, mxu)
    np.testing.assert_array_equal(from_lanes(back, True), x)
