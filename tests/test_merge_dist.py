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
