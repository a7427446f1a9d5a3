"""Distributed 4-step NTT over a device mesh.

The reference's 4-step method runs on one GPU with kernel-launch
boundaries as its only "communication rounds" (ntt_4step.cu:2293-3260).
Here the same N = n1 x n2 decomposition becomes the multi-chip sharding
backbone (SURVEY.md §5): with the n2 axis sharded over mesh axis "sp",

  column (n1-point) NTTs are local,
  the W twiddle product is local (W sharded alongside),
  one lax.all_to_all over ICI reshards n2-sharded -> n1-sharded
    (the distributed transpose; replaces Transpose_Batch,
     ntt_4step.cu:36-56),
  row (n2-point) NTTs are local.

Batch parallelism rides mesh axis "dp" with zero communication.

Forward maps (B, n1, n2)[n2@sp] -> (B, n2, n1)[n1@sp]; the inverse runs
the mathematical inverse chain (GS stages + elementwise W^-1 with the
forward index pattern + single n^-1) back to (B, n1, n2)[n2@sp].
Exact integer arithmetic makes both bit-identical to the single-chip
engines, which the tests assert on a virtual mesh.

Local transforms route to the MXU digit-matmul kernels on TPU (the
n2-point row NTT is the expensive local op: n2 is 128..65536 in the
reference factor table, nttparameters.cu:305-354, while n1 <= 256
stays on the XLA butterfly path).  `local_engine='xla'|'mxu'|None`
(None = MXU where eligible on a TPU backend); both engines are
bit-identical, so the choice never changes results.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..params.fourstep import NTTParameters4Step
from ..params.merge import ReductionPolynomial
from ..arith import host
from ..ops import barrett as bo
from ..ops.fourstep import FourStepPlan
from ..ops.limb import U64, u64_from_numpy
from ..ops.merge_ntt import ct_stages, gs_stages
from ..ops.pallas_mxu_large import col_phase_local

MXU_LOCAL_MIN_LOGN = 12  # below this the XLA stages win (see RESULTS sweep)
# local sizes from here up take the composed large-ring engine (the
# in-VMEM INVERSE kernel exceeds scoped VMEM at 2^17); tests lower it to
# exercise the large-row route at interpret-feasible sizes
MXU_LOCAL_LARGE_MIN_LOGN = 17


def _tmap(f, *xs):
    return jax.tree_util.tree_map(f, *xs)


@dataclass(frozen=True)
class DistFourStepPlan:
    """FourStepPlan + the chain-inverse W table the distributed INTT uses,
    plus optional MXU sub-plans for the local column/row transforms.

    `colmat` (u64, 8 <= n1 <= 512): a column-only MXULargePlan whose
    forward column phase computes W o (colNTT(x)) and whose inverse
    computes colINTT(W^-1 o x) unscaled — one Pallas pass replacing the
    XLA stage sweeps + elementwise W product, which at ring 2^24 cost
    ~16 ms/transform of HBM-bound elementwise fusions (r4 trace,
    RESULTS_r4).  The factored-W identity makes this exact: the
    large-ring merge column phase at X_N_minus IS the 4-step's
    col-NTT-then-W with root = the full-ring omega."""

    base: FourStepPlan
    w_chain_inv: Any  # (n1, n2) lanes, elementwise inverse of w_fwd
    w_chain_inv_sh: Any
    col_mxu: Any = None  # MXUMergePlan for the local n1-point NTT
    row_mxu: Any = None  # MXUMergePlan for the local n2-point NTT
    colmat: Any = None   # col-only MXULargePlan (fused col NTT + W)

    @staticmethod
    def from_params(p: NTTParameters4Step) -> "DistFourStepPlan":
        base = FourStepPlan.from_params(p)
        q = p.modulus.value
        word = 64 if base.is64 else 32
        wci = p.W_chain_inverse_table.reshape(p.n1, p.n2)
        if base.is64:
            rep = lambda a: u64_from_numpy(np.asarray(a, dtype=np.uint64))
        else:
            rep = lambda a: jnp.asarray(np.asarray(a, dtype=np.uint32))

        # MXU sub-plans for local transforms: the n1/n2 stage sweeps are
        # plain X_N_minus merge NTTs with roots omega^(n/n1), omega^(n/n2)
        # (nttparameters.cu:356-380), so the digit-matmul engine applies
        # unchanged; n_inv=1 keeps the inverse unscaled (the distributed
        # chain applies the single n^-1 at the end).  Local sizes beyond
        # the in-VMEM kernel (2^17+, from the `dims` factorization
        # extension) take the composed large-ring engine — the in-VMEM
        # INVERSE kernel exceeds scoped VMEM at 2^17 (16.66M vs the 16M
        # v5e limit), so the split mirrors dispatch's direction rule.
        col_mxu = row_mxu = None
        if base.is64 and q < (1 << 62):
            from ..ops.pallas_mxu import MXUMergePlan, plan_to_device
            from ..ops.pallas_mxu_large import MXULargePlan

            def sub_plan(nloc: int):
                lg = nloc.bit_length() - 1
                if lg < MXU_LOCAL_MIN_LOGN:
                    return None
                r = host.exp(p.root_of_unity, p.n // nloc, p.modulus)
                ir = host.modinv(r, p.modulus)
                if lg >= MXU_LOCAL_LARGE_MIN_LOGN:
                    return plan_to_device(MXULargePlan.from_spec(
                        q, lg, r, ir, xnp=False, n_inv=1))
                return plan_to_device(
                    MXUMergePlan.from_spec(q, lg, r, ir, xnp=False, n_inv=1))

            col_mxu = sub_plan(p.n1)
            row_mxu = sub_plan(p.n2)

        # fused col-NTT + W column kernel (see class docstring); only
        # X_N_minus reaches the distributed 4-step (the reference 4-step
        # is X_N_minus-only), and A <= 512 keeps the digit accumulators
        # exact.  tile=128 so any sp with n2/sp >= 128 divides evenly.
        colmat = None
        if (base.is64 and q < (1 << 62) and 8 <= p.n1 <= 512
                and p.poly_reduction == ReductionPolynomial.X_N_minus):
            from ..ops.pallas_mxu import plan_to_device as _p2d
            from ..ops.pallas_mxu_large import MXULargePlan

            # n_inv = B^-1 makes the inverse column matrix carry NO
            # scaling (from_spec folds n_inv * B into it): the dist
            # chain applies the single n^-1 at the end
            colmat = _p2d(MXULargePlan.from_spec(
                q, p.logn, p.root_of_unity, host.modinv(
                    p.root_of_unity, p.modulus), xnp=False,
                n_inv=pow(p.n2, q - 2, q), a_col=p.n1, tile=128,
                col_only=True))

        return DistFourStepPlan(
            base=base,
            w_chain_inv=rep(wci),
            w_chain_inv_sh=rep(bo.shoup_companion(wci, q, word)),
            col_mxu=col_mxu,
            row_mxu=row_mxu,
            colmat=colmat,
        )


# Registered pytree: at north-star rings (2^20-2^24) the W tables run to
# hundreds of MB, so the dist plan must enter a compiled drive as a jit
# ARGUMENT — closed over, those tables inline into the HLO and trip the
# relay's compile-payload cap (the known closure-constant trap).
jax.tree_util.register_dataclass(
    DistFourStepPlan,
    data_fields=["base", "w_chain_inv", "w_chain_inv_sh", "col_mxu",
                 "row_mxu", "colmat"],
    meta_fields=[],
)


def _ntt_axis1(v, table, shoup, ops_, log_size):
    """CT stages along axis -2 (columns): swap, sweep, swap back."""
    v = _tmap(lambda a: jnp.swapaxes(a, -1, -2), v)
    v = ct_stages(v, table, shoup, ops_, log_size, xnp=False)
    return _tmap(lambda a: jnp.swapaxes(a, -1, -2), v)


def _intt_axis1(v, table, shoup, ops_, log_size):
    v = _tmap(lambda a: jnp.swapaxes(a, -1, -2), v)
    v = gs_stages(v, table, shoup, ops_, log_size, xnp=False)
    return _tmap(lambda a: jnp.swapaxes(a, -1, -2), v)


def _mxu_last_axis(v: U64, sub_plan, inverse: bool, interpret: bool) -> U64:
    """Local NTT along the last axis via the MXU merge kernel (in-VMEM
    for local sizes <= 2^16, composed large-ring engine beyond)."""
    from ..ops.pallas_mxu import pallas_mxu_u64
    from ..ops.pallas_mxu_large import MXULargePlan, pallas_mxu_large_u64

    b0, b1, nloc = v.hi.shape
    rows = U64(v.hi.reshape(b0 * b1, nloc), v.lo.reshape(b0 * b1, nloc))
    fn = (pallas_mxu_large_u64 if isinstance(sub_plan, MXULargePlan)
          else pallas_mxu_u64)
    z = fn(rows, sub_plan, inverse=inverse, interpret=interpret)
    return U64(z.hi.reshape(b0, b1, nloc), z.lo.reshape(b0, b1, nloc))


def _mxu_axis1(v: U64, sub_plan, inverse: bool, interpret: bool) -> U64:
    sw = _tmap(lambda a: jnp.swapaxes(a, -1, -2), v)
    sw = _mxu_last_axis(sw, sub_plan, inverse, interpret)
    return _tmap(lambda a: jnp.swapaxes(a, -1, -2), sw)


def _local_fwd(x, w, ws, plan: FourStepPlan, dplan=None, local="xla",
               interpret=False, cws=None):
    """Per-shard forward: local column NTT + local W product + all_to_all
    + local row NTT.  Runs inside shard_map; x: (B/dp, n1, n2/sp).
    `cws` (colmat route): this shard's slice of the fused column
    kernel's per-tile W scale columns."""
    ops_ = plan.ops()
    log_n1 = plan.n1.bit_length() - 1
    log_n2 = plan.n2.bit_length() - 1
    use_row = local == "mxu" and dplan is not None and dplan.row_mxu is not None

    if cws is not None:
        # fused col-NTT + W in one Pallas pass (see DistFourStepPlan)
        v = col_phase_local(x, dplan.colmat, cws, inverse=False,
                            interpret=interpret)
    else:
        use_col = (local == "mxu" and dplan is not None
                   and dplan.col_mxu is not None)
        if use_col:
            v = _mxu_axis1(x, dplan.col_mxu, False, interpret)
        else:
            v = _ntt_axis1(x, plan.n1_fwd, plan.n1_fwd_sh, ops_, log_n1)
        v = ops_["mulc"](v, w, ws)
    # distributed transpose: split n1 (axis 1) across sp, gather n2 (axis 2)
    v = _tmap(
        lambda a: jax.lax.all_to_all(a, "sp", split_axis=1, concat_axis=2, tiled=True),
        v,
    )
    if use_row:
        v = _mxu_last_axis(v, dplan.row_mxu, False, interpret)
    else:
        v = ct_stages(v, plan.n2_fwd, plan.n2_fwd_sh, ops_, log_n2, xnp=False)
    # output matrix layout (n2, n1): local swap turns (B, n1/sp, n2) into
    # (B, n2, n1/sp) == global (B, n2, n1) sharded on the n1 axis.
    return _tmap(lambda a: jnp.swapaxes(a, 1, 2), v)


def _local_inv(s, wci, wcis, plan: FourStepPlan, dplan=None, local="xla",
               interpret=False, cws=None):
    """Per-shard inverse chain; s: (B/dp, n2, n1/sp) -> (B/dp, n1, n2/sp).
    `cws` (colmat route): shard slice of the inverse column kernel's
    per-tile W^-1 scale columns."""
    ops_ = plan.ops()
    log_n1 = plan.n1.bit_length() - 1
    log_n2 = plan.n2.bit_length() - 1
    use_row = local == "mxu" and dplan is not None and dplan.row_mxu is not None

    v = _tmap(lambda a: jnp.swapaxes(a, 1, 2), s)  # (B, n1/sp, n2)
    if use_row:
        v = _mxu_last_axis(v, dplan.row_mxu, True, interpret)
    else:
        v = gs_stages(v, plan.n2_inv, plan.n2_inv_sh, ops_, log_n2, xnp=False)
    # reshard n1-sharded -> n2-sharded (reverse all_to_all)
    v = _tmap(
        lambda a: jax.lax.all_to_all(a, "sp", split_axis=2, concat_axis=1, tiled=True),
        v,
    )
    if cws is not None:
        # fused W^-1 + unscaled col-INTT in one Pallas pass
        v = col_phase_local(v, dplan.colmat, cws, inverse=True,
                            interpret=interpret)
    else:
        use_col = (local == "mxu" and dplan is not None
                   and dplan.col_mxu is not None)
        v = ops_["mulc"](v, wci, wcis)
        if use_col:
            v = _mxu_axis1(v, dplan.col_mxu, True, interpret)
        else:
            v = _intt_axis1(v, plan.n1_inv, plan.n1_inv_sh, ops_, log_n1)
    v = ops_["mulc"](v, plan.n_inv_rep, plan.n_inv_shoup)
    return v


def _resolve_local(dplan: DistFourStepPlan, local_engine):
    if local_engine is not None:
        return local_engine
    has_mxu = (dplan.col_mxu is not None or dplan.row_mxu is not None
               or dplan.colmat is not None)
    return "mxu" if has_mxu and jax.default_backend() == "tpu" else "xla"


def _colmat_ok(dplan: DistFourStepPlan, mesh: Mesh, local: str) -> bool:
    """The fused column kernel needs each shard's n2 slice to hold a
    whole number of its W tiles."""
    if local != "mxu" or dplan.colmat is None:
        return False
    n2_local = dplan.base.n2 // mesh.shape["sp"]
    t = max(dplan.colmat.tile, dplan.colmat.tile_inv or dplan.colmat.tile)
    return n2_local >= t and n2_local % t == 0


def _chunked(fn, v, chunks: int):
    """Run fn over `chunks` independent batch slices (unrolled) and
    re-concatenate.  Each slice's all_to_all then has no data dependence
    on the other slices' local NTTs, so XLA's latency-hiding scheduler
    is free to overlap one chunk's collective with another's compute —
    the ICI/compute overlap of SURVEY.md §7 hard part (e).  Bit-exact by
    construction (pure batch split)."""
    leaves = jax.tree_util.tree_leaves(v)
    b = leaves[0].shape[0]
    if chunks <= 1 or b % chunks:
        return fn(v)
    step = b // chunks
    outs = [fn(_tmap(lambda a: a[c * step:(c + 1) * step], v))
            for c in range(chunks)]
    return _tmap(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def dist_fourstep_ntt(x, dplan: DistFourStepPlan, mesh: Mesh,
                      local_engine: str | None = None,
                      interpret: bool = False,
                      pipeline_chunks: int = 1):
    """Forward distributed 4-step NTT.

    x: lane rep of shape (B, n1, n2), sharded P('dp', None, 'sp').
    Returns the (B, n2, n1) spectrum (reference natural output layout,
    cf. NTT_4STEP_CPU::ntt final transpose), sharded P('dp', None, 'sp').
    local_engine: 'xla' | 'mxu' | None (auto: MXU on TPU where eligible).
    pipeline_chunks > 1 splits the per-shard batch into that many
    independent column-NTT -> all_to_all -> row-NTT chains so the
    compiler can overlap collectives with compute (no-op when the local
    batch does not divide evenly).
    """
    plan = dplan.base
    local = _resolve_local(dplan, local_engine)
    if _colmat_ok(dplan, mesh, local):
        # fused column route: the per-tile W scale columns travel as a
        # shard_map input sharded on the tile axis, so each shard's
        # kernel multiplies by ITS global columns' factors
        f = jax.shard_map(
            lambda v, cws: _chunked(
                lambda u: _local_fwd(u, None, None, plan, dplan, local,
                                     interpret, cws=cws),
                v, pipeline_chunks),
            mesh=mesh,
            in_specs=(P("dp", None, "sp"), P("sp", None, None)),
            out_specs=P("dp", None, "sp"),
            check_vma=False,
        )
        return f(x, dplan.colmat.ws_fwd)
    f = jax.shard_map(
        lambda v, w, ws: _chunked(
            lambda u: _local_fwd(u, w, ws, plan, dplan, local, interpret),
            v, pipeline_chunks),
        mesh=mesh,
        in_specs=(P("dp", None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P("dp", None, "sp"),
        check_vma=False,
    )
    return f(x, plan.w_fwd, plan.w_fwd_sh)


def dist_fourstep_intt(s, dplan: DistFourStepPlan, mesh: Mesh,
                       local_engine: str | None = None,
                       interpret: bool = False,
                       pipeline_chunks: int = 1):
    """Inverse distributed 4-step NTT: (B, n2, n1)[P('dp',None,'sp')] ->
    (B, n1, n2)[P('dp',None,'sp')]; exact inverse of dist_fourstep_ntt.
    pipeline_chunks as in dist_fourstep_ntt."""
    plan = dplan.base
    local = _resolve_local(dplan, local_engine)
    if _colmat_ok(dplan, mesh, local):
        f = jax.shard_map(
            lambda v, cws: _chunked(
                lambda u: _local_inv(u, None, None, plan, dplan, local,
                                     interpret, cws=cws),
                v, pipeline_chunks),
            mesh=mesh,
            in_specs=(P("dp", None, "sp"), P("sp", None, None)),
            out_specs=P("dp", None, "sp"),
            check_vma=False,
        )
        return f(s, dplan.colmat.ws_inv)
    f = jax.shard_map(
        lambda v, w, ws: _chunked(
            lambda u: _local_inv(u, w, ws, plan, dplan, local, interpret),
            v, pipeline_chunks),
        mesh=mesh,
        in_specs=(P("dp", None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P("dp", None, "sp"),
        check_vma=False,
    )
    return f(s, dplan.w_chain_inv, dplan.w_chain_inv_sh)
