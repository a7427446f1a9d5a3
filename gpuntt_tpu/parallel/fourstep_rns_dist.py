"""Distributed RNS 4-step NTT — prime-ladder batches over a device mesh.

No reference counterpart twice over: the reference is single-GPU and
its RNS surface is transforms only.  This composes the framework's two
extensions — the n2-sharded distributed 4-step (fourstep_dist.py) and
the stacked-table RNS 4-step (ops/fourstep_rns.py) — so an HE-style
residue batch (row b modulo q_{mod_idx[b]}) runs SPMD:

  per-row-gathered column (n1-point) NTTs are local,
  the per-row W twiddle product is local (stacked W sharded alongside),
  ONE lax.all_to_all over ICI reshards n2-sharded -> n1-sharded,
  per-row-gathered row (n2-point) NTTs are local.

The modulus schedule rides the batch axis: `mod_idx` is sharded over
'dp' exactly like the data, so each shard gathers only its own rows'
twiddles from the replicated (mod_count, ...) stacks.  Outputs are
bit-identical to routing each row through the matching member's
single-chip engine, which the virtual-mesh tests assert.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import barrett as bo
from ..ops.fourstep_rns import RNSFourStepPlan, _rns_ct, _rns_gs
from ..ops.limb import u64_from_numpy


def _tmap(f, *xs):
    return jax.tree_util.tree_map(f, *xs)


@dataclass(frozen=True)
class DistRNSFourStepPlan:
    """RNSFourStepPlan + the stacked chain-inverse W tables the
    distributed INTT uses (cf. DistFourStepPlan.w_chain_inv), plus
    optional stacked MXU sub-plans for the local transforms."""

    base: RNSFourStepPlan
    w_chain_inv: Any     # (mc, n1, n2) lanes
    w_chain_inv_sh: Any
    col_rns: Any = None  # stacked MXURNSPlan for the local n1-point NTT
    row_rns: Any = None  # stacked MXURNSPlan for the local n2-point NTT

    @staticmethod
    def from_members(params) -> "DistRNSFourStepPlan":
        from .fourstep_dist import MXU_LOCAL_MIN_LOGN

        base = RNSFourStepPlan.from_params(params)
        word = 64 if base.is64 else 32
        rep = (lambda a: u64_from_numpy(np.asarray(a, dtype=np.uint64))) \
            if base.is64 else (lambda a: jnp.asarray(np.asarray(a, np.uint32)))
        wci = np.stack([p.W_chain_inverse_table.reshape(p.n1, p.n2)
                        for p in params])
        wcis = np.stack([bo.shoup_companion(w, p.modulus.value, word)
                         for w, p in zip(wci, params)])

        # Stacked MXU sub-plans (the RNS rendition of
        # DistFourStepPlan.col_mxu/row_mxu): per-member local-root
        # specs stacked into one scalar-prefetch plan so every shard's
        # mixed-modulus rows run as ONE kernel.  n_inv=1 keeps the
        # inverse unscaled — the distributed chain applies the single
        # per-row n^-1 at the end.
        col_rns = row_rns = None
        if base.is64 and all(q < (1 << 60) for q in base.qs):
            from ..arith import host
            from ..ops.pallas_mxu import MXUMergePlan
            from ..ops.pallas_mxu_rns import MXURNSPlan

            def sub_plans(nloc: int):
                lg = nloc.bit_length() - 1
                if lg < MXU_LOCAL_MIN_LOGN:
                    return None
                try:
                    plans = []
                    for p in params:
                        r = host.exp(p.root_of_unity, p.n // nloc, p.modulus)
                        ir = host.modinv(r, p.modulus)
                        plans.append(MXUMergePlan.from_spec(
                            p.modulus.value, lg, r, ir, xnp=False, n_inv=1))
                    return MXURNSPlan.from_plans(plans)
                except ValueError:
                    return None

            col_rns = sub_plans(base.n1)
            row_rns = sub_plans(base.n2)

        return DistRNSFourStepPlan(
            base=base, w_chain_inv=rep(wci), w_chain_inv_sh=rep(wcis),
            col_rns=col_rns, row_rns=row_rns)


def _swap_last2(x):
    return _tmap(lambda a: jnp.swapaxes(a, -1, -2), x)


def _q3(plan: RNSFourStepPlan, mi):
    return _tmap(lambda a: a[mi].reshape((-1, 1, 1)), plan.q_rep)


def _mxu_rows_last(v, rplan, mi, inverse: bool, interpret: bool):
    """Local RNS NTT along the last axis via the stacked MXU kernel:
    flatten the leading axes to rows, repeat each row's modulus index
    across its slice of the middle axis."""
    from ..ops.limb import U64
    from ..ops.pallas_mxu_rns import pallas_mxu_rns_u64

    b0, b1, nloc = v.hi.shape
    rows = U64(v.hi.reshape(b0 * b1, nloc), v.lo.reshape(b0 * b1, nloc))
    row_mi = jnp.repeat(mi, b1)
    z = pallas_mxu_rns_u64(rows, rplan, row_mi, inverse=inverse,
                           interpret=interpret)
    return U64(z.hi.reshape(b0, b1, nloc), z.lo.reshape(b0, b1, nloc))


def _local_fwd(x, mi, w, ws, plan: RNSFourStepPlan, dplan=None,
               local="xla", interpret=False):
    """Per-shard forward; x: (B/dp, n1, n2/sp), mi: (B/dp,)."""
    ops = plan.ops()
    log_n1 = plan.n1.bit_length() - 1
    log_n2 = plan.n2.bit_length() - 1
    q_flat = _tmap(lambda a: a[mi], plan.q_rep)
    use_col = local == "mxu" and dplan is not None and dplan.col_rns is not None
    use_row = local == "mxu" and dplan is not None and dplan.row_rns is not None

    v = _swap_last2(x)                                   # (B, n2/sp, n1)
    if use_col:
        v = _mxu_rows_last(v, dplan.col_rns, mi, False, interpret)
    else:
        v = _rns_ct(v, plan.n1_fwd, plan.n1_fwd_sh, mi, q_flat, ops, log_n1)
    v = _swap_last2(v)                                   # (B, n1, n2/sp)
    wv = _tmap(lambda a: a[mi], w)
    wvs = _tmap(lambda a: a[mi], ws)
    v = ops["mulc"](v, wv, wvs, _q3(plan, mi))
    v = _tmap(
        lambda a: jax.lax.all_to_all(a, "sp", split_axis=1, concat_axis=2,
                                     tiled=True), v)     # (B, n1/sp, n2)
    if use_row:
        v = _mxu_rows_last(v, dplan.row_rns, mi, False, interpret)
    else:
        v = _rns_ct(v, plan.n2_fwd, plan.n2_fwd_sh, mi, q_flat, ops, log_n2)
    return _tmap(lambda a: jnp.swapaxes(a, 1, 2), v)     # (B, n2, n1/sp)


def _local_inv(s, mi, wci, wcis, plan: RNSFourStepPlan, dplan=None,
               local="xla", interpret=False):
    """Per-shard inverse; s: (B/dp, n2, n1/sp) -> (B/dp, n1, n2/sp)."""
    ops = plan.ops()
    log_n1 = plan.n1.bit_length() - 1
    log_n2 = plan.n2.bit_length() - 1
    q_flat = _tmap(lambda a: a[mi], plan.q_rep)
    q3 = _q3(plan, mi)
    use_col = local == "mxu" and dplan is not None and dplan.col_rns is not None
    use_row = local == "mxu" and dplan is not None and dplan.row_rns is not None

    v = _tmap(lambda a: jnp.swapaxes(a, 1, 2), s)        # (B, n1/sp, n2)
    if use_row:
        v = _mxu_rows_last(v, dplan.row_rns, mi, True, interpret)
    else:
        v = _rns_gs(v, plan.n2_inv, plan.n2_inv_sh, mi, q_flat, ops, log_n2)
    v = _tmap(
        lambda a: jax.lax.all_to_all(a, "sp", split_axis=2, concat_axis=1,
                                     tiled=True), v)     # (B, n1, n2/sp)
    v = ops["mulc"](v, _tmap(lambda a: a[mi], wci),
                    _tmap(lambda a: a[mi], wcis), q3)
    v = _swap_last2(v)
    if use_col:
        v = _mxu_rows_last(v, dplan.col_rns, mi, True, interpret)
    else:
        v = _rns_gs(v, plan.n1_inv, plan.n1_inv_sh, mi, q_flat, ops, log_n1)
    v = _swap_last2(v)
    ninv = _tmap(lambda a: a[mi].reshape((-1, 1, 1)), plan.n_inv_rep)
    ninv_s = _tmap(lambda a: a[mi].reshape((-1, 1, 1)), plan.n_inv_shoup)
    return ops["mulc"](v, ninv, ninv_s, q3)


def _resolve_local(dplan: DistRNSFourStepPlan, local_engine):
    if local_engine is not None:
        return local_engine
    has_mxu = dplan.col_rns is not None or dplan.row_rns is not None
    return "mxu" if has_mxu and jax.default_backend() == "tpu" else "xla"


def _mi_arr(mod_idx):
    return jnp.asarray(np.asarray(mod_idx), jnp.int32)


def dist_rns_fourstep_ntt(x, dplan: DistRNSFourStepPlan, mesh: Mesh,
                          mod_idx, local_engine: str | None = None,
                          interpret: bool = False):
    """Forward distributed RNS 4-step NTT.

    x: lane rep of shape (B, n1, n2), sharded P('dp', None, 'sp');
    mod_idx: (B,) modulus schedule (row b modulo members[mod_idx[b]]).
    Returns the (B, n2, n1) spectrum sharded P('dp', None, 'sp'),
    row b bit-identical to the single-chip RNS engine under the same
    schedule.  local_engine: 'xla' | 'mxu' | None (auto: the stacked
    scalar-prefetch MXU kernels on TPU where eligible, matching
    dist_fourstep_ntt's local routing)."""
    plan = dplan.base
    local = _resolve_local(dplan, local_engine)
    f = jax.shard_map(
        lambda v, m, w, ws: _local_fwd(v, m, w, ws, plan, dplan, local,
                                       interpret),
        mesh=mesh,
        in_specs=(P("dp", None, "sp"), P("dp"),
                  P(None, None, "sp"), P(None, None, "sp")),
        out_specs=P("dp", None, "sp"),
        check_vma=False,
    )
    return f(x, _mi_arr(mod_idx), plan.w_fwd, plan.w_fwd_sh)


def dist_rns_fourstep_intt(s, dplan: DistRNSFourStepPlan, mesh: Mesh,
                           mod_idx, local_engine: str | None = None,
                           interpret: bool = False):
    """Inverse distributed RNS 4-step: exact inverse of
    dist_rns_fourstep_ntt under the same schedule, per-row n^-1 in the
    final stage (reference last-kernel placement).  local_engine as in
    dist_rns_fourstep_ntt."""
    plan = dplan.base
    local = _resolve_local(dplan, local_engine)
    f = jax.shard_map(
        lambda v, m, w, ws: _local_inv(v, m, w, ws, plan, dplan, local,
                                       interpret),
        mesh=mesh,
        in_specs=(P("dp", None, "sp"), P("dp"),
                  P(None, None, "sp"), P(None, None, "sp")),
        out_specs=P("dp", None, "sp"),
        check_vma=False,
    )
    return f(s, _mi_arr(mod_idx), dplan.w_chain_inv, dplan.w_chain_inv_sh)
