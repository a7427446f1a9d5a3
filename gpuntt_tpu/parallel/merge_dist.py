"""Distributed merge NTT — butterfly exchange over collective_permute.

The 4-step distribution (fourstep_dist.py) reshards once with an
all_to_all.  This module shards the MERGE transform itself, the second
strategy SURVEY.md §5 calls for: with the coefficient axis sharded over
mesh axis 'sp' (contiguous blocks), the first log2(sp) Cooley-Tukey
stages pair elements on DIFFERENT chips — each stage swaps whole shards
between butterfly partners with one lax.ppermute over ICI — and every
remaining stage is shard-local with a per-shard slice of the twiddle
table.  This is the TPU rendition of the reference's staged Core
kernels, whose kernel-launch boundaries are single-GPU "communication
rounds" (ntt.cu:435-1553): here the rounds are real collectives.

Key structural facts (both proved by the contiguous-block sharding):
- at cross-chip stage s (< log2 sp) ALL elements of a shard share one
  butterfly group, so the twiddle is a per-shard SCALAR, and a shard is
  entirely u-side or entirely v-side;
- at local stage s (>= log2 sp) shard r owns groups
  [r*m/sp, (r+1)*m/sp), a contiguous table slice.

Outputs are bit-identical to the single-chip merge engines; the suite
asserts equality on a virtual CPU mesh.

The shard-local tail is itself MXU-routable: shard r computes the
evaluation-twisted transform out[k'] = sum_j x_j (Psi_r Omega^br(k'))^j
with Omega = root^sp (X_N_minus: Psi_r = root^br(r); X_N_plus:
Omega = psi^(2 sp), Psi_r = psi^(2 br(r) + 1)) — the subtree of the
full twiddle table rooted at index sp + r.  MXUMergePlan.from_eval
covers exactly this family, so the local stages become two digit
matmuls per shard; only the left matrix and W tables vary with r
(stacked and rank-indexed), the right matrix is shared.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.merge_ntt import MergePlan
from ..params.bitrev import bitreverse
from ..params.merge import ReductionPolynomial

MXU_LOCAL_MIN_LOGN = 12  # below this the XLA stages win (see RESULTS sweep)
# local tails at/above this size take the LARGE-ring engine (the in-VMEM
# u64 INVERSE kernel exceeds the 16M scoped-VMEM limit at 2^17 — same
# boundary as single-chip dispatch); tails beyond MAX keep the XLA stages
MXU_LOCAL_LARGE_MIN_LOGN = 17
MXU_LOCAL_MAX_LOGN = 23


def _tmap(f, *xs):
    return jax.tree_util.tree_map(f, *xs)


def _dyn_slice(tab, start, size: int):
    return _tmap(lambda a: jax.lax.dynamic_slice_in_dim(a, start, size), tab)


def _dyn_index(tab, idx):
    return _tmap(lambda a: jax.lax.dynamic_index_in_dim(a, idx, keepdims=False),
                 tab)


def _sel(pred, a, b):
    return _tmap(lambda x, y: jnp.where(pred, x, y), a, b)


@dataclass(frozen=True)
class MergeDistMXU:
    """Per-shard MXU plans for the local tail: a template plan (shard 0)
    plus the rank-varying tables stacked on a leading (sp,) axis."""

    template: Any
    fwd_left: Any
    fwd_left_corr: Any
    w_fwd: Any       # tuple of 4 stacked (sp, A, B) uint32
    inv_left: Any
    inv_left_corr: Any
    w_inv: Any


@dataclass(frozen=True)
class MergeDistMXULarge:
    """Large-engine twin of MergeDistMXU for local tails at 2^17-2^23:
    a template MXULargePlan (shard 0) plus the rank-varying COLUMN-phase
    tables stacked on (sp,) — the psi twist rides entirely in the column
    phase (MXULargePlan.from_eval), so the row plan is shard-invariant."""

    template: Any
    col_fwd: Any
    col_fwd_corr: Any
    wt_fwd: Any      # tuple of 4 stacked (sp, A, T) uint32
    ws_fwd: Any      # tuple of 4 stacked (sp, B//T, A, 1) uint32
    col_inv: Any
    col_inv_corr: Any
    wt_inv: Any
    ws_inv: Any


# Registered pytrees: pass the resolved tails through a user jit as an
# ARGUMENT (dist_merge_ntt(..., mxu=...)) and the stacked tables enter
# the compiled program as runtime buffers — closure capture would inline
# them into HLO (10s of MB at big rings: the relay payload trap).
for _cls, _fields in (
        (MergeDistMXU, ["template", "fwd_left", "fwd_left_corr", "w_fwd",
                        "inv_left", "inv_left_corr", "w_inv"]),
        (MergeDistMXULarge, ["template", "col_fwd", "col_fwd_corr",
                             "wt_fwd", "ws_fwd", "col_inv", "col_inv_corr",
                             "wt_inv", "ws_inv"]),
):
    jax.tree_util.register_dataclass(_cls, data_fields=_fields,
                                     meta_fields=[])


def _shard_twists(plan: MergePlan, sp: int):
    """(omega, iomega, [(psi_r, ipsi_r)]) for the sp local tails, or
    None for caller-supplied non-root tables."""
    p = plan.params
    q = plan.q
    xnp = plan.reduction_poly == ReductionPolynomial.X_N_plus
    r, ri = p.root_of_unity, p.inverse_root_of_unity
    order = (2 << plan.logn) if xnp else (1 << plan.logn)
    if pow(r, order, q) != 1 or r * ri % q != 1:
        return None
    logsp = sp.bit_length() - 1
    if xnp:
        omega, iomega = pow(r, 2 * sp, q), pow(ri, 2 * sp, q)
        tw = [(pow(r, 2 * bitreverse(t, logsp) + 1, q),
               pow(ri, 2 * bitreverse(t, logsp) + 1, q)) for t in range(sp)]
    else:
        omega, iomega = pow(r, sp, q), pow(ri, sp, q)
        tw = [(pow(r, bitreverse(t, logsp), q),
               pow(ri, bitreverse(t, logsp), q)) for t in range(sp)]
    return omega, iomega, tw


def _stack(plans, field):
    return jax.device_put(
        np.stack([np.asarray(getattr(pl_, field)) for pl_ in plans]))


def _stack_tup(plans, field):
    k = len(getattr(plans[0], field))
    return tuple(
        jax.device_put(
            np.stack([np.asarray(getattr(pl_, field)[i]) for pl_ in plans]))
        for i in range(k))


def _build_merge_dist_mxu(plan: MergePlan, sp: int):
    """Stacked from_eval plans for the sp local tails, or None when the
    MXU route is ineligible (u32, big q, small/huge local size, or
    caller-supplied non-root tables — those keep the XLA stages,
    matching the reference's garbage-in/garbage-out).  Tails of
    2^12-2^16 ride the in-VMEM engine; 2^17-2^23 the large-ring engine
    (MXULargePlan.from_eval — the in-VMEM inverse exceeds scoped VMEM
    at 2^17, same boundary as single-chip dispatch)."""
    from ..ops.pallas_mxu import MXUMergePlan, plan_to_device

    p = plan.params
    if p is None or not plan.is64 or plan.q >= (1 << 62):
        return None
    logsp = sp.bit_length() - 1
    lognl = plan.logn - logsp
    if lognl < MXU_LOCAL_MIN_LOGN or lognl > MXU_LOCAL_MAX_LOGN:
        return None
    twists = _shard_twists(plan, sp)
    if twists is None:
        return None
    omega, iomega, tw = twists
    q = plan.q
    if lognl >= MXU_LOCAL_LARGE_MIN_LOGN:
        from ..ops.pallas_mxu_large import MXULargePlan

        # only the COLUMN phase varies with the shard twist; the
        # template (shard 0) carries the shard-invariant row machinery,
        # the rest build col_only (the r5 review flagged sp identical
        # row-table builds)
        plans = [MXULargePlan.from_eval(q, lognl, omega, iomega, ps, ips, 1,
                                        col_only=(r > 0))
                 for r, (ps, ips) in enumerate(tw)]
        return MergeDistMXULarge(
            template=plan_to_device(plans[0]),
            col_fwd=_stack(plans, "col_fwd"),
            col_fwd_corr=_stack(plans, "col_fwd_corr"),
            wt_fwd=_stack_tup(plans, "wt_fwd"),
            ws_fwd=_stack_tup(plans, "ws_fwd"),
            col_inv=_stack(plans, "col_inv"),
            col_inv_corr=_stack(plans, "col_inv_corr"),
            wt_inv=_stack_tup(plans, "wt_inv"),
            ws_inv=_stack_tup(plans, "ws_inv"),
        )
    plans = [MXUMergePlan.from_eval(q, lognl, omega, iomega, ps, ips, 1)
             for ps, ips in tw]
    return MergeDistMXU(
        template=plan_to_device(plans[0]),
        fwd_left=_stack(plans, "fwd_left"),
        fwd_left_corr=_stack(plans, "fwd_left_corr"),
        w_fwd=_stack_tup(plans, "w_fwd"),
        inv_left=_stack(plans, "inv_left"),
        inv_left_corr=_stack(plans, "inv_left_corr"),
        w_inv=_stack_tup(plans, "w_inv"),
    )


def _merge_dist_mxu(plan: MergePlan, sp: int):
    """Cache the stacked plans on the originating parameter object."""
    p = plan.params
    if p is None:
        return _build_merge_dist_mxu(plan, sp)
    cache = getattr(p, "_merge_dist_mxu_cache", None)
    if cache is None:
        cache = {}
        p._merge_dist_mxu_cache = cache
    key = (sp, plan.reduction_poly)
    if key not in cache:
        cache[key] = _build_merge_dist_mxu(plan, sp)
    return cache[key]


def _local_tail_mxu(x, mxu, rank, inverse: bool, interpret: bool):
    """Shard-local transform on the MXU engines, tables rank-gathered:
    two digit matmuls in-VMEM (MergeDistMXU) or the composed large-ring
    col+row program (MergeDistMXULarge) at 2^17-2^23 tails."""

    def idx(a):
        return jax.lax.dynamic_index_in_dim(a, rank, 0, keepdims=False)

    if isinstance(mxu, MergeDistMXULarge):
        from ..ops.pallas_mxu_large import pallas_mxu_large_u64

        if inverse:
            sub = dataclasses.replace(
                mxu.template,
                col_inv=idx(mxu.col_inv),
                col_inv_corr=idx(mxu.col_inv_corr),
                wt_inv=tuple(idx(a) for a in mxu.wt_inv),
                ws_inv=tuple(idx(a) for a in mxu.ws_inv),
            )
        else:
            sub = dataclasses.replace(
                mxu.template,
                col_fwd=idx(mxu.col_fwd),
                col_fwd_corr=idx(mxu.col_fwd_corr),
                wt_fwd=tuple(idx(a) for a in mxu.wt_fwd),
                ws_fwd=tuple(idx(a) for a in mxu.ws_fwd),
            )
        return pallas_mxu_large_u64(x, sub, inverse=inverse,
                                    interpret=interpret)
    from ..ops.pallas_mxu import pallas_mxu_u64

    if inverse:
        sub = dataclasses.replace(
            mxu.template,
            inv_left=idx(mxu.inv_left),
            inv_left_corr=idx(mxu.inv_left_corr),
            w_inv=tuple(idx(a) for a in mxu.w_inv),
        )
    else:
        sub = dataclasses.replace(
            mxu.template,
            fwd_left=idx(mxu.fwd_left),
            fwd_left_corr=idx(mxu.fwd_left_corr),
            w_fwd=tuple(idx(a) for a in mxu.w_fwd),
        )
    return pallas_mxu_u64(x, sub, inverse=inverse, interpret=interpret)


def _cross_stage_fwd(x, w, ws, is_u, dist: int, sp: int, ops):
    """One cross-chip CT stage: swap shards with the butterfly partner,
    then u' = u + w*v on u-side shards / v' = u - w*v on v-side."""
    perm = [(i, i ^ dist) for i in range(sp)]
    other = _tmap(lambda a: jax.lax.ppermute(a, "sp", perm), x)
    u = _sel(is_u, x, other)
    v = _sel(is_u, other, x)
    wv = ops["mulc"](v, w, ws)
    return _sel(is_u, ops["add"](u, wv), ops["sub"](u, wv))


def _cross_stage_inv(x, w, ws, is_u, dist: int, sp: int, ops):
    """GS mirror: u' = u + v ; v' = (u - v) * w."""
    perm = [(i, i ^ dist) for i in range(sp)]
    other = _tmap(lambda a: jax.lax.ppermute(a, "sp", perm), x)
    u = _sel(is_u, x, other)
    v = _sel(is_u, other, x)
    return _sel(is_u, ops["add"](u, v), ops["mulc"](ops["sub"](u, v), w, ws))


def _local_ct(x, table, shoup, ops, s_lo: int, logn: int, logsp: int,
              rank, xnp: bool):
    """CT stages s_lo..logn-1, shard-local, per-shard table slices."""
    n_local = 1 << (logn - logsp)
    lead = jax.tree_util.tree_leaves(x)[0].shape[:-1]
    for s in range(s_lo, logn):
        m = 1 << s
        m_loc = m >> logsp
        t = 1 << (logn - s - 1)
        lo = m if xnp else 0
        start = lo + rank * m_loc
        tw = _dyn_slice(table, start, m_loc)
        tws = _dyn_slice(shoup, start, m_loc)
        v = _tmap(lambda a: a.reshape(lead + (m_loc, 2, t)), x)
        u_part = _tmap(lambda a: a[..., 0, :], v)
        tw_b = _tmap(lambda a: a[..., :, None], tw)
        tws_b = _tmap(lambda a: a[..., :, None], tws)
        v_part = ops["mulc"](_tmap(lambda a: a[..., 1, :], v), tw_b, tws_b)
        hi = ops["add"](u_part, v_part)
        lo_o = ops["sub"](u_part, v_part)
        x = _tmap(lambda a, b: jnp.stack([a, b], axis=-2).reshape(
            lead + (n_local,)), hi, lo_o)
    return x


def _local_gs(x, table, shoup, ops, s_lo: int, logn: int, logsp: int,
              rank, xnp: bool):
    """GS stages logn-1..s_lo (descending), shard-local."""
    n_local = 1 << (logn - logsp)
    lead = jax.tree_util.tree_leaves(x)[0].shape[:-1]
    for s in range(logn - 1, s_lo - 1, -1):
        h = 1 << s
        h_loc = h >> logsp
        t = 1 << (logn - s - 1)
        lo = h if xnp else 0
        start = lo + rank * h_loc
        tw = _dyn_slice(table, start, h_loc)
        tws = _dyn_slice(shoup, start, h_loc)
        v = _tmap(lambda a: a.reshape(lead + (h_loc, 2, t)), x)
        u_part = _tmap(lambda a: a[..., 0, :], v)
        v_part = _tmap(lambda a: a[..., 1, :], v)
        tw_b = _tmap(lambda a: a[..., :, None], tw)
        tws_b = _tmap(lambda a: a[..., :, None], tws)
        hi = ops["add"](u_part, v_part)
        lo_o = ops["mulc"](ops["sub"](u_part, v_part), tw_b, tws_b)
        x = _tmap(lambda a, b: jnp.stack([a, b], axis=-2).reshape(
            lead + (n_local,)), hi, lo_o)
    return x


def _cross_w(plan: MergePlan, table, shoup, s: int, logsp: int, rank,
             xnp: bool):
    """Per-shard scalar twiddle for cross-chip stage s: group
    g = rank >> (logsp - s), table index lo + g."""
    g = rank >> (logsp - s)
    lo = (1 << s) if xnp else 0
    w = _dyn_index(table, lo + g)
    ws = _dyn_index(shoup, lo + g)
    return w, ws


def _shard_fwd(x, plan: MergePlan, sp: int, xnp: bool, mxu=None,
               interpret=False):
    logsp = sp.bit_length() - 1
    rank = jax.lax.axis_index("sp")
    ops = plan.ops()
    for s in range(logsp):
        dist = sp >> (s + 1)
        is_u = (rank // dist) % 2 == 0
        w, ws = _cross_w(plan, plan.fwd_table, plan.fwd_shoup, s, logsp,
                         rank, xnp)
        x = _cross_stage_fwd(x, w, ws, is_u, dist, sp, ops)
    if mxu is not None:
        return _local_tail_mxu(x, mxu, rank, False, interpret)
    return _local_ct(x, plan.fwd_table, plan.fwd_shoup, ops, logsp,
                     plan.logn, logsp, rank, xnp)


def _shard_inv(x, plan: MergePlan, sp: int, xnp: bool, scale: bool,
               mxu=None, interpret=False):
    logsp = sp.bit_length() - 1
    rank = jax.lax.axis_index("sp")
    ops = plan.ops()
    if mxu is not None:
        x = _local_tail_mxu(x, mxu, rank, True, interpret)
    else:
        x = _local_gs(x, plan.inv_table, plan.inv_shoup, ops, logsp,
                      plan.logn, logsp, rank, xnp)
    for s in range(logsp - 1, -1, -1):
        dist = sp >> (s + 1)
        is_u = (rank // dist) % 2 == 0
        w, ws = _cross_w(plan, plan.inv_table, plan.inv_shoup, s, logsp,
                         rank, xnp)
        x = _cross_stage_inv(x, w, ws, is_u, dist, sp, ops)
    if scale:
        x = ops["mulc"](x, plan.n_inv_rep, plan.n_inv_shoup)
    return x


def _resolve_mxu(plan: MergePlan, sp: int, local_engine):
    if local_engine == "xla":
        return None
    if local_engine == "mxu":
        return _merge_dist_mxu(plan, sp)
    if jax.default_backend() == "tpu":
        return _merge_dist_mxu(plan, sp)
    return None


def _cross_only_plan(plan: MergePlan, sp: int) -> MergePlan:
    """Table-less plan -> plan with SP-ENTRY twiddle tables: every
    cross-chip stage index is < sp (stage s reads lo + g with
    lo = 2^s <= sp/2 for X_N_plus, 0 otherwise, and g < 2^s), so when
    the local tails run on the MXU engines the full 2^n tables are
    never touched.  The sp entries are computed directly from the root
    (bitrev-permuted table entry i = root^bitrev(i)) — KBs, trace-safe
    as constants, vs the 10s-of-MB-to-GB full tables whose in-trace
    rebuild was the r5 code-review finding."""
    import dataclasses

    p = plan.params
    cache = getattr(p, "_merge_cross_tables_cache", None)
    if cache is None:
        cache = {}
        p._merge_cross_tables_cache = cache
    if sp not in cache:
        from ..ops.merge_ntt import u64_from_numpy

        q = plan.q
        size = p.root_of_unity_size
        log_ts = size.bit_length() - 1
        m = max(2, min(sp, size))
        idx = [bitreverse(i, log_ts) for i in range(m)]
        fwd = np.array([pow(p.root_of_unity, j, q) for j in idx],
                       dtype=np.uint64)
        inv = np.array([pow(p.inverse_root_of_unity, j, q) for j in idx],
                       dtype=np.uint64)
        from ..ops import barrett as bo

        word = 64 if plan.is64 else 32
        fwd_sh = bo.shoup_companion(fwd, q, word)
        inv_sh = bo.shoup_companion(inv, q, word)
        if plan.is64:
            rep = lambda a: u64_from_numpy(a)
        else:
            rep = lambda a: jnp.asarray(a.astype(np.uint32))
        cache[sp] = (rep(fwd), rep(fwd_sh), rep(inv), rep(inv_sh))
    ft, fs, it, is_ = cache[sp]
    return dataclasses.replace(plan, fwd_table=ft, fwd_shoup=fs,
                               inv_table=it, inv_shoup=is_)


def _dist_plan_tables(plan: MergePlan, sp: int, mxu) -> MergePlan:
    """Tables for the shard computation: full butterfly tables when the
    local tails run the XLA stage sweeps, sp-entry cross-stage tables
    when the MXU engines own the tails."""
    if plan.fwd_table is not None:
        return plan
    if mxu is None:
        return plan.with_tables()
    return _cross_only_plan(plan, sp)


def merge_dist_mxu(plan: MergePlan, sp: int):
    """Resolve (and cache) the stacked MXU local-tail plans for this
    (plan, sp) — a registered pytree.  Build it OUTSIDE your jit and
    pass it through as an ARGUMENT (dist_merge_ntt(..., mxu=...)) so
    the stacked tables ride as runtime buffers; at big rings they are
    tens of MB and closure capture would inline them into HLO (the
    relay compile-payload trap).  None when no MXU tail is eligible."""
    return _merge_dist_mxu(plan, sp)


def dist_merge_ntt(x, plan: MergePlan, mesh: Mesh,
                   local_engine: str | None = None, interpret: bool = False,
                   mxu=None):
    """Forward merge NTT with the coefficient axis sharded over 'sp'.

    x: lane representation of (batch, N) with N sharded P(None, 'sp')
    (and batch optionally over 'dp').  Bit-identical to merge_ntt_lanes.
    local_engine: 'xla' | 'mxu' | None (auto: MXU on TPU where eligible).
    mxu: prebuilt merge_dist_mxu(plan, sp) pytree — pass it (and the
    plan) through your jit as ARGUMENTS at big rings."""
    sp = mesh.shape["sp"]
    xnp = plan.reduction_poly == ReductionPolynomial.X_N_plus
    if mxu is None:
        mxu = _resolve_mxu(plan, sp, local_engine)
    plan = _dist_plan_tables(plan, sp, mxu)
    spec = P("dp", "sp") if "dp" in mesh.shape else P(None, "sp")
    f = jax.shard_map(
        partial(_shard_fwd, plan=plan, sp=sp, xnp=xnp, mxu=mxu,
                interpret=interpret),
        mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False,
    )
    return f(x)


def dist_merge_intt(x, plan: MergePlan, mesh: Mesh, scale: bool = True,
                    local_engine: str | None = None, interpret: bool = False,
                    mxu=None):
    """Inverse merge NTT (GS), coefficient-sharded; n^-1 fused last.
    mxu as in dist_merge_ntt."""
    sp = mesh.shape["sp"]
    xnp = plan.reduction_poly == ReductionPolynomial.X_N_plus
    if mxu is None:
        mxu = _resolve_mxu(plan, sp, local_engine)
    plan = _dist_plan_tables(plan, sp, mxu)
    spec = P("dp", "sp") if "dp" in mesh.shape else P(None, "sp")
    f = jax.shard_map(
        partial(_shard_inv, plan=plan, sp=sp, xnp=xnp, scale=scale, mxu=mxu,
                interpret=interpret),
        mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False,
    )
    return f(x)
