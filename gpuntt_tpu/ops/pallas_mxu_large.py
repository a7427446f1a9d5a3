"""Large-ring merged NTT on the MXU (logn 18-23) — six-step composition.

pallas_mxu.py holds a whole (A, B) polynomial in VMEM, capping it at
N <= 2^17.  Larger rings recurse the same factorization once more:

    merge_N(x).reshape(A, B) = merge_B( W o colNTT_A(x) )  per row

with A = 128 columns handled by one digit-matmul Pallas kernel gridded
over (batch, B-tiles), and the B-point row transforms delegated to the
in-VMEM MXU kernel as a (batch*A, B) batch (B <= 2^17).  This is the
TPU analog of the reference's multi-launch ForwardCore/ForwardCore_
split for n >= 2^25 (ntt.cu:2163-2224): the grid boundary replaces the
kernel-launch boundary as the "communication round".

The W twiddle table for 2^24 would be 268 MB per direction; instead W
factors exactly as

    W[a, jT + t] = base_a^(jT) * base_a^t      (T = column tile width)

so the kernel multiplies by a small (A, T) tile table and a per-tile
(A, 1) scale column — two lazy Shoup products instead of one, and no
big table anywhere.  All arithmetic is exact; outputs are bit-identical
to merge_ntt_lanes.  Covers the full reference Barrett domain q < 2^62
(wide moduli switch the digit combine to radix-2^32 groups, see
pallas_mxu.combine_mode).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params.bitrev import bitreverse
from ..params.merge import NTTParameters, ReductionPolynomial
from . import barrett as bo
from .limb import U64
from .pallas_mxu import (MXUMergePlan, _canon, _corr_left, _corr_right,
                         _modmat_phase, _pow_matrix, _split_u32,
                         balanced_digits, kernel_consts, reduction_consts,
                         vmem_params, w_factor, NDIAG)

A_COL = 128  # column count: one MXU tile of left-matmul reduction


@dataclass(frozen=True)
class MXULargePlan:
    """Column-phase tables + the row-transform sub-plan."""

    logn: int
    q: int
    A: int
    B: int
    tile: int  # column tile width T
    # forward column phase
    col_fwd: Any        # (ND, A, A) int8
    col_fwd_corr: Any
    wt_fwd: Any         # 4x (A, T) u32: W tile table (hi, lo, sh, sl)
    ws_fwd: Any         # 4x (A, B//T) u32: per-tile scale columns
    # inverse column phase (A^-1 folded)
    col_inv: Any
    col_inv_corr: Any
    wt_inv: Any
    ws_inv: Any
    row_plan: Any           # B-point merge spec; its inverse folds B^-1 ...
    # ... or, when B <= 512, single right-matmul row tables (healthy
    # MXU contraction where a nested from_spec split would degenerate)
    row_fwd: Any = None     # (ND, B, B) int8, R^T digits
    row_fwd_corr: Any = None
    row_inv: Any = None     # Ginv_row^T digits with B^-1 folded
    row_inv_corr: Any = None
    # direction-split delegated rows at logB == max_row_logn + 1 (= 2^17
    # in production): the in-VMEM kernel at 2^17 beats the nested-plan
    # recursion ~2x per row batch (32.9 vs 64.8 ms on (512, 2^17), r5
    # benchmarks/inv26_rows_diag.py).  The forward fits the default
    # scoped-VMEM cap; the INVERSE needs 16.66M > Mosaic's 16M default,
    # so row_plan_inv carries vmem_limit (r5 — before the cap was
    # understood to be a default, only the forward delegated and the
    # 2^26 inverse paid the recursion's third kernel + second W pass:
    # 85.4 vs 53.0 ms).  None when logB is fully in-VMEM or beyond the
    # delegation ceiling.
    row_plan_fwd: Any = None
    row_plan_inv: Any = None
    r40: int = 0
    r40s: int = 0
    cadd: int = 0
    canon_chain: tuple = ()
    # inverse column tile (<= tile): the inverse kernel's VMEM stack runs
    # ~2-3M hotter than the forward's at the same tile (the W^-1 Shoup
    # products stay live across the matmul) — merge24 A=256 T=512
    # measured 18.22M against the 16M scoped limit where the forward fit
    tile_inv: int = 0
    # scoped-VMEM cap override in bytes for the COLUMN kernels (0 =
    # Mosaic's 16M default; see MXUMergePlan.vmem_limit) — r5: the
    # tile_inv halving was a workaround for the default cap, not a
    # hardware limit
    vmem_limit: int = 0

    @staticmethod
    def from_params(p: NTTParameters, a_col: int | None = None,
                    tile: int | None = None,
                    nd: int | None = None) -> "MXULargePlan":
        q = p.modulus.value
        xnp = p.poly_reduction == ReductionPolynomial.X_N_plus
        if a_col is None and p.logn == 18:
            # from_params feeds the COMPOSED single-program route
            # (dispatch mxu-large, logn 18-23), where the plan tables
            # inline into the HLO as constants.  The balanced A=512
            # split's tables (~8 MB of int8 digit matrices) push that
            # program's MLIR payload to 6.4 MB and the relay compile
            # helper crashes on it — reproduced 4x incl. a k=1 bracket
            # (benchmarks/merge18_diag.py, r3).  A=128 with delegated
            # in-VMEM rows is the same scale as logn 19-23 (which
            # compile), bit-exact, ~10% slower at batch 32 (67e6fa9).
            # The A=512 split stays the default in from_spec, where the
            # staged/recursion consumers (e.g. the 2^27 row phase) pass
            # plans as jit ARGUMENTS and compile fine — chip PASS at
            # merge 27 (RESULTS_r3).
            a_col = A_COL
        return MXULargePlan.from_spec(
            q, p.logn, p.root_of_unity, p.inverse_root_of_unity, xnp,
            pow(p.n, q - 2, q), a_col=a_col, tile=tile, nd=nd)

    @staticmethod
    def from_eval(q: int, logn: int, omega: int, iomega: int, psi: int,
                  ipsi: int, n_inv: int, **kw) -> "MXULargePlan":
        """Large-ring plan for the generalized evaluation transform

            out[k] = sum_j x[j] * (psi * omega^bitrev(k, logn))^j  mod q

        — the large-engine twin of MXUMergePlan.from_eval (which holds
        one ring in VMEM and stops at 2^17).  Covers the twisted local
        tails of a coefficient-sharded merge NTT at big rings (shard r
        of sp computes exactly this with omega = root^sp and
        psi = psi_full^(2 br(r) + 1); see parallel/merge_dist.py).  The
        psi twist rides entirely in the COLUMN phase (e_a = psi *
        omega^br(a) replaces omega^br(a) in the column matrix and the
        factored W); the row transform stays the standard omega^A merge
        NTT, so nested row plans and in-VMEM delegation are untouched.
        Requires only omega^n == 1; psi may be any unit."""
        if pow(omega, 1 << logn, q) != 1 or (omega * iomega) % q != 1 \
                or (psi * ipsi) % q != 1:
            raise ValueError("from_eval requires omega^n == 1 and exact "
                             "inverses")
        return MXULargePlan.from_spec(q, logn, omega, iomega, False,
                                      n_inv, psi=psi, ipsi=ipsi, **kw)

    @staticmethod
    def from_spec(q: int, logn: int, root: int, iroot: int, xnp: bool,
                  n_inv: int, a_col: int | None = None,
                  tile: int | None = None, max_row_logn: int = 16,
                  row_kwargs: dict | None = None,
                  col_only: bool = False, psi: int = 1,
                  ipsi: int = 1, vmem_limit: int = 0,
                  nd: int | None = None) -> "MXULargePlan":
        """Plan for a merge NTT given its field spec (`root` is omega
        for X_N_minus, psi for X_N_plus; `n_inv` is the total inverse
        scaling, folded into the last-applied column matrix).  psi/ipsi
        is the evaluation twist (X_N_minus form only — see from_eval).

        `row_kwargs` configures the NESTED recursion rows only
        (logB > max_row_logn + 1, or wide q); the delegation branch
        (logB == max_row_logn + 1, q < 2^60) builds in-VMEM row plans
        and does not read it.

        logn 18-23 composes one column kernel with in-VMEM rows; for
        logn 24-28 — the reference's big-N range with 3-4-launch plans
        (ntt.cuh:665-698, ForwardCore_ ntt.cu:2163-2224) — rows beyond
        2^17 recurse into a nested MXULargePlan; since r4 the whole
        composition compiles as ONE program with the plan as a pytree
        jit argument (pallas_mxu_large_jit)."""
        if q >= 1 << 62:
            raise ValueError("MXU path requires q < 2^62")
        if psi != 1 and xnp:
            raise ValueError("the psi twist uses the X_N_minus form "
                             "(X_N_plus is the psi=root special case)")
        n = 1 << logn
        order = 2 * n if xnp else n
        if (pow(root, order, q) != 1 or (root * iroot) % q != 1):
            raise ValueError("MXU path requires a genuine root of unity")
        # Column-count rule: A = 128 except (a) a balanced split with
        # single-matmul rows at logn 18 (nested from_spec rows would
        # degenerate to contraction-16 dots), (b) wider columns when the
        # rows would exceed the in-VMEM kernel, capped at A = 512 — the
        # exactness bound on the diagonal accumulators (|acc| < 2^28
        # needs contraction <= 512); logn >= 27 rows recurse instead.
        if a_col:
            A = a_col
        elif logn == 18 or logn >= 25:
            A = 512
        else:
            A = max(A_COL, n >> 16)
        assert A <= 512, "A <= 512 keeps diagonal accumulators exact"
        B = n // A
        logA = A.bit_length() - 1
        logB = logn - logA
        assert logB >= 1, "column split must leave a row transform"
        # column tile scales inversely with A: the kernel's VMEM stack is
        # proportional to A*T (the inverse variant at A=512, T=512
        # measured 20.9M against the 16M scoped limit); the RNS wrapper
        # passes a smaller tile (its table blocks are double-buffered).
        # The inverse gets half the forward's budget (see tile_inv doc).
        if tile is None:
            tile = min(B, max(128, (1 << 17) // A))
            # inverse stack grows with A: chip-measured fits/overflows —
            # A=128 T=1024 fits (r2 logn 20-23 inverse cells), A=256
            # T=512 is 18.22M > 16M, A=512 T=512 was 20.9M.  A raised
            # vmem_limit lifts the cap those numbers were measured
            # against, so the inverse keeps the forward's tile.
            if vmem_limit:
                tile_inv = tile
            else:
                tile_inv = tile if A <= 128 else min(B, max(128, (1 << 16) // A))
        else:
            tile = min(tile, B)
            tile_inv = tile
        r, ri = root, iroot
        brA = [bitreverse(a, logA) for a in range(A)]

        if xnp:
            m_base = [pow(r, B * (2 * a + 1), q) for a in brA]
            w_base = [pow(r, 2 * a + 1, q) for a in brA]
            mi_base = [pow(ri, B * (2 * a + 1), q) for a in brA]
            wi_base = [pow(ri, 2 * a + 1, q) for a in brA]
            row_root, row_iroot = pow(r, 2 * A, q), pow(ri, 2 * A, q)
        else:
            # psi = 1 reduces e_a = psi * r^br(a) to the classic bases
            w_base = [psi * pow(r, a, q) % q for a in brA]
            m_base = [pow(e, B, q) for e in w_base]
            wi_base = [ipsi * pow(ri, a, q) % q for a in brA]
            mi_base = [pow(e, B, q) for e in wi_base]
            row_root, row_iroot = pow(r, A, q), pow(ri, A, q)

        mcol = _pow_matrix(np.array(m_base, dtype=object), q, A)
        ginv_colT = _pow_matrix(np.array(mi_base, dtype=object), q, A)
        # rows carry their natural B^-1; the column matrix (applied last
        # in the inverse) absorbs the rest of the caller's n_inv —
        # n_inv * B == A^-1 for the standard full-transform scaling
        c_inv = (n_inv * B) % q
        ginv_col = (ginv_colT.T.astype(object) * c_inv) % q

        wt_f, ws_f = w_factor(w_base, np.arange(tile),
                              np.arange(B // tile) * tile, q)
        wt_i, ws_i = w_factor(wi_base, np.arange(tile_inv),
                              np.arange(B // tile_inv) * tile_inv, q)

        # digit count by modulus width (auto_nd, r5): fewer diagonals in
        # the column kernels for narrow moduli; delegated/nested row
        # plans pick the same nd for the same q via their own defaults
        if nd is None:
            from .pallas_mxu import auto_nd

            nd = auto_nd(q)

        def dig(m):
            return balanced_digits(np.ascontiguousarray(m.astype(np.uint64)),
                                   nd)

        def pack(wm):
            wm = wm.astype(np.uint64)
            wsh = bo.shoup_companion(wm, q, 64)
            return (*_split_u32(wm), *_split_u32(wsh))

        col_fwd = dig(mcol)
        col_inv = dig(ginv_col)

        kw: dict = {}
        if col_only:
            # column-phase consumer (the distributed 4-step's local
            # col-NTT + W step): skip the row-table build entirely —
            # _row_call must never run on such a plan
            kw = dict(row_plan=None)
        elif B <= 512:
            logB_ = B.bit_length() - 1
            brB = [bitreverse(b, logB_) for b in range(B)]
            rrT = np.ascontiguousarray(_pow_matrix(
                np.array([pow(row_root, b, q) for b in brB], dtype=object),
                q, B).T)
            b_inv = pow(B, q - 2, q)
            grT = (_pow_matrix(
                np.array([pow(row_iroot, b, q) for b in brB], dtype=object),
                q, B).astype(object) * b_inv) % q
            d_rf, d_ri = dig(rrT), dig(grT)
            kw = dict(row_plan=None,
                      row_fwd=d_rf, row_fwd_corr=_corr_right(d_rf),
                      row_inv=d_ri, row_inv_corr=_corr_right(d_ri))
        elif logB <= max_row_logn:
            # max_row_logn is 16, not the kernel's forward 2^17 ceiling:
            # the in-VMEM INVERSE kernel needs 16.66M scoped VMEM at
            # 2^17 (v5e limit 16M, chiplog/r3_merge26.out) — 2^17 rows
            # recurse into a nested plan instead (merge 2^26 with A=512)
            kw = dict(row_plan=MXUMergePlan.from_spec(
                q, logB, row_root, row_iroot, xnp=False,
                n_inv=pow(B, q - 2, q), nd=nd))
        else:
            if logB == max_row_logn + 1 and q < (1 << 60):
                # the in-VMEM kernel covers one step past max_row_logn
                # in BOTH directions and beats the nested-plan recursion
                # ~2x per row batch (32.9 vs 64.8 ms on (512, 2^17), r5
                # benchmarks/inv26_rows_diag.py) — no nested row_plan is
                # built at all.  q < 2^60 keeps the chip-proven
                # 5-diagonal combine; wide moduli recurse instead.  Each
                # direction ships only the tables it reads (several MB
                # at B = 2^17, ADVICE r3); the inverse carries the
                # raised scoped-VMEM cap it needs (16.66M measured vs
                # the 16M Mosaic default — pre-r5 that default was
                # mistaken for hardware and the inverse recursed: the
                # 85.4-vs-53.0 ms asymmetry at 2^26).
                import dataclasses

                from .pallas_mxu import fwd_only, inv_only

                rp = MXUMergePlan.from_spec(
                    q, logB, row_root, row_iroot, xnp=False,
                    n_inv=pow(B, q - 2, q), nd=nd)
                kw = dict(row_plan=None,
                          row_plan_fwd=fwd_only(rp),
                          row_plan_inv=dataclasses.replace(
                              inv_only(rp), vmem_limit=24 << 20))
            else:
                # rows beyond the in-VMEM kernel: recurse (logn 27-28 —
                # the analog of the reference's extra launches for big N)
                kw = dict(row_plan=MXULargePlan.from_spec(
                    q, logB, row_root, row_iroot, xnp=False,
                    n_inv=pow(B, q - 2, q), max_row_logn=max_row_logn,
                    nd=nd, **(row_kwargs or {})))

        rc = reduction_consts(q, 2 * nd - 1)

        return MXULargePlan(
            logn=logn, q=q, A=A, B=B, tile=tile, tile_inv=tile_inv,
            vmem_limit=vmem_limit,
            col_fwd=col_fwd, col_fwd_corr=_corr_left(col_fwd),
            wt_fwd=pack(wt_f), ws_fwd=pack(ws_f),
            col_inv=col_inv, col_inv_corr=_corr_left(col_inv),
            wt_inv=pack(wt_i), ws_inv=pack(ws_i),
            r40=rc["r40"], r40s=rc["r40s"], cadd=rc["cadd"],
            canon_chain=rc["chain"], **kw,
        )


# Registered pytree: tables enter jit as runtime buffers, so the staged
# phase functions below are plain module-level jits whose cache is keyed
# on (plan structure + table shapes + meta) — one compile per plan, C++
# fast path on every later call.  Round 2's eager route re-built fresh
# pallas_call closures per invocation and re-lowered every call (merge
# 2^24 measured 10.6 s/NTT); this is the fix.
jax.tree_util.register_dataclass(
    MXULargePlan,
    data_fields=["col_fwd", "col_fwd_corr", "wt_fwd", "ws_fwd",
                 "col_inv", "col_inv_corr", "wt_inv", "ws_inv",
                 "row_plan", "row_fwd", "row_fwd_corr",
                 "row_inv", "row_inv_corr", "row_plan_fwd",
                 "row_plan_inv"],
    meta_fields=["logn", "q", "A", "B", "tile", "r40", "r40s", "cadd",
                 "canon_chain", "tile_inv", "vmem_limit"],
)


def mxu_large_plan(params: NTTParameters) -> MXULargePlan:
    from .pallas_mxu import plan_to_device

    plan = getattr(params, "_mxu_large_plan_cache", None)
    if plan is None:
        plan = plan_to_device(MXULargePlan.from_params(params))
        params._mxu_large_plan_cache = plan
    return plan


def _w_tiled_mul(y: U64, wt, ws, consts) -> U64:
    """Two lazy Shoup products: by the W tile table, then by the
    per-tile scale column (broadcast along lanes)."""
    qc = bo.u64_const(consts["q"])
    wth, wtl, wtsh, wtsl = wt
    wsh_, wsl_, wssh, wssl = ws
    y = bo.shoup_mul64_lazy(y, U64(wth[...], wtl[...]),
                            U64(wtsh[...], wtsl[...]), qc)
    return bo.shoup_mul64_lazy(y, U64(wsh_[0], wsl_[0]),
                               U64(wssh[0], wssl[0]), qc)


def _colfwd_kernel(md, mc, wth, wtl, wtsh, wtsl, wsh_, wsl_, wssh, wssl,
                   xh, xl, oh, ol, *, consts):
    x = U64(xh[0], xl[0])                                 # (A, T)
    y = _modmat_phase(x, md, mc, True, consts)            # Mcol @ X, lazy
    y = _w_tiled_mul(y, (wth, wtl, wtsh, wtsl),
                     (wsh_, wsl_, wssh, wssl), consts)    # o W, < 3q
    oh[0] = y.hi
    ol[0] = y.lo


def _colinv_kernel(md, mc, wth, wtl, wtsh, wtsl, wsh_, wsl_, wssh, wssl,
                   xh, xl, oh, ol, *, consts):
    x = U64(xh[0], xl[0])
    y = _w_tiled_mul(x, (wth, wtl, wtsh, wtsl),
                     (wsh_, wsl_, wssh, wssl), consts)    # o W^-1, < 3q
    z = _modmat_phase(y, md, mc, True, consts)            # (A^-1 Ginv) @
    z = _canon(z, consts)
    oh[0] = z.hi
    ol[0] = z.lo


def _col_call(x: U64, plan: MXULargePlan, inverse: bool,
              interpret: bool) -> U64:
    batch, n = x.hi.shape
    A, B = plan.A, plan.B
    consts = kernel_consts(plan)
    if inverse:
        kernel, md, mc = _colinv_kernel, plan.col_inv, plan.col_inv_corr
        wt, ws = plan.wt_inv, plan.ws_inv
        T = plan.tile_inv or plan.tile
    else:
        kernel, md, mc = _colfwd_kernel, plan.col_fwd, plan.col_fwd_corr
        wt, ws = plan.wt_fwd, plan.ws_fwd
        T = plan.tile

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    wt_specs = [fullspec(t) for t in wt]
    ws_specs = [pl.BlockSpec((1, A, 1), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM) for _ in ws]
    blk = pl.BlockSpec((1, A, T), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)

    oh, ol = pl.pallas_call(
        functools.partial(kernel, consts=consts),
        out_shape=(jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, A, B), jnp.uint32)),
        grid=(batch, B // T),
        in_specs=[fullspec(md), fullspec(mc), *wt_specs, *ws_specs, blk, blk],
        out_specs=(blk, blk),
        # in-place: each grid step reads and writes the same (i, 0, j)
        # block, so the outputs alias the data inputs.  Besides saving
        # a buffer, this stops XLA placing a small (batch*N <= ~2^19)
        # output on the kernel's scoped-VMEM stack, which overflowed
        # the 16M v5e limit at logn 18 batch 1 (19.16M measured).
        input_output_aliases={10: 0, 11: 1},
        compiler_params=vmem_params(plan),
        interpret=interpret,
    )(md, mc, *wt, *ws, x.hi.reshape(batch, A, B), x.lo.reshape(batch, A, B))
    return U64(oh, ol)


def col_phase_local(x: U64, plan: MXULargePlan, ws_local, inverse: bool,
                    interpret: bool = False) -> U64:
    """Column phase on a SHARD-LOCAL slice (the distributed 4-step's
    local col-NTT + W step, parallel/fourstep_dist.py).

    x: (batch, A, B_local) with B_local = plan.B / sp; `ws_local` is
    this shard's slice of the per-tile W scale columns (leading axis
    B_local // tile — sharded alongside the data by the caller's
    shard_map specs, so the factored W product lands on the right
    global column indices).  Forward computes W o (Mcol @ X); inverse
    computes Ginv_col @ (W^-1 o X) — exactly the production column
    kernels, gridded over the local tile count."""
    batch, A, B_local = x.hi.shape
    consts = kernel_consts(plan)
    if inverse:
        kernel, md, mc = _colinv_kernel, plan.col_inv, plan.col_inv_corr
        wt = plan.wt_inv
        T = plan.tile_inv or plan.tile
    else:
        kernel, md, mc = _colfwd_kernel, plan.col_fwd, plan.col_fwd_corr
        wt = plan.wt_fwd
        T = plan.tile
    assert B_local % T == 0, (B_local, T)

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    wt_specs = [fullspec(t) for t in wt]
    ws_specs = [pl.BlockSpec((1, A, 1), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM) for _ in ws_local]
    blk = pl.BlockSpec((1, A, T), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        functools.partial(kernel, consts=consts),
        out_shape=(jax.ShapeDtypeStruct((batch, A, B_local), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, A, B_local), jnp.uint32)),
        grid=(batch, B_local // T),
        in_specs=[fullspec(md), fullspec(mc), *wt_specs, *ws_specs, blk, blk],
        out_specs=(blk, blk),
        input_output_aliases={10: 0, 11: 1},
        compiler_params=vmem_params(plan),
        interpret=interpret,
    )(md, mc, *wt, *ws_local, x.hi, x.lo)
    return U64(oh, ol)


def _row_matmul_kernel(md, mc, xh, xl, oh, ol, *, consts):
    x = U64(xh[0], xl[0])                                  # (T1, B)
    z = _canon(_modmat_phase(x, md, mc, False, consts), consts)
    oh[0] = z.hi
    ol[0] = z.lo


def _row_matmul_call(x: U64, plan: MXULargePlan, inverse: bool,
                     interpret: bool) -> U64:
    batch = x.hi.shape[0]
    A, B = plan.A, plan.B
    consts = kernel_consts(plan)
    md, mc = ((plan.row_inv, plan.row_inv_corr) if inverse
              else (plan.row_fwd, plan.row_fwd_corr))
    t1 = min(A, max(8, (1 << 20) // (B * 8)))
    while A % t1:
        t1 -= 1

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((1, t1, B), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        functools.partial(_row_matmul_kernel, consts=consts),
        out_shape=(jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, A, B), jnp.uint32)),
        grid=(batch, A // t1),
        in_specs=[fullspec(md), fullspec(mc), blk, blk],
        out_specs=(blk, blk),
        # same in-place aliasing rationale as _col_call
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(md, mc, x.hi, x.lo)
    return U64(oh, ol)


def _row_call(x: U64, plan: MXULargePlan, inverse: bool,
              interpret: bool) -> U64:
    """Row-phase dispatch: single right-matmul kernel (B <= 512),
    the in-VMEM kernel (B <= 2^17), or a nested large plan (beyond)."""
    from .pallas_mxu import pallas_mxu_u64

    batch, n = x.hi.shape
    A, B = plan.A, plan.B
    if (plan.row_plan is None and plan.row_plan_fwd is None
            and plan.row_plan_inv is None):
        xv = U64(x.hi.reshape(batch, A, B), x.lo.reshape(batch, A, B))
        y = _row_matmul_call(xv, plan, inverse=inverse, interpret=interpret)
        return U64(y.hi.reshape(batch, n), y.lo.reshape(batch, n))
    rows = U64(x.hi.reshape(batch * A, B), x.lo.reshape(batch * A, B))
    if not inverse and plan.row_plan_fwd is not None:
        y = pallas_mxu_u64(rows, plan.row_plan_fwd, inverse=False,
                           interpret=interpret)
    elif inverse and plan.row_plan_inv is not None:
        y = pallas_mxu_u64(rows, plan.row_plan_inv, inverse=True,
                           interpret=interpret)
    elif isinstance(plan.row_plan, MXULargePlan):
        y = pallas_mxu_large_u64(rows, plan.row_plan, inverse=inverse,
                                 interpret=interpret)
    else:
        y = pallas_mxu_u64(rows, plan.row_plan, inverse=inverse,
                           interpret=interpret)
    return U64(y.hi.reshape(batch, n), y.lo.reshape(batch, n))


def pallas_mxu_large_u64(x: U64, plan: MXULargePlan, inverse: bool = False,
                         interpret: bool = False) -> U64:
    """Forward/inverse merged NTT on (batch, N) u64 pairs, logn 18-28.

    The WHOLE range composes into ONE program (r4): with the plan as a
    pytree jit ARGUMENT the composed col+row program compiles at every
    size 18-28 and beats the staged phase chain (8.28 ms at 2^24, -41%
    fwd at 2^26 — chiplog/r4_composed*.out).  The pre-r4 belief that
    "composed big-N programs overwhelm the compiler" was a misdiagnosis
    of the closure-constant inline path (tables inlined into HLO).
    Dispatch uses pallas_mxu_large_jit; staged_mxu_large_u64 remains as
    utility/test code mirroring the reference's multi-launch big-N
    plans (ntt.cuh:665-698, ntt.cu:2163-2224)."""
    batch, n = x.hi.shape
    if inverse:
        # rows first (merge_B inverse, B^-1 folded), then W^-1 + columns
        y = _row_call(x, plan, inverse=True, interpret=interpret)
        z = _col_call(y, plan, inverse=True, interpret=interpret)
        return U64(z.hi.reshape(batch, n), z.lo.reshape(batch, n))
    y = _col_call(x, plan, inverse=False, interpret=interpret)
    y = U64(y.hi.reshape(batch, n), y.lo.reshape(batch, n))
    return _row_call(y, plan, inverse=False, interpret=interpret)


# Composed single-program jit (r4): with the plan as a pytree ARGUMENT
# the composed col+row program compiles on chip all the way to 2^25 —
# the r3 "composed 2^24 crashes the relay" barrier was the
# closure-constant path (inline tables), not program size.  Measured at
# 2^24: 8.50/8.35 ms fwd/inv vs the staged route's 10.1/10.8 (-16%),
# and the result is JITTABLE (chiplog/r4_composed24.out, r4_composed25).
pallas_mxu_large_jit = functools.partial(
    jax.jit, static_argnames=("inverse", "interpret"))(pallas_mxu_large_u64)


def pallas_mxu_large_polymul_inv(fa: U64, fb: U64, plan: MXULargePlan,
                                 interpret: bool = False) -> U64:
    """INTT(fa o fb) on the large-ring route with the pointwise product
    fused into the row phase's kernel (see pallas_mxu_polymul_inv_u64)
    — requires delegated MXUMergePlan rows (logn 19-23 production
    shapes); callers fall back to pointwise + inverse otherwise."""
    from .pallas_mxu import pallas_mxu_polymul_inv_u64

    if not isinstance(plan.row_plan, MXUMergePlan):
        raise ValueError("fused polymul needs MXUMergePlan rows")
    batch, n = fa.hi.shape
    A, B = plan.A, plan.B
    ra = U64(fa.hi.reshape(batch * A, B), fa.lo.reshape(batch * A, B))
    rb = U64(fb.hi.reshape(batch * A, B), fb.lo.reshape(batch * A, B))
    y = pallas_mxu_polymul_inv_u64(ra, rb, plan.row_plan,
                                   interpret=interpret)
    y = U64(y.hi.reshape(batch, n), y.lo.reshape(batch, n))
    z = _col_call(y, plan, inverse=True, interpret=interpret)
    return U64(z.hi.reshape(batch, n), z.lo.reshape(batch, n))


pallas_mxu_large_polymul_inv_jit = functools.partial(
    jax.jit, static_argnames=("interpret",))(pallas_mxu_large_polymul_inv)


# ------------------------------------------- staged big-N route (logn >= 24)
#
# The TPU analog of the reference's 3-4-launch big-N plans
# (ntt.cuh:665-698, ForwardCore_ ntt.cu:2163-2224): the column phase and
# the row phase each compile as their OWN jitted program.  Both wrappers
# are module-level jits taking the plan as a pytree argument, so the jit
# cache persists across calls and across plans of the same shape — the
# first call per (plan meta, batch) compiles, every later call is a C++
# cache hit with arrays resident on device.  Phase in/out shapes are
# flat (batch, N): the (A, B) relayout lives inside each program.


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _col_phase(x: U64, plan: MXULargePlan, inverse: bool,
               interpret: bool = False) -> U64:
    batch, n = x.hi.shape
    y = _col_call(x, plan, inverse=inverse, interpret=interpret)
    return U64(y.hi.reshape(batch, n), y.lo.reshape(batch, n))


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _row_phase(x: U64, plan: MXULargePlan, inverse: bool,
               interpret: bool = False) -> U64:
    # Nested MXULargePlan rows (logn 27-28) compose col+row inside THIS
    # program: the nested logB never exceeds 19 (A >= 512 above logn 24),
    # well inside the jittable composed range (<= 23).
    return _row_call(x, plan, inverse=inverse, interpret=interpret)


def staged_mxu_large_u64(x: U64, plan: MXULargePlan, inverse: bool = False,
                         interpret: bool = False) -> U64:
    """Device-resident staged merge NTT for logn 24-28: two cached
    jitted programs chained eagerly, arrays staying on device between
    them.  Utility/test code since r4 — the composed single program
    (pallas_mxu_large_jit with the plan as a pytree jit argument) is
    faster at every size and is what dispatch runs; this phase chain
    is kept for phase-by-phase diagnosis and timing."""
    if inverse:
        y = _row_phase(x, plan, inverse=True, interpret=interpret)
        return _col_phase(y, plan, inverse=True, interpret=interpret)
    y = _col_phase(x, plan, inverse=False, interpret=interpret)
    return _row_phase(y, plan, inverse=False, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_polymul_inv_phase(fa: U64, fb: U64, plan: MXULargePlan,
                           interpret: bool = False) -> U64:
    """Pointwise product of two spectra fused into the row-INVERSE
    program (pallas_mxu_polymul_inv_u64 on the delegated rows) — the
    staged big-N analog of the in-VMEM fused polymul kernel, saving the
    HBM round trip of the full-ring product buffer."""
    from .pallas_mxu import pallas_mxu_polymul_inv_u64

    batch, n = fa.hi.shape
    A, B = plan.A, plan.B
    ra = U64(fa.hi.reshape(batch * A, B), fa.lo.reshape(batch * A, B))
    rb = U64(fb.hi.reshape(batch * A, B), fb.lo.reshape(batch * A, B))
    y = pallas_mxu_polymul_inv_u64(ra, rb, plan.row_plan,
                                   interpret=interpret)
    return U64(y.hi.reshape(batch, n), y.lo.reshape(batch, n))


def staged_mxu_large_polymul(a: U64, b: U64, plan: MXULargePlan,
                             interpret: bool = False) -> U64:
    """Device-resident staged polymul, INTT(NTT(a) o NTT(b)), for
    logn >= 24 rings whose rows delegate to the in-VMEM kernel
    (merge 24-25): five cached jitted programs — col/row forward per
    input, then product+row-inverse fused in one program, then the
    inverse column phase.  Raises ValueError when rows recurse
    (logn >= 26) — callers fall back to the unfused staged chain."""
    if not isinstance(plan.row_plan, MXUMergePlan):
        raise ValueError("staged fused polymul needs MXUMergePlan rows")
    fa = _row_phase(_col_phase(a, plan, inverse=False, interpret=interpret),
                    plan, inverse=False, interpret=interpret)
    fb = _row_phase(_col_phase(b, plan, inverse=False, interpret=interpret),
                    plan, inverse=False, interpret=interpret)
    y = _row_polymul_inv_phase(fa, fb, plan, interpret=interpret)
    return _col_phase(y, plan, inverse=True, interpret=interpret)
