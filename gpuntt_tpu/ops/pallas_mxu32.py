"""MXU-resident merged NTT for 32-bit moduli.

Same A x B digit-matmul factorization as pallas_mxu.py, but 32-bit
data needs only FOUR radix-256 digits per operand — 16 MXU dots per
phase instead of 64 — and the lazy intermediates collapse back into
one uint32 plane between phases (3q < 2^32 for the q < 2^30 pool
moduli), so the W product is a plain 32-bit lazy Shoup multiply.

Bit-identical to merge_ntt_lanes for genuine roots; q < 2^30.

Measured on v5e (2^16, batch 256): 2.02 ms vs the VPU roll kernel's
1.54 ms — a 32-bit Shoup modmul is only ~6 lane multiplies, so the
digit-combine overhead outweighs the MXU win and the dispatcher keeps
u32 on the VPU kernel.  The engine stays available for benchmarking
and for hardware where the balance differs.
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
from .pallas_mxu import (ConstsDict, _corr_left, _corr_right,
                         _modmat_phase, _pow_matrix, balanced_digits,
                         reduction_consts, w_factor)

ND32 = 4
NDIAG32 = 2 * ND32 - 1  # 7


def _consts32(q: int):
    return ConstsDict(reduction_consts(q, NDIAG32))


def _lazy_to_u32(s: U64, consts):
    """u64 lazy residue -> u32 lazy residue < 3q (Barrett-by-1)."""
    from .pallas_mxu import _cu64

    qc = _cu64(consts["q"])
    r = bo.shoup_mul64_lazy(s, bo.u64_const(1), _cu64(consts["one_s"]), qc)
    return r.lo  # 3q < 2^32


@dataclass(frozen=True)
class MXU32Plan:
    logn: int
    q: int
    A: int
    B: int
    fwd_left: Any      # (ND32, A, A) int8
    fwd_left_corr: Any
    fwd_right: Any     # (ND32, B, B) int8 (transposed)
    fwd_right_corr: Any
    w_fwd: Any         # 2x (A, B) uint32: value, shoup
    inv_right: Any
    inv_right_corr: Any
    inv_left: Any      # n^-1 folded
    inv_left_corr: Any
    w_inv: Any
    consts: Any

    @staticmethod
    def from_params(p: NTTParameters) -> "MXU32Plan":
        xnp = p.poly_reduction == ReductionPolynomial.X_N_plus
        return MXU32Plan.from_spec(
            p.modulus.value, p.logn, p.root_of_unity,
            p.inverse_root_of_unity, xnp, p.n_inv)

    @staticmethod
    def from_spec(q: int, logn: int, root: int, iroot: int, xnp: bool,
                  n_inv: int) -> "MXU32Plan":
        if q >= 1 << 30:
            raise ValueError("u32 MXU path requires q < 2^30")
        n = 1 << logn
        order = 2 * n if xnp else n
        if pow(root, order, q) != 1 or (root * iroot) % q != 1:
            raise ValueError("MXU path requires a genuine root of unity")
        logB = min(logn, max((logn + 1) // 2, 7))
        B = 1 << logB
        A = n // B
        logA = logn - logB
        assert A <= 512 and n <= 1 << 17
        brA = [bitreverse(a, logA) for a in range(A)]
        brB = [bitreverse(b, logB) for b in range(B)]

        if xnp:
            m_base = [pow(root, B * (2 * a + 1), q) for a in brA]
            w_base = [pow(root, 2 * a + 1, q) for a in brA]
            rr_base = [pow(root, 2 * A * b, q) for b in brB]
            mi_base = [pow(iroot, B * (2 * a + 1), q) for a in brA]
            wi_base = [pow(iroot, 2 * a + 1, q) for a in brA]
            rri_base = [pow(iroot, 2 * A * b, q) for b in brB]
        else:
            m_base = [pow(root, B * a, q) for a in brA]
            w_base = [pow(root, a, q) for a in brA]
            rr_base = [pow(root, A * b, q) for b in brB]
            mi_base = [pow(iroot, B * a, q) for a in brA]
            wi_base = [pow(iroot, a, q) for a in brA]
            rri_base = [pow(iroot, A * b, q) for b in brB]

        obj = lambda v: np.array(v, dtype=object)
        mcol = _pow_matrix(obj(m_base), q, A)
        w_f = _pow_matrix(obj(w_base), q, B)
        rrT = np.ascontiguousarray(_pow_matrix(obj(rr_base), q, B).T)
        ginv_rowT = _pow_matrix(obj(rri_base), q, B)
        ginv_col = (_pow_matrix(obj(mi_base), q, A).T.astype(object)
                    * int(n_inv)) % q
        w_i = _pow_matrix(obj(wi_base), q, B)

        def dig(m):
            return balanced_digits(
                np.ascontiguousarray(m.astype(np.uint64)), ND32)

        def wpack(wm):
            wm32 = wm.astype(np.uint64)
            ws = bo.shoup_companion(wm32.astype(np.uint32), q, 32)
            return (wm32.astype(np.uint32), ws.astype(np.uint32))

        d_fl, d_fr = dig(mcol), dig(rrT)
        d_ir, d_il = dig(ginv_rowT), dig(ginv_col)
        return MXU32Plan(
            logn=logn, q=q, A=A, B=B,
            fwd_left=d_fl, fwd_left_corr=_corr_left(d_fl),
            fwd_right=d_fr, fwd_right_corr=_corr_right(d_fr),
            w_fwd=wpack(w_f),
            inv_right=d_ir, inv_right_corr=_corr_right(d_ir),
            inv_left=d_il, inv_left_corr=_corr_left(d_il),
            w_inv=wpack(w_i),
            consts=_consts32(q),
        )


# Registered pytree (cf. MXUMergePlan): tables as jit arguments.
jax.tree_util.register_dataclass(
    MXU32Plan,
    data_fields=["fwd_left", "fwd_left_corr", "fwd_right",
                 "fwd_right_corr", "w_fwd", "inv_right", "inv_right_corr",
                 "inv_left", "inv_left_corr", "w_inv"],
    meta_fields=["logn", "q", "A", "B", "consts"],
)


def mxu32_plan(params: NTTParameters) -> MXU32Plan:
    from .pallas_mxu import plan_to_device

    plan = getattr(params, "_mxu32_plan_cache", None)
    if plan is None:
        plan = plan_to_device(MXU32Plan.from_params(params))
        params._mxu32_plan_cache = plan
    return plan


def _canon32(z, q):
    z = bo.cond_sub32(z, 2 * q)
    return bo.cond_sub32(z, q)


def _fwd_kernel32(lh, lc, rh, rc, w, ws, xr, orf, *, consts, bt):
    q = consts["q"]
    for i in range(bt):
        y = _lazy_to_u32(_modmat_phase(xr[i], lh, lc, True, consts), consts)
        y = bo.shoup_mul32_lazy(y, w[...], ws[...], q)       # < 2q
        z = _lazy_to_u32(_modmat_phase(y, rh, rc, False, consts), consts)
        orf[i] = _canon32(z, q)


def _inv_kernel32(rh, rc, lh, lc, w, ws, xr, orf, *, consts, bt):
    q = consts["q"]
    for i in range(bt):
        y = _lazy_to_u32(_modmat_phase(xr[i], rh, rc, False, consts),
                         consts)
        y = bo.shoup_mul32_lazy(y, w[...], ws[...], q)
        z = _lazy_to_u32(_modmat_phase(y, lh, lc, True, consts), consts)
        orf[i] = _canon32(z, q)


def _pick_bt32(batch: int, n: int) -> int:
    """Rings per grid step: small rings (the large route's B-point rows,
    2^10-2^13) run ~1 us/step at one tiny (A, B) block per step — grid
    overhead dominates and the row phase was 70% of the u32 2^20 route
    (r5 benchmarks/u32large_diag.py).  Target ~2^16 lanes per step; the
    u32 2^17 in-VMEM top-level block stays at bt=1 (chip-proven)."""
    bt = max(1, (1 << 16) // max(n, 1))
    while batch % bt:
        bt -= 1
    return bt


def pallas_mxu_u32(x, plan: MXU32Plan, inverse: bool = False,
                   interpret: bool = False, bt: int | None = None):
    """Forward/inverse merged NTT on (batch, N) uint32 via the MXU."""
    batch, n = x.shape
    A, B = plan.A, plan.B
    if bt is None:
        bt = _pick_bt32(batch, n)
    if inverse:
        kernel = _inv_kernel32
        tabs = [plan.inv_right, plan.inv_right_corr,
                plan.inv_left, plan.inv_left_corr, *plan.w_inv]
    else:
        kernel = _fwd_kernel32
        tabs = [plan.fwd_left, plan.fwd_left_corr,
                plan.fwd_right, plan.fwd_right_corr, *plan.w_fwd]

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((bt, A, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, consts=plan.consts, bt=bt),
        out_shape=jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
        grid=(batch // bt,),
        in_specs=[*[fullspec(t) for t in tabs], blk],
        out_specs=blk,
        interpret=interpret,
    )(*tabs, x.reshape(batch, A, B))
    return out.reshape(batch, n)


# ------------------------------------------------- large rings (logn 18-23)
#
# The XLA butterfly engine collapses past logn 18 (measured 1.6 ms per
# single 2^20 u32 NTT) and the VPU roll kernel no longer fits VMEM, so
# large u32 rings recurse the factorization once, exactly like
# pallas_mxu_large.py: a 4-digit column-matmul kernel (A = 128) with the
# W product factored into a tile table and per-tile scale columns, then
# the B-point rows through the in-VMEM u32 kernel.  Here the MXU engine
# wins big even though it loses at in-VMEM sizes.

A_COL32 = 128


@dataclass(frozen=True)
class MXU32LargePlan:
    logn: int
    q: int
    A: int
    B: int
    tile: int
    col_fwd: Any
    col_fwd_corr: Any
    wt_fwd: Any   # 2x (A, T) u32 value/shoup
    ws_fwd: Any   # 2x (B//T, A, 1)
    col_inv: Any  # A^-1 folded
    col_inv_corr: Any
    wt_inv: Any
    ws_inv: Any
    row_plan: MXU32Plan  # B-point spec; inverse folds B^-1
    consts: Any
    # inverse column tile (<= tile): same scoped-VMEM asymmetry as the
    # u64 engine (pallas_mxu_large.MXULargePlan.tile_inv) — the W^-1
    # products stay live across the matmul, so the inverse gets half
    # the budget when A > the chip-proven 128
    tile_inv: int = 0

    @staticmethod
    def from_params(p: NTTParameters, a_col: int | None = None) -> "MXU32LargePlan":
        q = p.modulus.value
        if q >= 1 << 30:
            raise ValueError("u32 MXU path requires q < 2^30")
        n = p.n
        xnp = p.poly_reduction == ReductionPolynomial.X_N_plus
        root, iroot = p.root_of_unity, p.inverse_root_of_unity
        order = 2 * n if xnp else n
        if pow(root, order, q) != 1 or (root * iroot) % q != 1:
            raise ValueError("MXU path requires a genuine root of unity")
        A = a_col or max(A_COL32, n >> 16)
        B = n // A
        logA = A.bit_length() - 1
        logB = p.logn - logA
        assert 1 <= logB <= 17
        assert A <= 512, "A <= 512 keeps int8-digit accumulators exact"
        # A*T capped at the chip-proven 2^18 u32 lanes (A=128 T=2048,
        # r1/r2 mxu32-large cells); inverse halved for A > 128 like the
        # u64 engine's tile_inv
        tile = min(B, 2048, max(128, (1 << 18) // A))
        tile_inv = tile if A <= 128 else min(B, max(128, (1 << 17) // A))
        brA = [bitreverse(a, logA) for a in range(A)]

        if xnp:
            m_base = [pow(root, B * (2 * a + 1), q) for a in brA]
            w_base = [pow(root, 2 * a + 1, q) for a in brA]
            mi_base = [pow(iroot, B * (2 * a + 1), q) for a in brA]
            wi_base = [pow(iroot, 2 * a + 1, q) for a in brA]
            row_root, row_iroot = pow(root, 2 * A, q), pow(iroot, 2 * A, q)
        else:
            m_base = [pow(root, B * a, q) for a in brA]
            w_base = [pow(root, a, q) for a in brA]
            mi_base = [pow(iroot, B * a, q) for a in brA]
            wi_base = [pow(iroot, a, q) for a in brA]
            row_root, row_iroot = pow(root, A, q), pow(iroot, A, q)

        obj = lambda v: np.array(v, dtype=object)
        mcol = _pow_matrix(obj(m_base), q, A)
        a_inv = pow(A, q - 2, q)
        ginv_col = (_pow_matrix(obj(mi_base), q, A).T.astype(object)
                    * a_inv) % q

        wt_f, ws_f = w_factor(w_base, np.arange(tile),
                              np.arange(B // tile) * tile, q)
        wt_i, ws_i = w_factor(wi_base, np.arange(tile_inv),
                              np.arange(B // tile_inv) * tile_inv, q)

        def dig(m):
            return balanced_digits(
                np.ascontiguousarray(m.astype(np.uint64)), ND32)

        def pack32(wm):
            wm32 = wm.astype(np.uint32)
            return (wm32, bo.shoup_companion(wm32, q, 32))

        col_fwd = dig(mcol)
        col_inv = dig(ginv_col)
        row_plan = MXU32Plan.from_spec(q, logB, row_root, row_iroot,
                                       xnp=False, n_inv=pow(B, q - 2, q))
        return MXU32LargePlan(
            logn=p.logn, q=q, A=A, B=B, tile=tile, tile_inv=tile_inv,
            col_fwd=col_fwd, col_fwd_corr=_corr_left(col_fwd),
            wt_fwd=pack32(wt_f), ws_fwd=pack32(ws_f),
            col_inv=col_inv, col_inv_corr=_corr_left(col_inv),
            wt_inv=pack32(wt_i), ws_inv=pack32(ws_i),
            row_plan=row_plan, consts=_consts32(q),
        )


jax.tree_util.register_dataclass(
    MXU32LargePlan,
    data_fields=["col_fwd", "col_fwd_corr", "wt_fwd", "ws_fwd",
                 "col_inv", "col_inv_corr", "wt_inv", "ws_inv", "row_plan"],
    meta_fields=["logn", "q", "A", "B", "tile", "consts", "tile_inv"],
)


def mxu32_large_plan(params: NTTParameters) -> "MXU32LargePlan":
    from .pallas_mxu import plan_to_device

    plan = getattr(params, "_mxu32_large_plan_cache", None)
    if plan is None:
        plan = plan_to_device(MXU32LargePlan.from_params(params))
        params._mxu32_large_plan_cache = plan
    return plan


def mxu32_plan(params: NTTParameters) -> "MXU32Plan":
    """Cached device-resident in-VMEM u32 plan — the top-level engine
    for logn 17, where the whole-block VPU kernel's scoped stack
    overflows (22.11M vs the 16M v5e limit, benchmarks/u32vpu_diag.py)
    but one ring still fits VMEM as a single MXU digit-matmul block."""
    from .pallas_mxu import plan_to_device

    plan = getattr(params, "_mxu32_plan_cache", None)
    if plan is None:
        plan = plan_to_device(MXU32Plan.from_params(params))
        params._mxu32_plan_cache = plan
    return plan


def _w_tiled_mul32(y, wt, ws, q):
    """y (< 2^32) times the factored W, two lazy 32-bit Shoup products."""
    y = bo.shoup_mul32_lazy(y, wt[0][...], wt[1][...], q)
    return bo.shoup_mul32_lazy(y, ws[0][0], ws[1][0], q)


def _colfwd32(md, mc, wtv, wts, wsv, wss, xr, orf, *, consts):
    q = consts["q"]
    y = _lazy_to_u32(_modmat_phase(xr[0], md, mc, True, consts), consts)
    orf[0] = _w_tiled_mul32(y, (wtv, wts), (wsv, wss), q)  # < 2q, lazy


def _colinv32(md, mc, wtv, wts, wsv, wss, xr, orf, *, consts):
    q = consts["q"]
    y = _w_tiled_mul32(xr[0], (wtv, wts), (wsv, wss), q)
    z = _lazy_to_u32(_modmat_phase(y, md, mc, True, consts), consts)
    orf[0] = _canon32(z, q)


def _col_call32(x, plan: "MXU32LargePlan", inverse: bool, interpret: bool):
    batch = x.shape[0]
    A, B = plan.A, plan.B
    if inverse:
        kernel, md, mc = _colinv32, plan.col_inv, plan.col_inv_corr
        wt, ws = plan.wt_inv, plan.ws_inv
        T = plan.tile_inv or plan.tile
    else:
        kernel, md, mc = _colfwd32, plan.col_fwd, plan.col_fwd_corr
        wt, ws = plan.wt_fwd, plan.ws_fwd
        T = plan.tile

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    ws_specs = [pl.BlockSpec((1, A, 1), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM) for _ in ws]
    blk = pl.BlockSpec((1, A, T), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, consts=plan.consts),
        out_shape=jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
        grid=(batch, B // T),
        in_specs=[fullspec(md), fullspec(mc),
                  *[fullspec(t) for t in wt], *ws_specs, blk],
        out_specs=blk,
        interpret=interpret,
    )(md, mc, *wt, *ws, x.reshape(batch, A, B))


def pallas_mxu32_large(x, plan: "MXU32LargePlan", inverse: bool = False,
                       interpret: bool = False):
    """Forward/inverse merged NTT on (batch, N) uint32, logn 18-23."""
    batch, n = x.shape
    A, B = plan.A, plan.B
    if inverse:
        y = pallas_mxu_u32(x.reshape(batch * A, B), plan.row_plan,
                           inverse=True, interpret=interpret)
        return _col_call32(y.reshape(batch, n), plan, True,
                           interpret).reshape(batch, n)
    y = _col_call32(x, plan, False, interpret)
    z = pallas_mxu_u32(y.reshape(batch * A, B), plan.row_plan,
                       interpret=interpret)
    return z.reshape(batch, n)


# ------------------------------------------- staged big-N route (logn 24-25)
#
# u32 mirror of pallas_mxu_large's staged route: each phase its own
# cached jitted program (plan as pytree argument), arrays device-resident
# between them.  The reference u32 pool tops out at logn 25
# (nttparameters.cu:84-98); A = max(128, n >> 16) keeps rows at 2^16,
# inside the in-VMEM u32 kernel, so no recursion branch is needed.


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _col_phase32(x, plan: "MXU32LargePlan", inverse: bool,
                 interpret: bool = False):
    batch, n = x.shape
    return _col_call32(x, plan, inverse, interpret).reshape(batch, n)


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _row_phase32(x, plan: "MXU32LargePlan", inverse: bool,
                 interpret: bool = False):
    batch, n = x.shape
    A, B = plan.A, plan.B
    y = pallas_mxu_u32(x.reshape(batch * A, B), plan.row_plan,
                       inverse=inverse, interpret=interpret)
    return y.reshape(batch, n)


# Composed single-program jit (r4, cf. pallas_mxu_large_jit): with the
# plan as a pytree argument the composed u32 col+row program compiles
# and roundtrips on chip at 2^24-25 (chiplog/r4_composed25.out).
pallas_mxu32_large_jit = functools.partial(
    jax.jit, static_argnames=("inverse", "interpret"))(pallas_mxu32_large)


def staged_mxu32_large(x, plan: "MXU32LargePlan", inverse: bool = False,
                       interpret: bool = False):
    """Device-resident staged u32 merge NTT for logn 24-25 — utility/
    test phase chain; dispatch runs the composed single program
    (pallas_mxu32_large_jit, plan as pytree jit argument) instead."""
    if inverse:
        y = _row_phase32(x, plan, inverse=True, interpret=interpret)
        return _col_phase32(y, plan, inverse=True, interpret=interpret)
    y = _col_phase32(x, plan, inverse=False, interpret=interpret)
    return _row_phase32(y, plan, inverse=False, interpret=interpret)
