"""MXU 4-step NTT engine — GPU_4STEP_NTT parity on the systolic array.

The reference's 4-step pipeline (ntt_4step.cu:2293-3260) runs
column-NTT kernels (T1-T4), a W product fused into the row-NTT load,
and row-NTT kernels.  Here both small transforms ARE matrices, so each
becomes one digit-matmul phase (machinery from pallas_mxu.py):

  kernel 1: right-mult by M1^T (n1-point column NTT on the (n2, n1)
            view), in-VMEM transpose, fused W product
            -> (batch, n1, n2) tiles
  kernel 2: right-mult by M2^T (n2 <= 512), or — for n2 up to 65536 —
            the rows delegate to the in-VMEM merge kernel
            (MXUMergePlan.from_spec with the n2-base root)

W tables factor as row_base_i^(g(j)) with g additively separable over
(tile, tile-index) bits, so even the inverse W (bitreversed column
exponents, nttparameters.cu:430-444) needs only a small tile table and
per-tile scale columns — no (n1, n2) table is ever materialised.

Calling convention matches fourstep_ntt_lanes/fourstep_intt_lanes
(caller-side transposes, pre-permuted INTT input, n^-1 fused into the
last factor); outputs are bit-identical.  Requires q < 2^62, u64.
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

from ..arith import host
from ..params.bitrev import bitreverse
from ..params.fourstep import NTTParameters4Step
from . import barrett as bo
from .limb import U64
from .pallas_mxu import (ConstsDict, MXUMergePlan, NDIAG, _canon,
                         _corr_right, _modmat_phase, _pow_matrix,
                         _split_u32, balanced_digits, reduction_consts,
                         w_factor)

ROW_MATMUL_MAX = 512  # n2 beyond this delegates rows to the merge kernel


def _consts(q: int):
    return ConstsDict(reduction_consts(q, NDIAG))


def _pack(wm, q):
    ws = bo.shoup_companion(wm.astype(np.uint64), q, 64)
    return (*_split_u32(wm), *_split_u32(ws))


@dataclass(frozen=True)
class FourStepMXUPlan:
    """Digit tables for the MXU 4-step engine."""

    logn: int
    q: int
    n1: int
    n2: int
    tile: int
    # kernel 1 (column NTT + W), forward and inverse
    m1T: Any
    m1T_corr: Any
    wt_fwd: Any
    ws_fwd: Any
    g1T: Any
    g1T_corr: Any
    wt_inv: Any
    ws_inv: Any
    # kernel 2 (row NTT): matmul tables when n2 <= ROW_MATMUL_MAX ...
    m2T: Any = None
    m2T_corr: Any = None
    g2T: Any = None          # n^-1 folded
    g2T_corr: Any = None
    # ... otherwise merge sub-plan for the rows
    row_plan: Any = None
    consts: Any = None

    @staticmethod
    def from_params(p: NTTParameters4Step,
                    tile: int | None = None) -> "FourStepMXUPlan":
        q = p.modulus.value
        if q >= 1 << 62 or p.dtype != np.uint64:
            raise ValueError("MXU 4-step requires u64 data and q < 2^62")
        from ..params.merge import ReductionPolynomial as _RP

        order = (p.n if p.poly_reduction == _RP.X_N_minus else 2 * p.n)
        if (pow(p.root_of_unity, order, q) != 1
                or (p.root_of_unity * p.inverse_root_of_unity) % q != 1):
            raise ValueError("MXU path requires a genuine root of unity")
        n1, n2 = p.n1, p.n2
        log1, log2 = n1.bit_length() - 1, n2.bit_length() - 1
        r1 = host.exp(p.root_of_unity, p.n // n1, p.modulus)
        r2 = host.exp(p.root_of_unity, p.n // n2, p.modulus)
        ir1 = host.modinv(r1, p.modulus)
        ir2 = host.modinv(r2, p.modulus)
        root, iroot = p.root_of_unity, p.inverse_root_of_unity

        br1 = [bitreverse(i, log1) for i in range(n1)]
        # column transform: out[c, a'] = sum_a x[c, a] * r1^(br(a')*a)
        m1 = _pow_matrix(np.array([pow(r1, b, q) for b in br1], dtype=object),
                         q, n1)                      # [a', a]
        m1T = np.ascontiguousarray(m1.T)
        # unscaled inverse: out[c, j] = sum_i x[c, i] * ir1^(br(i)*j)
        g1T = _pow_matrix(np.array([pow(ir1, b, q) for b in br1],
                                   dtype=object), q, n1)  # [i, j]

        # W factorization: forward W[i, j] = root^(br(i, log1) * j);
        # inverse W[i, j] = iroot^(i * br(j, log2))
        if tile is None:
            # column tile scales inversely with n1: the kernel's VMEM
            # stack is proportional to n1*tile, and tile=1024 at
            # n1=256 (the 2^24 = 256x65536 factorization) measured a
            # 21.2M scoped-vmem stack against the 16M limit on v5e
            tile = min(n2, 1024, max(128, (1 << 17) // n1))
        tile = min(tile, n2)
        # the max(128, ...) floor could silently break the budget if a
        # future MATRIX_DIMENSIONS entry used n1 > 1024 — fail loudly
        # instead of overflowing scoped VMEM on chip (ADVICE r2)
        assert n1 * tile <= (1 << 17), (
            f"column-phase VMEM budget exceeded: n1*tile = {n1}*{tile} "
            f"> 2^17 u64 lanes (v5e 16M scoped limit)")
        logt = tile.bit_length() - 1
        nt = n2 // tile
        fwd_bases = [pow(root, b, q) for b in br1]
        wt_f, ws_f = w_factor(fwd_bases,
                               np.arange(tile), np.arange(nt) * tile, q)
        inv_bases = [pow(iroot, i, q) for i in range(n1)]
        # j = jt*tile + t -> br(j, log2) = br(t, logt)*nt + br(jt, log nt)
        et = np.array([bitreverse(t, logt) * nt for t in range(tile)])
        es = np.array([bitreverse(jt, max(nt.bit_length() - 1, 0))
                       for jt in range(nt)])
        wt_i, ws_i = w_factor(inv_bases, et, es, q)

        kw: dict = {}
        if n2 <= ROW_MATMUL_MAX:
            br2 = [bitreverse(j, log2) for j in range(n2)]
            m2 = _pow_matrix(np.array([pow(r2, b, q) for b in br2],
                                      dtype=object), q, n2)
            m2T = np.ascontiguousarray(m2.T)
            g2T_raw = _pow_matrix(np.array([pow(ir2, b, q) for b in br2],
                                           dtype=object), q, n2)
            g2T = (g2T_raw.astype(object) * int(p.n_inv)) % q
            d_m2 = balanced_digits(m2T.astype(np.uint64))
            d_g2 = balanced_digits(g2T.astype(np.uint64))
            kw = dict(m2T=d_m2, m2T_corr=_corr_right(d_m2),
                      g2T=d_g2, g2T_corr=_corr_right(d_g2))
        else:
            kw = dict(row_plan=MXUMergePlan.from_spec(
                q, log2, r2, ir2, xnp=False, n_inv=p.n_inv))

        d_m1 = balanced_digits(m1T.astype(np.uint64))
        d_g1 = balanced_digits(g1T.astype(np.uint64))
        return FourStepMXUPlan(
            logn=p.logn, q=q, n1=n1, n2=n2, tile=tile,
            m1T=d_m1, m1T_corr=_corr_right(d_m1),
            wt_fwd=_pack(wt_f, q), ws_fwd=_pack(ws_f, q),
            g1T=d_g1, g1T_corr=_corr_right(d_g1),
            wt_inv=_pack(wt_i, q), ws_inv=_pack(ws_i, q),
            consts=_consts(q), **kw,
        )


# Registered pytree (cf. MXULargePlan): tables ride as jit arguments so
# the staged phase functions below hit the jit cache per call.
jax.tree_util.register_dataclass(
    FourStepMXUPlan,
    data_fields=["m1T", "m1T_corr", "wt_fwd", "ws_fwd",
                 "g1T", "g1T_corr", "wt_inv", "ws_inv",
                 "m2T", "m2T_corr", "g2T", "g2T_corr", "row_plan"],
    meta_fields=["logn", "q", "n1", "n2", "tile", "consts"],
)


def fourstep_mxu_plan(params: NTTParameters4Step) -> FourStepMXUPlan:
    from .pallas_mxu import plan_to_device

    plan = getattr(params, "_mxu_4step_plan_cache", None)
    if plan is None:
        plan = plan_to_device(FourStepMXUPlan.from_params(params))
        params._mxu_4step_plan_cache = plan
    return plan


# ---------------------------------------------------------------- kernels


def _w_mul(y: U64, wt, ws, consts) -> U64:
    qc = bo.u64_const(consts["q"])
    y = bo.shoup_mul64_lazy(y, U64(wt[0][...], wt[1][...]),
                            U64(wt[2][...], wt[3][...]), qc)
    return bo.shoup_mul64_lazy(y, U64(ws[0][0], ws[1][0]),
                               U64(ws[2][0], ws[3][0]), qc)


def _col_kernel(md, mc, wth, wtl, wtsh, wtsl, wsh_, wsl_, wssh, wssl,
                xh, xl, oh, ol, *, consts):
    x = U64(xh[0], xl[0])                                  # (T2, n1)
    y = _modmat_phase(x, md, mc, False, consts)            # X @ M1T, lazy
    y = U64(jnp.swapaxes(y.hi, 0, 1), jnp.swapaxes(y.lo, 0, 1))  # (n1, T2)
    y = _w_mul(y, (wth, wtl, wtsh, wtsl), (wsh_, wsl_, wssh, wssl), consts)
    oh[0] = y.hi
    ol[0] = y.lo


def _row_kernel(md, mc, xh, xl, oh, ol, *, consts):
    x = U64(xh[0], xl[0])                                  # (T1, n2)
    z = _canon(_modmat_phase(x, md, mc, False, consts), consts)
    oh[0] = z.hi
    ol[0] = z.lo


def _run_col(x: U64, plan: FourStepMXUPlan, inverse: bool,
             interpret: bool) -> U64:
    """(batch, n2, n1) pair -> (batch, n1, n2) pair (lazy residues)."""
    batch = x.hi.shape[0]
    n1, n2, T = plan.n1, plan.n2, plan.tile
    if inverse:
        md, mc, wt, ws = plan.g1T, plan.g1T_corr, plan.wt_inv, plan.ws_inv
    else:
        md, mc, wt, ws = plan.m1T, plan.m1T_corr, plan.wt_fwd, plan.ws_fwd

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    in_blk = pl.BlockSpec((1, T, n1), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, n1, T), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    ws_specs = [pl.BlockSpec((1, n1, 1), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM) for _ in ws]

    oh, ol = pl.pallas_call(
        functools.partial(_col_kernel, consts=plan.consts),
        out_shape=(jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32)),
        grid=(batch, n2 // T),
        in_specs=[fullspec(md), fullspec(mc),
                  *[fullspec(t) for t in wt], *ws_specs, in_blk, in_blk],
        out_specs=(out_blk, out_blk),
        interpret=interpret,
    )(md, mc, *wt, *ws, x.hi, x.lo)
    return U64(oh, ol)


def _run_row_matmul(x: U64, plan: FourStepMXUPlan, inverse: bool,
                    interpret: bool) -> U64:
    batch = x.hi.shape[0]
    n1, n2 = plan.n1, plan.n2
    md, mc = (plan.g2T, plan.g2T_corr) if inverse else (plan.m2T, plan.m2T_corr)
    T1 = min(n1, max(8, (1 << 20) // (n2 * 4)))
    while n1 % T1:
        T1 -= 1

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((1, T1, n2), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        functools.partial(_row_kernel, consts=plan.consts),
        out_shape=(jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32)),
        grid=(batch, n1 // T1),
        in_specs=[fullspec(md), fullspec(mc), blk, blk],
        out_specs=(blk, blk),
        interpret=interpret,
    )(md, mc, x.hi, x.lo)
    return U64(oh, ol)


def fourstep_mxu_lanes(x: U64, plan: FourStepMXUPlan, inverse: bool = False,
                       interpret: bool = False) -> U64:
    """GPU_4STEP_NTT-convention transform on (batch, N) u64 pairs.

    Forward: input pre-transposed (n2, n1) flat, output (n1, n2) flat.
    Inverse: input pre-permuted by intt_first_transpose, n^-1 fused."""
    from .pallas_mxu import pallas_mxu_u64

    batch, n = x.hi.shape
    n1, n2 = plan.n1, plan.n2
    xv = U64(x.hi.reshape(batch, n2, n1), x.lo.reshape(batch, n2, n1))
    y = _run_col(xv, plan, inverse, interpret)            # (batch, n1, n2)
    if plan.row_plan is None:
        z = _run_row_matmul(y, plan, inverse, interpret)
        return U64(z.hi.reshape(batch, n), z.lo.reshape(batch, n))
    rows = U64(y.hi.reshape(batch * n1, n2), y.lo.reshape(batch * n1, n2))
    z = pallas_mxu_u64(rows, plan.row_plan, inverse=inverse,
                       interpret=interpret)
    return U64(z.hi.reshape(batch, n), z.lo.reshape(batch, n))


# ------------------------------------------- staged big-N route (logn 24)
#
# Mirror of the merge staged route (pallas_mxu_large.staged_mxu_large_u64):
# the column and row phases run as separate CACHED module-level jits with
# the plan as a pytree argument — one compile per (plan, batch), C++ cache
# hits after, arrays resident on device between phases.  (The pre-r4
# "composed col+row overwhelms the compiler" ground for this split was
# refuted for the merge engine — plans as pytree jit arguments compile
# composed at every size; fourstep_mxu_jit is the composed twin here.)


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _col_phase4(x: U64, plan: FourStepMXUPlan, inverse: bool,
                interpret: bool = False) -> U64:
    batch, n = x.hi.shape
    xv = U64(x.hi.reshape(batch, plan.n2, plan.n1),
             x.lo.reshape(batch, plan.n2, plan.n1))
    y = _run_col(xv, plan, inverse, interpret)            # (batch, n1, n2)
    return U64(y.hi.reshape(batch, n), y.lo.reshape(batch, n))


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _row_phase4(x: U64, plan: FourStepMXUPlan, inverse: bool,
                interpret: bool = False) -> U64:
    from .pallas_mxu import pallas_mxu_u64 as _mxu

    batch, n = x.hi.shape
    n1, n2 = plan.n1, plan.n2
    if plan.row_plan is None:
        y = U64(x.hi.reshape(batch, n1, n2), x.lo.reshape(batch, n1, n2))
        z = _run_row_matmul(y, plan, inverse, interpret)
        return U64(z.hi.reshape(batch, n), z.lo.reshape(batch, n))
    rows = U64(x.hi.reshape(batch * n1, n2), x.lo.reshape(batch * n1, n2))
    z = _mxu(rows, plan.row_plan, inverse=inverse, interpret=interpret)
    return U64(z.hi.reshape(batch, n), z.lo.reshape(batch, n))


def staged_fourstep_mxu_lanes(x: U64, plan: FourStepMXUPlan,
                              inverse: bool = False,
                              interpret: bool = False) -> U64:
    """Device-resident staged 4-step transform (u64): two cached jitted
    programs chained eagerly.  NOT jittable as a whole — the eager
    analog of the reference's multi-launch 4-step recipes
    (ntt_4step.cu:2376-2394)."""
    y = _col_phase4(x, plan, inverse=inverse, interpret=interpret)
    return _row_phase4(y, plan, inverse=inverse, interpret=interpret)


# ------------------------------------------------------------ 32-bit variant
#
# Same two-kernel structure with four radix-256 digits per operand and
# single-plane uint32 data; the lazy u64 combine collapses back to a
# uint32 residue (< 3q < 2^32 for the q < 2^30 pools) before each W
# product, which is then two plain 32-bit lazy Shoup multiplies.


@dataclass(frozen=True)
class FourStep32MXUPlan:
    logn: int
    q: int
    n1: int
    n2: int
    tile: int
    m1T: Any
    m1T_corr: Any
    wt_fwd: Any   # 2x (n1, T) u32 value/shoup
    ws_fwd: Any   # 2x (n2//T, n1, 1)
    g1T: Any
    g1T_corr: Any
    wt_inv: Any
    ws_inv: Any
    m2T: Any = None
    m2T_corr: Any = None
    g2T: Any = None
    g2T_corr: Any = None
    row_plan: Any = None
    consts: Any = None

    @staticmethod
    def from_params(p: NTTParameters4Step) -> "FourStep32MXUPlan":
        from .pallas_mxu32 import MXU32Plan, ND32

        q = p.modulus.value
        if q >= 1 << 30 or p.dtype != np.uint32:
            raise ValueError("u32 MXU 4-step requires u32 data and q < 2^30")
        from ..params.merge import ReductionPolynomial as _RP

        order = (p.n if p.poly_reduction == _RP.X_N_minus else 2 * p.n)
        if (pow(p.root_of_unity, order, q) != 1
                or (p.root_of_unity * p.inverse_root_of_unity) % q != 1):
            raise ValueError("MXU path requires a genuine root of unity")
        n1, n2 = p.n1, p.n2
        log1, log2 = n1.bit_length() - 1, n2.bit_length() - 1
        r1 = host.exp(p.root_of_unity, p.n // n1, p.modulus)
        r2 = host.exp(p.root_of_unity, p.n // n2, p.modulus)
        ir1, ir2 = host.modinv(r1, p.modulus), host.modinv(r2, p.modulus)
        root, iroot = p.root_of_unity, p.inverse_root_of_unity

        br1 = [bitreverse(i, log1) for i in range(n1)]
        m1T = np.ascontiguousarray(_pow_matrix(
            np.array([pow(r1, b, q) for b in br1], dtype=object), q, n1).T)
        g1T = _pow_matrix(np.array([pow(ir1, b, q) for b in br1],
                                   dtype=object), q, n1)

        # same inverse-with-n1 tile scaling as the u64 builder: the
        # proven u32 VMEM budget is n1*tile = 2^18 lanes (logn 23 =
        # 128x65536 at tile 2048); n1=256 (logn 24) must halve the tile
        tile = min(n2, 2048, max(128, (1 << 18) // n1))
        assert n1 * tile <= (1 << 18), (
            f"u32 column-phase VMEM budget exceeded: n1*tile = {n1}*{tile} "
            f"> 2^18 u32 lanes (v5e 16M scoped limit)")
        logt = tile.bit_length() - 1
        nt = n2 // tile
        wt_f, ws_f = w_factor([pow(root, b, q) for b in br1],
                              np.arange(tile), np.arange(nt) * tile, q)
        et = np.array([bitreverse(t, logt) * nt for t in range(tile)])
        es = np.array([bitreverse(jt, max(nt.bit_length() - 1, 0))
                       for jt in range(nt)])
        wt_i, ws_i = w_factor([pow(iroot, i, q) for i in range(n1)], et, es, q)

        def dig32(m):
            return balanced_digits(
                np.ascontiguousarray(m.astype(np.uint64)), ND32)

        def pack32(wm):
            wm32 = wm.astype(np.uint32)
            return (wm32, bo.shoup_companion(wm32, q, 32))

        kw: dict = {}
        if n2 <= ROW_MATMUL_MAX:
            br2 = [bitreverse(j, log2) for j in range(n2)]
            m2T = np.ascontiguousarray(_pow_matrix(
                np.array([pow(r2, b, q) for b in br2], dtype=object),
                q, n2).T)
            g2T = (_pow_matrix(np.array([pow(ir2, b, q) for b in br2],
                                        dtype=object), q, n2).astype(object)
                   * int(p.n_inv)) % q
            d_m2, d_g2 = dig32(m2T), dig32(g2T)
            kw = dict(m2T=d_m2, m2T_corr=_corr_right(d_m2),
                      g2T=d_g2, g2T_corr=_corr_right(d_g2))
        else:
            kw = dict(row_plan=MXU32Plan.from_spec(
                q, log2, r2, ir2, xnp=False, n_inv=p.n_inv))

        from .pallas_mxu32 import NDIAG32

        d_m1, d_g1 = dig32(m1T), dig32(g1T)
        return FourStep32MXUPlan(
            logn=p.logn, q=q, n1=n1, n2=n2, tile=tile,
            m1T=d_m1, m1T_corr=_corr_right(d_m1),
            wt_fwd=pack32(wt_f), ws_fwd=pack32(ws_f),
            g1T=d_g1, g1T_corr=_corr_right(d_g1),
            wt_inv=pack32(wt_i), ws_inv=pack32(ws_i),
            consts=ConstsDict(reduction_consts(q, NDIAG32)), **kw,
        )


jax.tree_util.register_dataclass(
    FourStep32MXUPlan,
    data_fields=["m1T", "m1T_corr", "wt_fwd", "ws_fwd",
                 "g1T", "g1T_corr", "wt_inv", "ws_inv",
                 "m2T", "m2T_corr", "g2T", "g2T_corr", "row_plan"],
    meta_fields=["logn", "q", "n1", "n2", "tile", "consts"],
)


def fourstep32_mxu_plan(params: NTTParameters4Step) -> FourStep32MXUPlan:
    from .pallas_mxu import plan_to_device

    plan = getattr(params, "_mxu32_4step_plan_cache", None)
    if plan is None:
        plan = plan_to_device(FourStep32MXUPlan.from_params(params))
        params._mxu32_4step_plan_cache = plan
    return plan


def _w_mul32(y, wt, ws, q):
    y = bo.shoup_mul32_lazy(y, wt[0][...], wt[1][...], q)
    return bo.shoup_mul32_lazy(y, ws[0][0], ws[1][0], q)


def _col_kernel32(md, mc, wtv, wts, wsv, wss, xr, orf, *, consts):
    from .pallas_mxu32 import _lazy_to_u32

    q = consts["q"]
    y = _lazy_to_u32(_modmat_phase(xr[0], md, mc, False, consts), consts)
    y = jnp.swapaxes(y, 0, 1)                              # (n1, T2)
    orf[0] = _w_mul32(y, (wtv, wts), (wsv, wss), q)        # < 2q, lazy


def _row_kernel32(md, mc, xr, orf, *, consts):
    from .pallas_mxu32 import _canon32, _lazy_to_u32

    q = consts["q"]
    z = _lazy_to_u32(_modmat_phase(xr[0], md, mc, False, consts), consts)
    orf[0] = _canon32(z, q)


def _run_col32(x, plan: FourStep32MXUPlan, inverse: bool, interpret: bool):
    batch = x.shape[0]
    n1, n2, T = plan.n1, plan.n2, plan.tile
    if inverse:
        md, mc, wt, ws = plan.g1T, plan.g1T_corr, plan.wt_inv, plan.ws_inv
    else:
        md, mc, wt, ws = plan.m1T, plan.m1T_corr, plan.wt_fwd, plan.ws_fwd

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    in_blk = pl.BlockSpec((1, T, n1), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, n1, T), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    ws_specs = [pl.BlockSpec((1, n1, 1), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM) for _ in ws]
    return pl.pallas_call(
        functools.partial(_col_kernel32, consts=plan.consts),
        out_shape=jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32),
        grid=(batch, n2 // T),
        in_specs=[fullspec(md), fullspec(mc),
                  *[fullspec(t) for t in wt], *ws_specs, in_blk],
        out_specs=out_blk,
        interpret=interpret,
    )(md, mc, *wt, *ws, x)


def _run_row32_matmul(x, plan: FourStep32MXUPlan, inverse: bool,
                      interpret: bool):
    batch = x.shape[0]
    n1, n2 = plan.n1, plan.n2
    md, mc = (plan.g2T, plan.g2T_corr) if inverse else (plan.m2T, plan.m2T_corr)

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_row_kernel32, consts=plan.consts),
        out_shape=jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32),
        grid=(batch,),
        in_specs=[fullspec(md), fullspec(mc), blk],
        out_specs=blk,
        interpret=interpret,
    )(md, mc, x)


def fourstep32_mxu_lanes(x, plan: FourStep32MXUPlan, inverse: bool = False,
                         interpret: bool = False):
    """u32 GPU_4STEP_NTT-convention transform on (batch, N) uint32."""
    from .pallas_mxu32 import pallas_mxu_u32

    batch, n = x.shape
    n1, n2 = plan.n1, plan.n2
    y = _run_col32(x.reshape(batch, n2, n1), plan, inverse, interpret)
    if plan.row_plan is None:
        z = _run_row32_matmul(y, plan, inverse, interpret)
        return z.reshape(batch, n)
    z = pallas_mxu_u32(y.reshape(batch * n1, n2), plan.row_plan,
                       inverse=inverse, interpret=interpret)
    return z.reshape(batch, n)


# Cached jit wrappers for EAGER callers (fourstep._mxu_route outside a
# trace): composed single-program for the jit-safe sizes, staged
# two-program for logn 24.  Without these every eager call re-lowers.
fourstep_mxu_jit = jax.jit(fourstep_mxu_lanes,
                           static_argnames=("inverse", "interpret"))
fourstep32_mxu_jit = jax.jit(fourstep32_mxu_lanes,
                             static_argnames=("inverse", "interpret"))


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _col_phase4_32(x, plan: FourStep32MXUPlan, inverse: bool,
                   interpret: bool = False):
    batch, n = x.shape
    y = _run_col32(x.reshape(batch, plan.n2, plan.n1), plan, inverse,
                   interpret)
    return y.reshape(batch, n)


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _row_phase4_32(x, plan: FourStep32MXUPlan, inverse: bool,
                   interpret: bool = False):
    from .pallas_mxu32 import pallas_mxu_u32 as _mxu32

    batch, n = x.shape
    n1, n2 = plan.n1, plan.n2
    if plan.row_plan is None:
        z = _run_row32_matmul(x.reshape(batch, n1, n2), plan, inverse,
                              interpret)
        return z.reshape(batch, n)
    z = _mxu32(x.reshape(batch * n1, n2), plan.row_plan, inverse=inverse,
               interpret=interpret)
    return z.reshape(batch, n)


def staged_fourstep32_mxu_lanes(x, plan: FourStep32MXUPlan,
                                inverse: bool = False,
                                interpret: bool = False):
    """Device-resident staged 4-step transform (u32) — see
    staged_fourstep_mxu_lanes."""
    y = _col_phase4_32(x, plan, inverse=inverse, interpret=interpret)
    return _row_phase4_32(y, plan, inverse=inverse, interpret=interpret)
