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
from .pallas_mxu import (GROUP, OFF, _corr_left, _corr_right, _modmat_phase,
                         _pow_matrix, balanced_digits)

ND32 = 4
NDIAG32 = 2 * ND32 - 1  # 7


def _consts32(q: int):
    r40 = (1 << 40) % q
    offtot = 0
    for d in range(NDIAG32):
        g, k = divmod(d, GROUP)
        offtot += (OFF << (8 * k)) << (40 * g)
    return dict(q=q, r40=r40, r40s=(r40 << 64) // q, cadd=(-offtot) % q,
                one_s=(1 << 64) // q, chain=())


def _lazy_to_u32(s: U64, consts):
    """u64 lazy residue -> u32 lazy residue < 3q (Barrett-by-1)."""
    qc = bo.u64_const(consts["q"])
    r = bo.shoup_mul64_lazy(s, bo.u64_const(1), bo.u64_const(consts["one_s"]),
                            qc)
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
        q = p.modulus.value
        if q >= 1 << 30:
            raise ValueError("u32 MXU path requires q < 2^30")
        xnp = p.poly_reduction == ReductionPolynomial.X_N_plus
        root, iroot = p.root_of_unity, p.inverse_root_of_unity
        n = p.n
        order = 2 * n if xnp else n
        if pow(root, order, q) != 1 or (root * iroot) % q != 1:
            raise ValueError("MXU path requires a genuine root of unity")
        logB = min(p.logn, max((p.logn + 1) // 2, 7))
        B = 1 << logB
        A = n // B
        logA = p.logn - logB
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
                    * int(p.n_inv)) % q
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
            logn=p.logn, q=q, A=A, B=B,
            fwd_left=d_fl, fwd_left_corr=_corr_left(d_fl),
            fwd_right=d_fr, fwd_right_corr=_corr_right(d_fr),
            w_fwd=wpack(w_f),
            inv_right=d_ir, inv_right_corr=_corr_right(d_ir),
            inv_left=d_il, inv_left_corr=_corr_left(d_il),
            w_inv=wpack(w_i),
            consts=_consts32(q),
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


def _fwd_kernel32(lh, lc, rh, rc, w, ws, xr, orf, *, consts):
    q = consts["q"]
    y = _lazy_to_u32(_modmat_phase(xr[0], lh, lc, True, consts), consts)
    y = bo.shoup_mul32_lazy(y, w[...], ws[...], q)       # < 2q
    z = _lazy_to_u32(_modmat_phase(y, rh, rc, False, consts), consts)
    orf[0] = _canon32(z, q)


def _inv_kernel32(rh, rc, lh, lc, w, ws, xr, orf, *, consts):
    q = consts["q"]
    y = _lazy_to_u32(_modmat_phase(xr[0], rh, rc, False, consts), consts)
    y = bo.shoup_mul32_lazy(y, w[...], ws[...], q)
    z = _lazy_to_u32(_modmat_phase(y, lh, lc, True, consts), consts)
    orf[0] = _canon32(z, q)


def pallas_mxu_u32(x, plan: MXU32Plan, inverse: bool = False,
                   interpret: bool = False):
    """Forward/inverse merged NTT on (batch, N) uint32 via the MXU."""
    batch, n = x.shape
    A, B = plan.A, plan.B
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

    blk = pl.BlockSpec((1, A, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, consts=plan.consts),
        out_shape=jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
        grid=(batch,),
        in_specs=[*[fullspec(t) for t in tabs], blk],
        out_specs=blk,
        interpret=interpret,
    )(*tabs, x.reshape(batch, A, B))
    return out.reshape(batch, n)
