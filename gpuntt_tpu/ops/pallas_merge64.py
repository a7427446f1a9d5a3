"""Roll-based Pallas merge-NTT kernel, 64-bit data as (hi, lo) pairs.

Same structure as pallas_merge2.py; every logical u64 array is two
uint32 VMEM blocks, the butterfly math is ops.barrett's exact 64-bit
Shoup/add/sub on limb pairs (replacing the PTX uint128 path,
modular_arith.cuh:296-339).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import barrett as bo
from .limb import U64
from .pallas_merge import KernelMergePlan, LANES, _shoup
from .pallas_merge2 import _masks, _stacked_ct_patterns


def _hi(a):
    return jnp.asarray((np.asarray(a, dtype=np.uint64) >> np.uint64(32)).astype(np.uint32))


def _lo(a):
    return jnp.asarray((np.asarray(a, dtype=np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def _roll2(x: U64, shift: int, axis: int) -> U64:
    return U64(pltpu.roll(x.hi, shift, axis), pltpu.roll(x.lo, shift, axis))


def _sel2(mask, a: U64, b: U64) -> U64:
    return U64(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def _ct_stage64(x: U64, tw: U64, tws: U64, mask, t, q2: U64, q: U64) -> U64:
    """Lazy Harvey CT stage: inputs [0, 4q), outputs [0, 4q).

    wx = approx-hi lazy Shoup < 3q, normalized once to [0, 2q); the
    add/sub are unconditional.  Needs 4q < 2^64 (q <= 62 bits, the
    reference's own Data64 constraint)."""
    from .limb import u64_add, u64_sub

    size = x.hi.shape[1]
    x = bo.cond_sub64(x, q2)                      # [0, 2q)
    wx = bo.cond_sub64(bo.shoup_mul64_lazy(x, tw, tws, q), q)  # [0, 2q)
    part_u = _roll2(wx, size - t, 1)
    part_v = _roll2(x, t, 1)
    return _sel2(mask != 0,
                 u64_add(x, part_u),                       # [0, 4q)
                 u64_sub(u64_add(part_v, q2), wx))         # [0, 4q)


def _gs_stage64(x: U64, tw: U64, tws: U64, mask, t, q2: U64, q: U64) -> U64:
    from .limb import u64_add, u64_sub

    size = x.hi.shape[1]
    x = bo.cond_sub64(x, q2)                      # [0, 2q)
    sums = u64_add(x, _roll2(x, size - t, 1))     # [0, 4q)
    diffs = u64_sub(u64_add(_roll2(x, t, 1), q2), x)  # [0, 4q)
    wd = bo.cond_sub64(bo.shoup_mul64_lazy(diffs, tw, tws, q), q)  # [0, 2q)
    return _sel2(mask != 0, sums, wd)


def _canon64(x: U64, q2: U64, q: U64) -> U64:
    return bo.cond_sub64(bo.cond_sub64(x, q2), q)


def _fwd_kernel64(xh, xl, ctwh, ctwl, ctsh, ctsl, cmask, wh, wl, wsh, wsl,
                  rtwh, rtwl, rtsh, rtsl, rmask, oh, ol, trh, trl, *, q, A):
    logA = A.bit_length() - 1
    qc = bo.u64_const(q)
    q2 = bo.u64_const(2 * q)
    oh[...] = xh[...]
    ol[...] = xl[...]
    for s in range(logA):
        t = A >> (s + 1)
        r = _ct_stage64(U64(oh[...], ol[...]),
                        U64(ctwh[s], ctwl[s]), U64(ctsh[s], ctsl[s]),
                        cmask[s], t, q2, qc)
        oh[...], ol[...] = r.hi, r.lo
    r = bo.shoup_mul64_lazy(bo.cond_sub64(U64(oh[...], ol[...]), q2),
                            U64(wh[...][None], wl[...][None]),
                            U64(wsh[...][None], wsl[...][None]), qc)
    oh[...], ol[...] = r.hi, r.lo

    trh[...] = jnp.swapaxes(oh[...], -1, -2)
    trl[...] = jnp.swapaxes(ol[...], -1, -2)
    for s in range(7):
        t = LANES >> (s + 1)
        r = _ct_stage64(U64(trh[...], trl[...]),
                        U64(rtwh[s], rtwl[s]), U64(rtsh[s], rtsl[s]),
                        rmask[s], t, q2, qc)
        trh[...], trl[...] = r.hi, r.lo
    r = _canon64(U64(trh[...], trl[...]), q2, qc)
    oh[...] = jnp.swapaxes(r.hi, -1, -2)
    ol[...] = jnp.swapaxes(r.lo, -1, -2)


def _inv_kernel64(xh, xl, ctwh, ctwl, ctsh, ctsl, cmask, wh, wl, wsh, wsl,
                  rtwh, rtwl, rtsh, rtsl, rmask, nih, nil_, nish, nisl,
                  oh, ol, trh, trl, *, q, A):
    logA = A.bit_length() - 1
    qc = bo.u64_const(q)
    q2 = bo.u64_const(2 * q)
    trh[...] = jnp.swapaxes(xh[...], -1, -2)
    trl[...] = jnp.swapaxes(xl[...], -1, -2)
    for s in range(6, -1, -1):
        t = LANES >> (s + 1)
        r = _gs_stage64(U64(trh[...], trl[...]),
                        U64(rtwh[s], rtwl[s]), U64(rtsh[s], rtsl[s]),
                        rmask[s], t, q2, qc)
        trh[...], trl[...] = r.hi, r.lo
    oh[...] = jnp.swapaxes(trh[...], -1, -2)
    ol[...] = jnp.swapaxes(trl[...], -1, -2)
    r = bo.shoup_mul64_lazy(bo.cond_sub64(U64(oh[...], ol[...]), q2),
                            U64(wh[...][None], wl[...][None]),
                            U64(wsh[...][None], wsl[...][None]), qc)
    oh[...], ol[...] = r.hi, r.lo
    for s in range(logA - 1, -1, -1):
        t = A >> (s + 1)
        r = _gs_stage64(U64(oh[...], ol[...]),
                        U64(ctwh[s], ctwl[s]), U64(ctsh[s], ctsl[s]),
                        cmask[s], t, q2, qc)
        oh[...], ol[...] = r.hi, r.lo
    r = bo.shoup_mul64_lazy(bo.cond_sub64(U64(oh[...], ol[...]), q2),
                            U64(nih[0, 0], nil_[0, 0]),
                            U64(nish[0, 0], nisl[0, 0]), qc)
    r = _canon64(r, q2, qc)
    oh[...], ol[...] = r.hi, r.lo


def _pick_bt64(batch: int, n: int) -> int:
    budget = 10 * 1024 * 1024
    per = n * 8 * 10  # hi+lo blocks x ~10 live copies
    bt = max(1, budget // per)
    while batch % bt:
        bt -= 1
    return bt


def pallas_merge2_u64(x: U64, plan: KernelMergePlan, inverse: bool = False,
                      interpret: bool = False, bt: int | None = None) -> U64:
    """Forward/inverse merged NTT on U64 lane pairs via Pallas.

    x: U64 with .hi/.lo of shape (batch, N) uint32.
    """
    batch, n = x.hi.shape
    A = plan.A
    q = plan.q
    if bt is None:
        bt = _pick_bt64(batch, n)

    if inverse:
        colt, w2, rowt = plan.col_inv, plan.w_inv, plan.row_inv
    else:
        colt, w2, rowt = plan.col_fwd, plan.w_fwd, plan.row_fwd

    ctw = _stacked_ct_patterns(colt, A, plan.xnp)[..., None]
    rtw = _stacked_ct_patterns(rowt, LANES, False)[..., None]
    cts = _shoup(ctw, q, 64)
    rts = _shoup(rtw, q, 64)
    w2s = _shoup(w2, q, 64)
    cmask = jnp.asarray(_masks(A)[..., None])
    rmask = jnp.asarray(_masks(LANES)[..., None])

    tabs = [
        _hi(ctw), _lo(ctw), _hi(cts), _lo(cts), cmask,
        _hi(w2), _lo(w2), _hi(w2s), _lo(w2s),
        _hi(rtw), _lo(rtw), _hi(rts), _lo(rts), rmask,
    ]
    extra = []
    if inverse:
        ninv = np.array([[plan.n_inv]], dtype=np.uint64)
        ninvs = _shoup(ninv, q, 64)
        extra = [_hi(ninv), _lo(ninv), _hi(ninvs), _lo(ninvs)]

    kernel = _inv_kernel64 if inverse else _fwd_kernel64
    table_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM)
        for _ in range(len(tabs) + len(extra))
    ]
    blk = pl.BlockSpec((bt, A, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    oh, ol = pl.pallas_call(
        functools.partial(kernel, q=q, A=A),
        out_shape=(
            jax.ShapeDtypeStruct((batch, A, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((batch, A, LANES), jnp.uint32),
        ),
        grid=(batch // bt,),
        in_specs=[blk, blk, *table_specs],
        out_specs=(blk, blk),
        scratch_shapes=[
            pltpu.VMEM((bt, LANES, A), jnp.uint32),
            pltpu.VMEM((bt, LANES, A), jnp.uint32),
        ],
        interpret=interpret,
    )(x.hi.reshape(batch, A, LANES), x.lo.reshape(batch, A, LANES),
      *tabs, *extra)
    return U64(oh.reshape(batch, n), ol.reshape(batch, n))
