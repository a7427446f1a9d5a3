"""Roll-based Pallas merge-NTT kernel (second-generation).

Same factorization as pallas_merge.py (col NTT over sublanes, W
product, row NTT over sublanes after one in-VMEM transpose), but each
butterfly stage is expressed as TWO sublane rolls + ONE Shoup multiply
+ masked add/sub on the full (bt, S, L) block:

    wx   = shoup(x, tw_s)              # tw_s = per-position group twiddle
    out  = where(U-slot, x + roll(wx, -t), roll(x, +t) - wx)

No reshapes ever touch the (sublane, lane) tiling, every stage runs at
full lane/sublane utilisation, and the stage loop writes back through
the block ref so Mosaic recycles the per-stage temporaries.

Per-stage twiddle patterns are precomputed host-side as stacked
(num_stages, S, 1) tables — the TPU analog of the reference's
per-stage `current_root_index` computation (ntt.cu:519-534).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import barrett as bo
from .pallas_merge import KernelMergePlan, LANES, _shoup, _u32


# --------------------------------------------------- stacked stage tables


def _stacked_ct_patterns(table: np.ndarray, size: int, xnp: bool):
    """tw_full[s, a] = stage-s group twiddle at position a (CT order)."""
    log_size = size.bit_length() - 1
    out = np.zeros((log_size, size), dtype=np.uint64)
    for s in range(log_size):
        m = 1 << s
        sl = table[m : 2 * m] if xnp else table[0:m]
        reps = size // m
        out[s] = np.repeat(np.asarray(sl, dtype=np.uint64), reps)
    return out


def _stacked_gs_patterns(table: np.ndarray, size: int, xnp: bool):
    """Same for GS stages (indexed by s descending at call sites)."""
    return _stacked_ct_patterns(table, size, xnp)


def _masks(size: int) -> np.ndarray:
    """mask[s, a] = 1 if position a is a U-slot at stage s (bit logS-1-s)."""
    log_size = size.bit_length() - 1
    a = np.arange(size)
    out = np.zeros((log_size, size), dtype=np.uint32)
    for s in range(log_size):
        out[s] = ((a >> (log_size - 1 - s)) & 1) == 0
    return out


# -------------------------------------------------------------- kernels


# Pair-stride threshold for the SPLIT (half-multiply) stage forms: at
# t >= 8 the (S//2t, 2, t, L) reshape view keeps whole (8, 128) tiles,
# so the U/V halves separate without a relayout and the Shoup product
# runs on the V HALF only — the reference butterfly's 1-modmul-per-pair
# count (CooleyTukeyUnit, ntt.cuh:69-78).  Below 8 sublanes the
# interleave would shuffle inside a tile, so those stages keep the
# full-block roll form (its multiply covers both halves — the r4
# "2x modmul waste" applied to EVERY stage before r5).
SPLIT_MIN_T = 8


def _ct_stage_split(x, tw, tws, t, q):
    """Half-multiply CT stage for t >= SPLIT_MIN_T; tw/tws are (S, 1).

    Bounds as _ct_stage_roll: in [0, 4q) -> normalize [0, 2q) -> lazy
    product < 2q -> out [0, 4q)."""
    bt, S, L = x.shape
    x = bo.cond_sub32(x, 2 * q)                       # [0, 2q)
    x5 = x.reshape(bt, S // (2 * t), 2, t, L)
    u = x5[:, :, 0]
    v = x5[:, :, 1]
    tw5 = tw.reshape(S // (2 * t), 2, t, 1)[:, 1]
    tws5 = tws.reshape(S // (2 * t), 2, t, 1)[:, 1]
    wv = bo.shoup_mul32_lazy(v, tw5, tws5, q)         # HALF block, < 2q
    out_u = u + wv                                    # [0, 4q)
    out_v = u + jnp.uint32(2 * q) - wv                # (0, 4q)
    return jnp.stack([out_u, out_v], axis=2).reshape(bt, S, L)


def _gs_stage_split(x, tw, tws, t, q):
    """Half-multiply GS stage: out_U = U+V, out_V = (U-V)*w."""
    bt, S, L = x.shape
    x = bo.cond_sub32(x, 2 * q)
    x5 = x.reshape(bt, S // (2 * t), 2, t, L)
    u = x5[:, :, 0]
    v = x5[:, :, 1]
    sums = u + v                                      # [0, 4q)
    diffs = u + jnp.uint32(2 * q) - v                 # (0, 4q)
    tw5 = tw.reshape(S // (2 * t), 2, t, 1)[:, 1]
    tws5 = tws.reshape(S // (2 * t), 2, t, 1)[:, 1]
    wd = bo.shoup_mul32_lazy(diffs, tw5, tws5, q)     # HALF block, < 2q
    return jnp.stack([sums, wd], axis=2).reshape(bt, S, L)


def _ct_stage_roll(x, tw, tws, mask, t, q):
    """One lazy CT butterfly stage on (bt, S, L); tw/tws/mask are (S, 1).

    Harvey-style: inputs in [0, 4q), one normalization to [0, 2q), lazy
    Shoup product (< 2q for u32), unconditional add / sub+2q back into
    [0, 4q).  Canonical residues appear only at the kernel epilogue.
    Dispatches to the half-multiply split form at t >= SPLIT_MIN_T."""
    if t >= SPLIT_MIN_T:
        return _ct_stage_split(x, tw, tws, t, q)
    size = x.shape[1]
    x = bo.cond_sub32(x, 2 * q)          # [0, 2q)
    wx = bo.shoup_mul32_lazy(x, tw, tws, q)  # [0, 2q)
    part_u = pltpu.roll(wx, size - t, 1)  # U slots see w*V (left roll by t)
    part_v = pltpu.roll(x, t, 1)  # V slots see U
    two_q = jnp.uint32(2 * q)
    return jnp.where(mask != 0, x + part_u, part_v + two_q - wx)


def _gs_stage_roll(x, tw, tws, mask, t, q):
    """One lazy GS stage: out_U = U+V, out_V = (U-V)*w; same bounds.
    Dispatches to the half-multiply split form at t >= SPLIT_MIN_T."""
    if t >= SPLIT_MIN_T:
        return _gs_stage_split(x, tw, tws, t, q)
    size = x.shape[1]
    x = bo.cond_sub32(x, 2 * q)          # [0, 2q)
    sums = x + pltpu.roll(x, size - t, 1)             # [0, 4q)
    diffs = pltpu.roll(x, t, 1) + jnp.uint32(2 * q) - x  # [0, 4q)
    wd = bo.shoup_mul32_lazy(diffs, tw, tws, q)       # [0, 2q)
    return jnp.where(mask != 0, sums, wd)


def _canon32(x, q):
    """[0, 4q) -> canonical [0, q)."""
    return bo.cond_sub32(bo.cond_sub32(x, 2 * q), q)


def _fwd_kernel(x_ref, ctw, ctws, cmask, w, ws, rtw, rtws, rmask, o_ref,
                tr_ref, *, q, A):
    logA = A.bit_length() - 1
    o_ref[...] = x_ref[...]  # (bt, A, 128)
    for s in range(logA):
        t = A >> (s + 1)
        o_ref[...] = _ct_stage_roll(
            o_ref[...], ctw[s], ctws[s], cmask[s], t, q
        )
    o_ref[...] = bo.shoup_mul32_lazy(
        bo.cond_sub32(o_ref[...], 2 * q), w[...][None], ws[...][None], q
    )

    tr_ref[...] = jnp.swapaxes(o_ref[...], -1, -2)  # (bt, 128, A)
    for s in range(7):
        t = LANES >> (s + 1)
        tr_ref[...] = _ct_stage_roll(
            tr_ref[...], rtw[s], rtws[s], rmask[s], t, q
        )
    o_ref[...] = jnp.swapaxes(_canon32(tr_ref[...], q), -1, -2)


def _inv_kernel(x_ref, ctw, ctws, cmask, w, ws, rtw, rtws, rmask, ninv, ninvs,
                o_ref, tr_ref, *, q, A):
    logA = A.bit_length() - 1
    tr_ref[...] = jnp.swapaxes(x_ref[...], -1, -2)  # (bt, 128, A)
    for s in range(6, -1, -1):
        t = LANES >> (s + 1)
        tr_ref[...] = _gs_stage_roll(
            tr_ref[...], rtw[s], rtws[s], rmask[s], t, q
        )
    o_ref[...] = jnp.swapaxes(tr_ref[...], -1, -2)
    o_ref[...] = bo.shoup_mul32_lazy(
        bo.cond_sub32(o_ref[...], 2 * q), w[...][None], ws[...][None], q
    )
    for s in range(logA - 1, -1, -1):
        t = A >> (s + 1)
        o_ref[...] = _gs_stage_roll(
            o_ref[...], ctw[s], ctws[s], cmask[s], t, q
        )
    o_ref[...] = _canon32(
        bo.shoup_mul32_lazy(bo.cond_sub32(o_ref[...], 2 * q),
                            ninv[0, 0], ninvs[0, 0], q), q
    )


def _pick_bt(batch: int, n: int, stages: int, bytes_per: int) -> int:
    # stack needs ~6 live block copies per stage body + in/out/scratch
    budget = 10 * 1024 * 1024
    per = n * bytes_per * 10
    bt = max(1, budget // per)
    while batch % bt:
        bt -= 1
    return bt


def pallas_merge2_u32(x, plan: KernelMergePlan, inverse: bool = False,
                      interpret: bool = False, bt: int | None = None):
    """Forward/inverse merged NTT, uint32, roll-based Pallas kernel."""
    batch, n = x.shape
    A = plan.A
    q = plan.q
    logA = A.bit_length() - 1
    if bt is None:
        bt = _pick_bt(batch, n, logA + 7, 4)

    if inverse:
        colt, w2, rowt = plan.col_inv, plan.w_inv, plan.row_inv
    else:
        colt, w2, rowt = plan.col_fwd, plan.w_fwd, plan.row_fwd

    ctw = _stacked_ct_patterns(colt, A, plan.xnp)
    rtw = _stacked_ct_patterns(rowt, LANES, False)
    cmask = _masks(A)[..., None]
    rmask = _masks(LANES)[..., None]

    tabs = [
        _u32(ctw[..., None]), _u32(_shoup(ctw, q, 32)[..., None]),
        jnp.asarray(cmask),
        _u32(w2), _u32(_shoup(w2, q, 32)),
        _u32(rtw[..., None]), _u32(_shoup(rtw, q, 32)[..., None]),
        jnp.asarray(rmask),
    ]
    extra = []
    if inverse:
        ninv = np.array([[plan.n_inv]], dtype=np.uint64)
        extra = [_u32(ninv), _u32(_shoup(ninv, q, 32))]

    kernel = _inv_kernel if inverse else _fwd_kernel
    table_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(len(tabs) + len(extra))
    ]

    out = pl.pallas_call(
        functools.partial(kernel, q=q, A=A),
        out_shape=jax.ShapeDtypeStruct((batch, A, LANES), jnp.uint32),
        grid=(batch // bt,),
        in_specs=[
            pl.BlockSpec((bt, A, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *table_specs,
        ],
        out_specs=pl.BlockSpec((bt, A, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, LANES, A), jnp.uint32)],
        interpret=interpret,
    )(x.reshape(batch, A, LANES), *tabs, *extra)
    return out.reshape(batch, n)
