"""Pallas TPU kernels for the merged NTT — the VMEM-resident hot path.

Replaces the reference's shared-memory kernel families
(ForwardCoreLowRing / ForwardCore / InverseCore..., ntt.cu:11-1553)
with ONE kernel per direction built on an exact algebraic identity
(validated numerically in tests/test_mxu.py):

  merge_ntt(x).reshape(A, B)
    = rowNTT_B( W ∘ colNTT_A( x.reshape(A, B) ) )

with B = 128 (the lane width), A = N/128, where
  - colNTT_A is the first log A butterfly stages — pure SUBLANE ops
    (reshapes never touch the lane axis),
  - W[a, b] = omega^(bitrev(a, log A) * b)            (X_N minus)
            = psi^((2*bitrev(a, log A) + 1) * b)      (X_N plus)
  - rowNTT_B is a B-point merge NTT with omega_B = omega^A (minus) /
    (psi^2)^A (plus), identical for every row — done as sublane ops
    after ONE in-VMEM transpose (and transposed back on store).

The inverse runs the mirror identity (row GS stages first, conjugate W,
column GS stages, fused n^-1).  Where CUDA re-tiles through shared
memory per stage group with __syncthreads (ntt.cu:503-587), the TPU
kernel holds the whole (batch_tile, N) block in VMEM and the only
relayouts are the two transposes.

All arithmetic is the same exact Shoup/add/sub lane math as the XLA
path (ops.barrett), so outputs are bit-identical to the reference.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params.bitrev import bitrev_permute, bitreverse_indices
from ..params.merge import NTTParameters, ReductionPolynomial
from . import barrett as bo

LANES = 128


# ---------------------------------------------------------------- tables


def _pow_table(base: int, q: int, n: int) -> np.ndarray:
    from .. import _native

    if _native.available():
        return _native.power_table(base % q, q, n)
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = (acc * base) % q
    return out


@dataclass(frozen=True)
class KernelMergePlan:
    """Twiddle tables laid out for the factorized kernel.

    Host-side equivalent of the reference's CreateForward/InverseNTTKernel
    plan tables (ntt.cuh:606-797): instead of launch geometry, the "plan"
    is the (col, W, row) table triple for the (A, 128) view.
    """

    logn: int
    q: int
    is64: bool
    xnp: bool
    A: int
    # forward
    col_fwd: np.ndarray  # (2A,) gpu-table prefix (covers [0:m]/[m:2m] slices)
    w_fwd: np.ndarray  # (A, 128)
    row_fwd: np.ndarray  # (128,) B-point gpu table (size 64 used for minus)
    # inverse
    col_inv: np.ndarray
    w_inv: np.ndarray
    row_inv: np.ndarray
    n_inv: int

    @staticmethod
    def from_params(p: NTTParameters) -> "KernelMergePlan":
        q = p.modulus.value
        n = p.n
        A = n // LANES
        assert A >= 1, "kernel path needs N >= 128"
        xnp = p.poly_reduction == ReductionPolynomial.X_N_plus
        logA = A.bit_length() - 1

        gt_f = bitrev_permute(p.forward_root_of_unity_table)
        gt_i = bitrev_permute(p.inverse_root_of_unity_table)
        col_fwd = np.asarray(gt_f[: 2 * A] if xnp else gt_f[:A], dtype=np.uint64)
        col_inv = np.asarray(gt_i[: 2 * A] if xnp else gt_i[:A], dtype=np.uint64)

        brA = bitreverse_indices(logA)
        if xnp:
            psi = p.root_of_unity
            ipsi = p.inverse_root_of_unity
            # W[a, b] = psi^((2*bitrev(a)+1) * b)
            w_fwd = np.empty((A, LANES), dtype=np.uint64)
            w_inv = np.empty((A, LANES), dtype=np.uint64)
            for a in range(A):
                e = 2 * int(brA[a]) + 1
                w_fwd[a] = _pow_table(pow(psi, e, q), q, LANES)
                w_inv[a] = _pow_table(pow(ipsi, e, q), q, LANES)
            omega_b = pow(psi, 2 * A, q)
            iomega_b = pow(ipsi, 2 * A, q)
        else:
            omega = p.root_of_unity
            iomega = p.inverse_root_of_unity
            w_fwd = np.empty((A, LANES), dtype=np.uint64)
            w_inv = np.empty((A, LANES), dtype=np.uint64)
            for a in range(A):
                e = int(brA[a])
                w_fwd[a] = _pow_table(pow(omega, e, q), q, LANES)
                w_inv[a] = _pow_table(pow(iomega, e, q), q, LANES)
            omega_b = pow(omega, A, q)
            iomega_b = pow(iomega, A, q)

        row_fwd = bitrev_permute(_pow_table(omega_b, q, LANES // 2))
        row_inv = bitrev_permute(_pow_table(iomega_b, q, LANES // 2))

        return KernelMergePlan(
            logn=p.logn,
            q=q,
            is64=p.dtype == np.uint64,
            xnp=xnp,
            A=A,
            col_fwd=col_fwd,
            w_fwd=w_fwd,
            row_fwd=np.asarray(row_fwd, dtype=np.uint64),
            col_inv=col_inv,
            w_inv=w_inv,
            row_inv=np.asarray(row_inv, dtype=np.uint64),
            n_inv=p.n_inv,
        )


def _u32(a):
    return jnp.asarray(np.asarray(a, dtype=np.uint64).astype(np.uint32))


def _shoup(vals: np.ndarray, q: int, word: int) -> np.ndarray:
    return bo.shoup_companion(vals.astype(np.uint64), q, word)


# ------------------------------------------------------------ u32 kernel


def _ct_sweep_u32(x, table, shoup, q, log_size, xnp, lead_shape):
    """CT stages along axis -2 of x: (..., size, L).

    Mosaic-friendly formulation: groups are carved out of the FLATTENED
    trailing (size*L) axis (layout-preserving merges of minor dims) and
    twiddle tables stay 2D (size, 1) so no 1D->3D shape casts appear.
    """
    size = 1 << log_size
    L = x.shape[-1]
    x = x.reshape(lead_shape + (size * L,))
    for s in range(log_size):
        m = 1 << s
        t = size >> (s + 1)
        lo, hi = (m, 2 * m) if xnp else (0, m)
        tw = table[lo:hi]     # (m, 1)
        tws = shoup[lo:hi]
        v = x.reshape(lead_shape + (m, 2, t * L))
        u_part = v[..., 0, :]
        v_part = bo.shoup_mul32(v[..., 1, :], tw, tws, q)
        x = jnp.concatenate(
            [bo.modadd32(u_part, v_part, q)[..., None, :],
             bo.modsub32(u_part, v_part, q)[..., None, :]],
            axis=-2,
        ).reshape(lead_shape + (size * L,))
    return x.reshape(lead_shape + (size, L))


def _ct_stage_ref(ref, table, shoup, q, s, size, L, xnp, bt):
    """One CT stage, read-modify-write through a VMEM ref so Mosaic's
    stack allocator can recycle the per-stage temporaries."""
    m = 1 << s
    t = size >> (s + 1)
    lo, hi = (m, 2 * m) if xnp else (0, m)
    tw = table[lo:hi]
    tws = shoup[lo:hi]
    v = ref[...].reshape(bt, m, 2, t * L)
    u_part = v[:, :, 0, :]
    v_part = bo.shoup_mul32(v[:, :, 1, :], tw, tws, q)
    out = jnp.concatenate(
        [bo.modadd32(u_part, v_part, q)[:, :, None, :],
         bo.modsub32(u_part, v_part, q)[:, :, None, :]],
        axis=2,
    )
    ref[...] = out.reshape(ref.shape)


def _gs_stage_ref(ref, table, shoup, q, s, size, L, xnp, bt):
    h = 1 << s
    t = size >> (s + 1)
    lo, hi = (h, 2 * h) if xnp else (0, h)
    tw = table[lo:hi]
    tws = shoup[lo:hi]
    v = ref[...].reshape(bt, h, 2, t * L)
    u_part = v[:, :, 0, :]
    v_part = v[:, :, 1, :]
    add = bo.modadd32(u_part, v_part, q)
    sub = bo.shoup_mul32(bo.modsub32(u_part, v_part, q), tw, tws, q)
    out = jnp.concatenate([add[:, :, None, :], sub[:, :, None, :]], axis=2)
    ref[...] = out.reshape(ref.shape)


def _fwd_kernel_u32(x_ref, colt, colts, w, ws, rowt, rowts, o_ref, tr_ref,
                    *, q, A, xnp):
    logA = A.bit_length() - 1
    bt = x_ref.shape[0]

    o_ref[...] = x_ref[...]  # (bt, A, 128)
    for s in range(logA):
        _ct_stage_ref(o_ref, colt[...], colts[...], q, s, A, LANES, xnp, bt)
    o_ref[...] = bo.shoup_mul32(o_ref[...], w[...][None], ws[...][None], q)

    tr_ref[...] = jnp.swapaxes(o_ref[...], -1, -2)  # (bt, 128, A)
    for s in range(7):
        _ct_stage_ref(tr_ref, rowt[...], rowts[...], q, s, LANES, A, False, bt)
    o_ref[...] = jnp.swapaxes(tr_ref[...], -1, -2)


def _gs_sweep_u32(x, table, shoup, q, log_size, xnp, lead_shape):
    size = 1 << log_size
    L = x.shape[-1]
    x = x.reshape(lead_shape + (size * L,))
    for s in range(log_size - 1, -1, -1):
        h = 1 << s
        t = size >> (s + 1)
        lo, hi = (h, 2 * h) if xnp else (0, h)
        tw = table[lo:hi]     # (h, 1)
        tws = shoup[lo:hi]
        v = x.reshape(lead_shape + (h, 2, t * L))
        u_part = v[..., 0, :]
        v_part = v[..., 1, :]
        add = bo.modadd32(u_part, v_part, q)
        sub = bo.shoup_mul32(bo.modsub32(u_part, v_part, q), tw, tws, q)
        x = jnp.concatenate(
            [add[..., None, :], sub[..., None, :]], axis=-2
        ).reshape(lead_shape + (size * L,))
    return x.reshape(lead_shape + (size, L))


def _inv_kernel_u32(x_ref, colt, colts, w, ws, rowt, rowts, ninv, ninvs, o_ref,
                    tr_ref, *, q, A, xnp):
    logA = A.bit_length() - 1
    bt = x_ref.shape[0]

    # mirror of forward: row GS stages first (transposed), then W^-1,
    # then column GS stages, then n^-1.
    tr_ref[...] = jnp.swapaxes(x_ref[...], -1, -2)  # (bt, 128, A)
    for s in range(6, -1, -1):
        _gs_stage_ref(tr_ref, rowt[...], rowts[...], q, s, LANES, A, False, bt)
    o_ref[...] = jnp.swapaxes(tr_ref[...], -1, -2)
    o_ref[...] = bo.shoup_mul32(o_ref[...], w[...][None], ws[...][None], q)
    for s in range(logA - 1, -1, -1):
        _gs_stage_ref(o_ref, colt[...], colts[...], q, s, A, LANES, xnp, bt)
    o_ref[...] = bo.shoup_mul32(o_ref[...], ninv[0, 0], ninvs[0, 0], q)


def _pick_bt(batch: int, n: int, is64: bool) -> int:
    # Mosaic's scoped-VMEM stack holds ~4-5 live copies of the block
    # during a sweep (value semantics), so keep the data block ~1 MiB.
    bytes_per = 8 if is64 else 4
    budget = 1024 * 1024
    bt = max(1, budget // (n * bytes_per))
    while batch % bt:
        bt -= 1
    return bt


def pallas_merge_u32(x, plan: KernelMergePlan, inverse: bool = False,
                     interpret: bool = False):
    """Forward/inverse merged NTT, uint32 data, via the Pallas kernel.

    x: (batch, N) uint32.  Bit-identical to merge_ntt_lanes.
    """
    batch, n = x.shape
    A = plan.A
    q = plan.q
    bt = _pick_bt(batch, n, False)

    if inverse:
        colt, w2, rowt = plan.col_inv, plan.w_inv, plan.row_inv
    else:
        colt, w2, rowt = plan.col_fwd, plan.w_fwd, plan.row_fwd

    tabs = [
        _u32(colt.reshape(-1, 1)), _u32(_shoup(colt, q, 32).reshape(-1, 1)),
        _u32(w2), _u32(_shoup(w2, q, 32)),
        _u32(rowt.reshape(-1, 1)), _u32(_shoup(rowt, q, 32).reshape(-1, 1)),
    ]
    kernel = _inv_kernel_u32 if inverse else _fwd_kernel_u32
    extra = []
    if inverse:
        ninv = np.array([[plan.n_inv]], dtype=np.uint64)
        extra = [_u32(ninv), _u32(_shoup(ninv, q, 32))]

    table_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in range(len(tabs) + len(extra))]

    out = pl.pallas_call(
        functools.partial(kernel, q=q, A=A, xnp=plan.xnp),
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
