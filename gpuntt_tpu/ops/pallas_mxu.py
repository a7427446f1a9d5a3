"""MXU-resident merged NTT — the 64-bit hot path on the systolic array.

The reference's Data64 kernels emulate 64x64->128 products with PTX
uint128 math on CUDA cores (modular_arith.cuh:296-339).  A TPU has a
far better tool for wide integer multiplies than its 32-bit vector
lanes: the 128x128 MXU.  This kernel computes the merged NTT through
the exact A x B matrix factorization (validated in
tests/test_mxu.py)

    merge_ntt(x).reshape(A, B) = (Mcol @ X) o W @ Rrow^T   (mod q)

with every modular matrix product decomposed into radix-256 digit
matmuls on the MXU:

  - host matrices (Mcol / Rrow^T and inverses) -> 8 BALANCED int8
    digits (exact, |d| <= 128);
  - device operands -> 8 OFFSET digits (byte - 128, one sub per byte);
    the offset's contribution is linear, so it folds into per-diagonal
    correction vectors precomputed on the host;
  - 15 diagonal int32 accumulators (|acc| < 2^28 for A <= 512, exact);
  - diagonals recombine into three u64 groups (radix 2^40; wide moduli
    in [2^60, 2^62) take four radix-2^32 groups, see combine_mode) and
    reduce with a short Horner of lazy Shoup multiplies by the group
    radix — so the only per-element VPU work is byte extraction, the
    group carries, the Horner Shoup products, and one final
    canonicalization.

Everything is exact integer arithmetic end-to-end; outputs are
bit-identical to merge_ntt_lanes and hence to the reference GPU_NTT
(ntt.cu:2076-2256).  Covers the reference's full documented Barrett
domain q < 2^62 (modular_arith.cuh:66-67).

W-scaling between the phases is one lazy Shoup multiply; the inverse
folds n^-1 into the inverse column matrix (last factor applied),
mirroring the reference's last-kernel placement (ntt.cu:1170-1192).
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
from .limb import (U64, mul64x64_128, mul64x64_lo, u128_shr_lo64, u64_add,
                   u64_shl, u64_sub)
from .pallas_merge import _pow_table

ND = 8                 # radix-256 digits per operand
NDIAG = 2 * ND - 1     # 15
OFF = 1 << 28          # diagonal sign offset (|acc| < 2^28 for A <= 512)
GROUP = 5              # diagonals per u64 group (radix 2^40 groups)
GROUP_WIDE = 4         # wide-q (2^60..2^62) grouping: radix 2^32 groups


def auto_nd(q: int) -> int:
    """Smallest exact digit count for modulus q (<= ND = 8).

    Two exactness constraints (r5, chip-verified bit-exact at 54/46-bit
    moduli — benchmarks/nd_diag.py): table entries (< q) need the
    balanced radix-256 range ~2^(8 nd - 1), and the kernel's input side
    digitizes lazy residues up to 3q with nd unsigned bytes (2^(8 nd)).
    Fewer digits shrink the diagonal count 2 nd - 1 — the VPU
    recombination that bounds the kernel (r4 duty trace) — measured
    -15% at nd=7 (q < 2^55) and -32% at nd=6 (q < ~2^46.4) on the
    headline shape."""
    for nd in range(4, ND):
        if q < 1 << (8 * nd - 1) and 3 * q < 1 << (8 * nd):
            return nd
    return ND


def combine_mode(q: int) -> tuple[int, bool]:
    """(diagonals per group, trim?) for a modulus.

    q < 2^60 takes five-diagonal radix-2^40 groups (2 Horner steps).
    The wide range [2^60, 2^62) — the rest of the reference's documented
    Barrett domain (modular_arith.cuh:66-67) — switches to four-diagonal
    radix-2^32 groups: the group values shrink to < 2^53.01, keeping
    every lazy sum below 2^64 for q < 2^62, at the cost of one more
    Horner step plus a trimming conditional subtract on the last one
    (see _modmat_phase)."""
    wide = q >= (1 << 60)
    return (GROUP_WIDE if wide else GROUP), wide


# ------------------------------------------------------------- host tables


def balanced_digits(t: np.ndarray, nd: int = ND) -> np.ndarray:
    """uint64 (..,) -> (nd, ..) int8 balanced radix-256 digits, exact.

    d_i in [-128, 127], t = sum d_i 256^i.  Vectorized byte walk with
    carry; valid for t < 2^(8*nd - 1) (top byte stays below 127 after
    carry).
    """
    t = np.asarray(t, dtype=np.uint64)
    out = np.empty((nd,) + t.shape, dtype=np.int8)
    carry = np.zeros(t.shape, dtype=np.int64)
    for i in range(nd):
        b = ((t >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.int64) + carry
        carry = (b > 127).astype(np.int64)
        out[i] = (b - 256 * carry).astype(np.int8)
    assert not carry.any(), "value out of balanced-digit range"
    return out


class ConstsDict(dict):
    """Value-hashable dict of reduction constants — lets a plan carry
    its consts as a pytree META field (jit cache keys hash the metadata,
    and a plain dict is unhashable)."""

    def __hash__(self):
        return hash(tuple(sorted(self.items())))


def reduction_consts(q: int, ndiag: int) -> dict:
    """Shared diagonal-recombination constants for every digit-matmul
    engine: the group radix (see combine_mode), the Horner multiplier
    (+ Shoup companion), the constant cancelling the per-diagonal OFF
    placements, the Barrett-by-one companion, and the final
    canonicalisation chain."""
    group, trim = combine_mode(q)
    radix = (1 << (8 * group)) % q
    offtot = 0
    for d in range(ndiag):
        g, k = divmod(d, group)
        offtot += (OFF << (8 * k)) << (8 * group * g)
    gmax = sum((2 * OFF) << (8 * k) for k in range(group))
    # phase output bound: trimmed wide plans sum (<2q lazy) + group +
    # cadd < 3q + gmax; classic plans (<3q lazy) + group + cadd < 4q + gmax
    smax = (3 if trim else 4) * q + gmax
    m = 1
    while m * q <= smax:
        m *= 2
    chain = []
    while m >= 1:
        # entries whose multiple exceeds the word can never fire
        # (s < 2^64 <= m*q) and their constant would not fit; the next
        # kept entry k still canonicalises since s < 2^64 <= 2*k*q
        if m * q < (1 << 64):
            chain.append(m)
        m //= 2
    return dict(q=q, r40=radix, r40s=(radix << 64) // q,
                cadd=(-offtot) % q, one_s=(1 << 64) // q,
                chain=tuple(chain), group=group, trim=trim)


def _row_pows(base: int, exps, q: int) -> np.ndarray:
    """base^exps[k] mod q — native sequential-power fast path when exps
    is a non-negative arithmetic progression (the tile/scale case; the
    4-step inverse W's bitreversed exponent rows take the generic
    loop).  Large-ring plans at logn 27-28 have ~10^6 table entries,
    where Python pow is minutes and this is milliseconds."""
    from .. import _native

    e = list(exps)
    if len(e) >= 4 and _native.available():
        d = int(e[1]) - int(e[0])
        if d >= 0 and all(int(e[k + 1]) - int(e[k]) == d
                          for k in range(len(e) - 1)):
            t = _native.power_table(pow(int(base), d, q), q, len(e))
            e0 = int(e[0])
            if e0:
                s = np.full(len(e), pow(int(base), e0, q), dtype=np.uint64)
                t = _native.pointwise_mult(t, s, q)
            return t
    return np.array([pow(int(base), int(x), q) for x in e], dtype=np.uint64)


def w_factor(row_bases, exps_tile, exps_scale, q: int):
    """Factored twiddle table W[i, j] = row_bases[i]^(exps_tile[t] +
    exps_scale[jt]) for j = jt*T + t -> a (rows, T) tile table plus
    (n//T, rows, 1) per-tile scale columns.  Shared by the large-ring
    and 4-step engines (the 4-step inverse W's bitreversed exponents
    are additively separable over tile bits, so the same split works)."""
    tile = np.stack([_row_pows(b, exps_tile, q) for b in row_bases])
    scale = np.stack([_row_pows(b, exps_scale, q) for b in row_bases])
    return tile, np.ascontiguousarray(scale.T)[:, :, None]


def _pow_matrix(bases: np.ndarray, q: int, length: int) -> np.ndarray:
    """rows[i] = [bases[i]^0, bases[i]^1, ...] mod q, exact."""
    return np.stack([_pow_table(int(b), q, length) for b in bases])


def _corr_left(tdig: np.ndarray) -> np.ndarray:
    """Phase with host matrix on the LEFT: dot(T_i, (x-128)_j) misses
    128 * rowsum(T_i), constant along columns -> (ndiag, A, 1) int32.

    The diagonal sign offset OFF is folded in here (cancelled later by
    the cadd constant), so the kernel never spends a vector add on it:
    accumulators leave the dot loop already non-negative."""
    nd = tdig.shape[0]
    rows = tdig.astype(np.int64).sum(axis=2)  # (nd, A)
    corr = np.zeros((2 * nd - 1, tdig.shape[1], 1), dtype=np.int64)
    for i in range(nd):
        for j in range(nd):
            corr[i + j, :, 0] += 128 * rows[i]
    assert np.abs(corr).max() < OFF
    return (corr + OFF).astype(np.int32)


def _corr_right(tdig: np.ndarray) -> np.ndarray:
    """Host matrix on the RIGHT: dot((y-128)_j, T_i) misses
    128 * colsum(T_i), constant along rows -> (ndiag, 1, B') int32.
    OFF folded in, as in _corr_left."""
    nd = tdig.shape[0]
    cols = tdig.astype(np.int64).sum(axis=1)  # (nd, B')
    corr = np.zeros((2 * nd - 1, 1, tdig.shape[2]), dtype=np.int64)
    for i in range(nd):
        for j in range(nd):
            corr[i + j, 0, :] += 128 * cols[i]
    assert np.abs(corr).max() < OFF
    return (corr + OFF).astype(np.int32)


def _split_u32(a: np.ndarray):
    a = np.asarray(a, dtype=np.uint64)
    return (
        (a >> np.uint64(32)).astype(np.uint32),
        (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )


@dataclass(frozen=True)
class MXUMergePlan:
    """Digit-decomposed factorization tables for the MXU kernel."""

    logn: int
    q: int
    A: int
    B: int
    # forward: left matrix Mcol, W, right matrix Rrow^T
    fwd_left: Any     # (ND, A, A) int8
    fwd_left_corr: Any
    fwd_right: Any    # (ND, B, B) int8  (already transposed)
    fwd_right_corr: Any
    w_fwd: Any        # 4x (A, B) uint32: hi, lo, shoup hi, shoup lo
    # inverse: right matrix Ginv_row^T first, Winv, left matrix Ginv_col*n^-1
    inv_right: Any
    inv_right_corr: Any
    inv_left: Any
    inv_left_corr: Any
    w_inv: Any
    # reduction constants
    r40: int
    r40s: int
    cadd: int
    canon_chain: tuple
    # scoped-VMEM cap override in bytes (0 = Mosaic's 16M default).
    # v5e has 128 MiB physical VMEM; kernels measured just over the
    # default (the 2^17 inverse at 16.66M, big column tiles) compile
    # and run bit-exact with the cap raised (benchmarks/vmem_limit_diag
    # r5) — plans that need it carry their own budget here.
    vmem_limit: int = 0

    @staticmethod
    def from_params(p: NTTParameters,
                    nd: int | None = None) -> "MXUMergePlan":
        xnp = p.poly_reduction == ReductionPolynomial.X_N_plus
        return MXUMergePlan.from_spec(
            p.modulus.value, p.logn, p.root_of_unity,
            p.inverse_root_of_unity, xnp, p.n_inv, nd=nd)

    @staticmethod
    def from_spec(q: int, logn: int, root: int, iroot: int, xnp: bool,
                  n_inv: int, nd: int | None = None) -> "MXUMergePlan":
        """Plan for a merge NTT given only its field spec.

        `root`/`iroot` follow the parameter conventions: for X_N_minus
        an N-th root omega; for X_N_plus a 2N-th root psi.  `n_inv`
        (folded into the inverse's last matrix) need not equal N^-1 —
        the large-ring composition passes partial scalings.

        `nd` overrides the digit count (default ND=8, exact for any
        q < 2^62): narrower moduli need fewer balanced radix-256 digits
        — q < 2^55 is exact with nd=7, q < 2^47 with nd=6 — and the
        kernel's diagonal count (2 nd - 1) falls with it, shrinking the
        VPU recombination that bounds the kernel (r4 duty trace).  The
        kernel reads the digit count from the table shapes, so no
        kernel change is needed."""
        n = 1 << logn
        # the factorization is an exponent-arithmetic identity: it needs
        # root to be a genuine (2)N-th root of unity.  The butterfly
        # engines run any table (matching the reference's
        # garbage-in/garbage-out), so invalid factors fall back there.
        order = 2 * n if xnp else n
        if pow(root, order, q) != 1 or (root * iroot) % q != 1:
            raise ValueError("MXU path requires a genuine root of unity")
        if xnp:
            omega, iomega = root * root % q, iroot * iroot % q
            psi, ipsi = root, iroot
        else:
            omega, iomega, psi, ipsi = root, iroot, 1, 1
        return MXUMergePlan.from_eval(q, logn, omega, iomega, psi, ipsi,
                                      n_inv, nd=nd)

    @staticmethod
    def from_eval(q: int, logn: int, omega: int, iomega: int, psi: int,
                  ipsi: int, n_inv: int,
                  nd: int | None = None) -> "MXUMergePlan":
        """Plan for the generalized evaluation transform

            out[k] = sum_j x[j] * (psi * omega^bitrev(k, logn))^j   mod q

        which covers the classic merge NTTs (X_N_minus: psi = 1;
        X_N_plus: omega = root^2, psi = root) AND the twisted local
        tails of a coefficient-sharded merge NTT, where shard r of sp
        computes exactly this transform with omega = root^sp (or
        psi_full^(2 sp)) and psi = psi_full^(2 bitrev(r, log sp) + 1)
        (see parallel/merge_dist.py).  Requires only omega^n == 1; psi
        may be ANY unit — the A x B factorization below is pure exponent
        algebra: with bitrev(k) = A br(b') + br(a), j = a2 B + b,

            E(k)^j = [ (psi omega^br(a))^B ]^a2          (left matrix)
                     * [ psi omega^br(a) ]^b             (W)
                     * [ omega^(A br(b')) ]^b            (right matrix)

        plus omega^(n a2 br(b')) = 1 to kill the cross term.
        """
        if q >= 1 << 62:
            raise ValueError("MXU path requires q < 2^62")
        n = 1 << logn
        if pow(omega, n, q) != 1 or (omega * iomega) % q != 1 \
                or (psi * ipsi) % q != 1:
            raise ValueError("from_eval requires omega^n == 1 and exact "
                             "inverses")
        logB = min(logn, max((logn + 1) // 2, 7))
        B = 1 << logB
        A = n // B
        logA = logn - logB
        assert A <= 512, "A <= 512 keeps diagonal accumulators exact"
        if n > 1 << 18:
            raise ValueError("MXU path holds one (A, B) poly in VMEM; "
                             "N <= 2^18 (larger rings take the large/"
                             "4-step engines)")
        # 2^18 exceeds Mosaic's default scoped-VMEM cap: plans at that
        # size only run with a raised vmem_limit (r5; 2^17 inverse
        # likewise — dispatch's consumers set it where they delegate)
        brA = np.array([bitreverse(a, logA) for a in range(A)], dtype=object)
        brB = np.array([bitreverse(b, logB) for b in range(B)], dtype=object)

        e_a = [psi * pow(omega, int(a), q) % q for a in brA]
        ei_a = [ipsi * pow(iomega, int(a), q) % q for a in brA]
        m_base = [pow(e, B, q) for e in e_a]
        w_base = e_a
        rr_base = [pow(omega, A * int(b), q) for b in brB]
        mi_base = [pow(e, B, q) for e in ei_a]
        wi_base = ei_a
        rri_base = [pow(iomega, A * int(b), q) for b in brB]

        # forward: Mcol[a, a2] = m_base[a]^a2 ; R[b', b] = rr_base[b']^b
        mcol = _pow_matrix(np.array(m_base, dtype=object), q, A)
        w_f = _pow_matrix(np.array(w_base, dtype=object), q, B)
        rrT = _pow_matrix(np.array(rr_base, dtype=object), q, B).T  # (b, b')
        # inverse right-mult table T[b1, b] = Ginv_row[b, b1] =
        # rri_base[b1]^b — _pow_matrix rows are already indexed by b1
        ginv_rowT = _pow_matrix(np.array(rri_base, dtype=object), q, B)
        ginv_colT = _pow_matrix(np.array(mi_base, dtype=object), q, A)  # [a1, a2]
        # n^-1 folded into the last-applied factor; exact object math —
        # uint64 would overflow on the product
        ginv_col = (ginv_colT.T.astype(object) * int(n_inv)) % q       # [a2, a1]
        w_i = _pow_matrix(np.array(wi_base, dtype=object), q, B)

        if nd is None:
            nd = auto_nd(q)
        # exactness at reduced digit count: table entries (< q) need
        # the balanced range ~2^(8 nd - 1), and the kernel's INPUT
        # side digitizes lazy residues up to 3q with nd unsigned
        # bytes (range 2^(8 nd)) — both must hold
        assert nd == ND or (q < 1 << (8 * nd - 1)
                            and 3 * q < 1 << (8 * nd)), (q, nd)

        def dig(m):
            return balanced_digits(np.ascontiguousarray(m.astype(np.uint64)),
                                   nd)

        def wpack(wm):
            wm = wm.astype(np.uint64)
            ws = bo.shoup_companion(wm, q, 64)
            whi, wlo = _split_u32(wm)
            wshi, wslo = _split_u32(ws)
            return (whi, wlo, wshi, wslo)

        fwd_left = dig(mcol)
        fwd_right = dig(rrT)
        inv_right = dig(ginv_rowT)
        inv_left = dig(ginv_col)

        rc = reduction_consts(q, 2 * nd - 1)

        # tables stay host numpy: they enter each trace as compile-time
        # constants, so a plan built (and cached) inside one jit trace
        # never leaks tracers into the next
        return MXUMergePlan(
            logn=logn, q=q, A=A, B=B,
            fwd_left=fwd_left,
            fwd_left_corr=_corr_left(fwd_left),
            fwd_right=fwd_right,
            fwd_right_corr=_corr_right(fwd_right),
            w_fwd=wpack(w_f),
            inv_right=inv_right,
            inv_right_corr=_corr_right(inv_right),
            inv_left=inv_left,
            inv_left_corr=_corr_left(inv_left),
            w_inv=wpack(w_i),
            r40=rc["r40"],
            r40s=rc["r40s"],
            cadd=rc["cadd"],
            canon_chain=rc["chain"],
        )


# Registered pytree (like MergePlan, merge_ntt.py:147): the digit/W
# tables become jit ARGUMENTS — runtime buffers, not inline HLO
# constants — so the staged big-N phase functions (pallas_mxu_large.py)
# hit the jit cache on every call instead of re-lowering, and chained
# benchmarks can thread the plan through `extra=`.
jax.tree_util.register_dataclass(
    MXUMergePlan,
    data_fields=["fwd_left", "fwd_left_corr", "fwd_right",
                 "fwd_right_corr", "w_fwd", "inv_right", "inv_right_corr",
                 "inv_left", "inv_left_corr", "w_inv"],
    meta_fields=["logn", "q", "A", "B", "r40", "r40s", "cadd",
                 "canon_chain", "vmem_limit"],
)


def vmem_params(plan):
    """compiler_params for a plan's scoped-VMEM budget (None = default)."""
    vl = getattr(plan, "vmem_limit", 0)
    if not vl:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(vl))


def plan_to_device(plan):
    """Move a plan's numpy tables to the device (eagerly, even under an
    ambient trace) so they enter compilations as runtime buffers rather
    than multi-MB inline HLO constants."""
    import dataclasses

    def conv(v):
        if isinstance(v, np.ndarray):
            return jax.device_put(v)
        if isinstance(v, tuple) and v and isinstance(v[0], np.ndarray):
            return tuple(jax.device_put(t) for t in v)
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return plan_to_device(v)
        return v

    with jax.ensure_compile_time_eval():
        return dataclasses.replace(
            plan,
            **{f.name: conv(getattr(plan, f.name))
               for f in dataclasses.fields(plan)},
        )


def fwd_only(plan: MXUMergePlan) -> MXUMergePlan:
    """Strip the inverse tables from a plan used forward-only.

    The large-ring recursion's delegated forward row plan
    (MXULargePlan.row_plan_fwd) never runs inverse, but from_spec builds
    and ships the full inverse tables (inv_left/inv_right/w_inv — several
    MB at B = 2^17) as pytree leaves into every jit call (ADVICE r3).
    None leaves flatten to nothing, so the stripped plan uploads and
    threads only what the forward kernel reads."""
    import dataclasses

    return dataclasses.replace(plan, inv_right=None, inv_right_corr=None,
                               inv_left=None, inv_left_corr=None, w_inv=None)


def inv_only(plan: MXUMergePlan) -> MXUMergePlan:
    """Strip the forward tables from a plan used inverse-only (the
    large-ring recursion's delegated INVERSE row plan, r5 — see
    fwd_only for the rationale)."""
    import dataclasses

    return dataclasses.replace(plan, fwd_left=None, fwd_left_corr=None,
                               fwd_right=None, fwd_right_corr=None,
                               w_fwd=None)


def mxu_plan(params: NTTParameters) -> MXUMergePlan:
    """Cached device-resident MXUMergePlan for a parameter object."""
    plan = getattr(params, "_mxu_plan_cache", None)
    if plan is None:
        plan = plan_to_device(MXUMergePlan.from_params(params))
        params._mxu_plan_cache = plan
    return plan


# ---------------------------------------------------------------- kernel


def kernel_consts(plan) -> dict:
    """Kernel consts dict from a single-modulus plan's reduction fields
    (MXUMergePlan and MXULargePlan share them) — the ONE place the
    combine mode is re-derived for kernel assembly, so a plan field
    and its group/trim can never disagree (the 4-step plan stores the
    reduction_consts dict whole instead)."""
    group, trim = combine_mode(plan.q)
    return dict(q=plan.q, r40=plan.r40, r40s=plan.r40s, cadd=plan.cadd,
                chain=plan.canon_chain, group=group, trim=trim)


def _cu64(v) -> U64:
    """Constant accessor: consts entries may be Python ints (classic
    single-modulus plans) or already-built U64 scalars (per-modulus
    constants read from an SMEM block in the RNS kernel)."""
    return v if isinstance(v, U64) else bo.u64_const(v)


def _offset_digits(x, nd: int = ND):
    """u64 pair (or bare uint32 array, nd <= 4) -> nd int8 planes of
    (byte - 128)."""
    digs = []
    for d in range(nd):
        src = x if not isinstance(x, U64) else (x.lo if d < 4 else x.hi)
        s = 8 * (d % 4)
        byte = (src >> s) & jnp.uint32(0xFF)
        digs.append((byte.astype(jnp.int32) - 128).astype(jnp.int8))
    return digs


def _modmat_phase(x: U64, t_ref, corr_ref, left: bool, consts) -> U64:
    """One modular matrix product on the MXU.

    left=True:  out = T @ X      (contract A; T (ND, A', A), X (A, B))
    left=False: out = X @ T      (contract B; T (ND, B, B'), X (A, B))
    Input may be any u64 pair — or a bare uint32 array when the host
    matrix has <= 4 digits (digits represent it exactly either way);
    output is a lazy residue < 4q + 2^61.2 that the caller reduces or
    feeds on.
    """
    nd = t_ref.shape[0]
    ndiag = 2 * nd - 1
    xa = x.hi if isinstance(x, U64) else x
    digs = _offset_digits(x, nd)
    out_shape = ((t_ref.shape[1], xa.shape[1]) if left
                 else (xa.shape[0], t_ref.shape[2]))

    qc = _cu64(consts["q"])
    r40c = _cu64(consts["r40"])
    r40sc = _cu64(consts["r40s"])
    group = consts.get("group", GROUP)
    shift = 8 * group
    # every u64 pool prime exceeds the group radix, so the Horner
    # multiplier 2^shift mod q IS 2^shift and lo64(x << shift) is a
    # static shift; the RNS kernel reads per-modulus consts from SMEM
    # (U64 tracers) and keeps the generic product
    pow2_horner = (not isinstance(consts["r40"], U64)
                   and consts["r40"] == 1 << shift)

    groups = []
    g = None
    for d in range(ndiag):
        acc = jnp.broadcast_to(corr_ref[d], out_shape)
        lo_i = max(0, d - (nd - 1))
        for i in range(lo_i, min(d, nd - 1) + 1):
            j = d - i
            if left:
                prod = jax.lax.dot_general(
                    t_ref[i], digs[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:
                prod = jax.lax.dot_general(
                    digs[j], t_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            acc = acc + prod
        a = acc.astype(jnp.uint32)  # corr carries +OFF: < 2^29, non-negative
        k = d % group
        piece = u64_shl(U64(jnp.zeros_like(a), a), 8 * k)
        g = piece if k == 0 else u64_add(g, piece)
        if k == group - 1 or d == ndiag - 1:
            groups.append(g)
            g = None

    # Horner over radix-2^shift groups: v = (..G1) * 2^shift + G0
    s = groups[-1]
    for gi in range(len(groups) - 2, -1, -1):
        m = (bo.shoup_pow2_lazy(s, shift, r40sc, qc) if pow2_horner
             else bo.shoup_mul64_lazy(s, r40c, r40sc, qc))
        if gi == 0 and consts.get("trim"):
            # wide-q plans (q in [2^60, 2^62)): drop the last lazy
            # product to < 2q so m + G0 + cadd < 3q + gmax stays below
            # 2^64 right up to the 62-bit bound
            m = bo.cond_sub64(m, _cu64(2 * consts["q"]))
        s = u64_add(m, groups[gi])
    s = u64_add(s, _cu64(consts["cadd"]))
    return s


def _canon(s: U64, consts) -> U64:
    cc = consts.get("chain_c")
    if cc is None:
        cc = [m * consts["q"] for m in consts["chain"]]
    for c in cc:
        s = bo.cond_sub64(s, _cu64(c))
    return s


def _w_mul_lazy(x: U64, w_refs, consts) -> U64:
    whi, wlo, wshi, wslo = w_refs
    return bo.shoup_mul64_lazy(
        x, U64(whi[...], wlo[...]), U64(wshi[...], wslo[...]),
        _cu64(consts["q"]))


def _fwd_kernel(lh, lcorr, rh, rcorr, wh, wl, wsh, wsl, xh, xl, oh, ol,
                *, consts):
    x = U64(xh[0], xl[0])
    y = _modmat_phase(x, lh, lcorr, True, consts)          # Mcol @ X, lazy
    y = _w_mul_lazy(y, (wh, wl, wsh, wsl), consts)          # o W, < 3q
    z = _modmat_phase(y, rh, rcorr, False, consts)          # @ Rrow^T
    z = _canon(z, consts)
    oh[0] = z.hi
    ol[0] = z.lo


def _inv_kernel(rh, rcorr, lh, lcorr, wh, wl, wsh, wsl, xh, xl, oh, ol,
                *, consts):
    x = U64(xh[0], xl[0])
    y = _modmat_phase(x, rh, rcorr, False, consts)          # @ Ginv_row^T
    y = _w_mul_lazy(y, (wh, wl, wsh, wsl), consts)          # o W^-1, < 3q
    z = _modmat_phase(y, lh, lcorr, True, consts)           # (n^-1 Ginv_col) @
    z = _canon(z, consts)
    oh[0] = z.hi
    ol[0] = z.lo


def _inv_mul_kernel(rh, rcorr, lh, lcorr, wh, wl, wsh, wsl,
                    xah, xal, xbh, xbl, oh, ol, *, consts):
    """Fused NTT-domain product + inverse transform: the polymul
    pipeline's pointwise stage runs INSIDE the inverse kernel, saving
    one full HBM round trip of the product buffer (the reference
    computes mult host-side between launches, ntt_cpu.cu:67-79; the
    unfused TPU pipeline pays write+read of batch*N*8B between the
    pointwise XLA op and the inverse pallas_call).

    The product is the exact reference Barrett (modular_arith.cuh:
    328-338) minus the final conditional subtract: the inverse's first
    digit-matmul phase is exact for ANY u64 input and linear over Z, so
    a < 2q lazy product yields the identical canonical output."""
    a = U64(xah[0], xal[0])
    b = U64(xbh[0], xbl[0])
    qc = _cu64(consts["q"])
    z = mul64x64_128(a, b)
    w = u128_shr_lo64(z, consts["bit"] - 2)
    t = mul64x64_128(w, _cu64(consts["mu"]))
    w2 = u128_shr_lo64(t, consts["bit"] + 3)
    x = u64_sub(z.lo64, mul64x64_lo(w2, qc))               # < 2q lazy
    y = _modmat_phase(x, rh, rcorr, False, consts)          # @ Ginv_row^T
    y = _w_mul_lazy(y, (wh, wl, wsh, wsl), consts)          # o W^-1, < 3q
    out = _modmat_phase(y, lh, lcorr, True, consts)         # (n^-1 Ginv) @
    out = _canon(out, consts)
    oh[0] = out.hi
    ol[0] = out.lo


def pallas_mxu_polymul_inv_u64(fa: U64, fb: U64, plan: MXUMergePlan,
                               interpret: bool = False) -> U64:
    """INTT(fa o fb) in one kernel — fa, fb canonical NTT-domain
    (batch, N) u64 pairs (the two forward spectra)."""
    batch, n = fa.hi.shape
    A, B = plan.A, plan.B
    consts = kernel_consts(plan)
    bit = plan.q.bit_length()
    consts["bit"] = bit
    consts["mu"] = (1 << (2 * bit + 1)) // plan.q
    tabs = [plan.inv_right, plan.inv_right_corr,
            plan.inv_left, plan.inv_left_corr, *plan.w_inv]

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    table_specs = [fullspec(t) for t in tabs]
    blk = pl.BlockSpec((1, A, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    oh, ol = pl.pallas_call(
        functools.partial(_inv_mul_kernel, consts=consts),
        out_shape=(jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, A, B), jnp.uint32)),
        grid=(batch,),
        in_specs=[*table_specs, blk, blk, blk, blk],
        out_specs=(blk, blk),
        compiler_params=vmem_params(plan),
        interpret=interpret,
    )(*tabs, fa.hi.reshape(batch, A, B), fa.lo.reshape(batch, A, B),
      fb.hi.reshape(batch, A, B), fb.lo.reshape(batch, A, B))
    return U64(oh.reshape(batch, n), ol.reshape(batch, n))


def pallas_mxu_u64(x: U64, plan: MXUMergePlan, inverse: bool = False,
                   interpret: bool = False) -> U64:
    """Forward/inverse merged NTT on (batch, N) u64 lane pairs via MXU."""
    batch, n = x.hi.shape
    A, B = plan.A, plan.B
    consts = kernel_consts(plan)

    if inverse:
        kernel = _inv_kernel
        tabs = [plan.inv_right, plan.inv_right_corr,
                plan.inv_left, plan.inv_left_corr, *plan.w_inv]
    else:
        kernel = _fwd_kernel
        tabs = [plan.fwd_left, plan.fwd_left_corr,
                plan.fwd_right, plan.fwd_right_corr, *plan.w_fwd]

    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    table_specs = [fullspec(t) for t in tabs]
    blk = pl.BlockSpec((1, A, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    oh, ol = pl.pallas_call(
        functools.partial(kernel, consts=consts),
        out_shape=(jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, A, B), jnp.uint32)),
        grid=(batch,),
        in_specs=[*table_specs, blk, blk],
        out_specs=(blk, blk),
        compiler_params=vmem_params(plan),
        interpret=interpret,
    )(*tabs, x.hi.reshape(batch, A, B), x.lo.reshape(batch, A, B))
    return U64(oh.reshape(batch, n), ol.reshape(batch, n))
