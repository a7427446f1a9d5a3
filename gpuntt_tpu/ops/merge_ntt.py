"""Merged radix-2 NTT engine (XLA path).

TPU-native rebuild of the reference's merge-NTT kernel family + host
dispatch (ntt.cu:11-3097).  Where CUDA needs 6 kernel families
(LowRing/Core/Core_/Transpose x fwd/inv, ntt.cu:11-2075) and a static
launch-plan table (ntt.cuh:606-797), the TPU formulation is a single
trace: logn unrolled butterfly stages over a (..., m, 2, t) reshape of
the coefficient axis, with twiddles taken as *static slices* of the
bit-reversed table (no gathers, no bit-reversal at runtime) and the XLA
scheduler owning tiling.  A Pallas kernel covers the VMEM-resident hot
path separately (pallas_merge.py).

Data never leaves uint32 lanes: 32-bit data is one uint32 array, 64-bit
data is a limb.U64 (hi, lo) pair; the butterfly ops come from
ops.barrett (Shoup constant-multiply — exact, hence bit-identical to
the reference's Barrett outputs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..params.bitrev import bitrev_permute
from ..params.merge import NTTParameters, ReductionPolynomial
from . import barrett as bo
from .limb import U64, u64_from_numpy, u64_to_numpy


def _tmap(f, *xs):
    return jax.tree_util.tree_map(f, *xs)


def _reshape(x, shape):
    return _tmap(lambda a: a.reshape(shape), x)


def _stage_slice(x, lo, hi):
    return _tmap(lambda a: a[..., lo:hi], x)


def _take_pair(x, idx):
    return _tmap(lambda a: a[..., idx, :], x)


# ------------------------------------------------------------------ plan


def _bigring_engine_path(p: NTTParameters) -> str | None:
    """The MXU large-ring engine path covering this parameter set at
    logn >= 18 in BOTH directions, or None (wide/garbage-in moduli and
    small rings need the butterfly tables)."""
    is64 = p.dtype == np.uint64
    q = p.modulus.value
    if is64:
        if not (18 <= p.logn <= 28 and q < (1 << 62)):
            return None
        path = "mxu-large"
    else:
        if not (18 <= p.logn <= 25 and q < (1 << 30)):
            return None
        path = "mxu32-large"
    order = 2 * p.n if p.poly_reduction == ReductionPolynomial.X_N_plus else p.n
    root, iroot = p.root_of_unity, p.inverse_root_of_unity
    if pow(root, order, q) != 1 or (root * iroot) % q != 1:
        return None  # non-root caller factors: butterfly engines only
    return path


def _tpu_engines(p: NTTParameters) -> dict:
    """Device-resident MXU engine plans for this parameter set, keyed by
    dispatch path name ({} when no MXU path covers it).  Builders are
    cached on the params object, so this shares plans with the eager
    dispatch route."""
    is64 = p.dtype == np.uint64
    q = p.modulus.value
    out = {}
    try:
        if is64 and q < (1 << 62):
            if 12 <= p.logn <= 17:
                from .pallas_mxu import mxu_plan

                out["mxu"] = mxu_plan(p)
            if 17 <= p.logn <= 28:
                from .pallas_mxu_large import mxu_large_plan

                out["mxu-large"] = mxu_large_plan(p)
        elif not is64 and q < (1 << 30):
            if p.logn == 17:
                from .pallas_mxu32 import mxu32_plan

                out["mxu32"] = mxu32_plan(p)
            elif 18 <= p.logn <= 25:
                from .pallas_mxu32 import mxu32_large_plan

                out["mxu32-large"] = mxu32_large_plan(p)
    except ValueError:
        # non-root caller factors: the butterfly engines own this plan
        return {}
    return out


def _butterfly_tables(p: NTTParameters):
    """Bit-reversed twiddle tables + Shoup companions in lane
    representation, built once and cached on the parameter object (they
    are 4 x N words — 100s of MB at the big-ring sizes)."""
    tabs = getattr(p, "_merge_tables_cache", None)
    if tabs is not None:
        return tabs
    q = p.modulus.value
    fwd = bitrev_permute(p.forward_root_of_unity_table)
    inv = bitrev_permute(p.inverse_root_of_unity_table)
    is64 = p.dtype == np.uint64
    word = 64 if is64 else 32
    fwd_sh = bo.shoup_companion(fwd, q, word)
    inv_sh = bo.shoup_companion(inv, q, word)
    if is64:
        rep = lambda a: u64_from_numpy(np.asarray(a, dtype=np.uint64))
    else:
        rep = lambda a: jnp.asarray(np.asarray(a, dtype=np.uint32))
    tabs = (rep(fwd), rep(fwd_sh), rep(inv), rep(inv_sh))
    p._merge_tables_cache = tabs
    return tabs


@dataclass(frozen=True)
class MergePlan:
    """Device-side transform plan: bit-reversed twiddles (+ Shoup
    companions) and modulus constants.

    Equivalent of the caller-side table copies in the reference examples
    (test_merge_ntt.cu:107-134) plus the kernel-plan table role of
    CreateForward/InverseNTTKernel (ntt.cuh:606-797) — except the
    "plan" degenerates to static stage slices.

    At logn >= 18 on a TPU backend the butterfly tables are SKIPPED
    (None): dispatch routes those sizes to the MXU large-ring engines
    both directions, which are exponent algebra over the root and never
    read the 2^n-entry tables — eagerly materializing them cost 66 s
    and gigabytes at logn 28 per process (RESULTS_r5).  `with_tables()`
    restores them for the butterfly engines.
    """

    logn: int
    q: int
    bit: int
    mu: int
    n_inv: int
    reduction_poly: ReductionPolynomial
    is64: bool
    fwd_table: Any  # uint32 array or U64 pair, bit-reversed order
    fwd_shoup: Any
    inv_table: Any
    inv_shoup: Any
    n_inv_rep: Any  # scalar lane rep of n_inv
    n_inv_shoup: Any
    params: Any = None  # originating NTTParameters (for kernel-plan builds)
    # MXU engine plans as pytree DATA ({path: plan}), attached by
    # resolved() (automatic on a TPU backend): when the MergePlan rides
    # through a user's jax.jit as an ARGUMENT, the engine tables enter
    # the compiled program as runtime buffers — this is what makes
    # ntt_lanes/intt_lanes route to the composed MXU programs inside
    # user traces at EVERY size, incl. logn 24-28 where inline-constant
    # tables are tens of MB (the pre-r5 "jit cliff").  Closure-captured
    # plans still inline; pass the plan as a jit argument.
    engines: Any = None

    @staticmethod
    def from_params(p: NTTParameters,
                    tables: bool | str = "auto") -> "MergePlan":
        """Build the transform plan.

        tables="auto" skips the butterfly twiddle tables when a TPU
        backend will route every transform of this size to the MXU
        large-ring engines (see class docstring); True forces them,
        False skips them unconditionally.  On a TPU backend the MXU
        engine plans are attached as pytree data (see `engines`)."""
        import jax as _jax

        on_tpu = _jax.default_backend() == "tpu"
        q = p.modulus.value
        is64 = p.dtype == np.uint64
        if tables == "auto":
            tables = not (on_tpu and _bigring_engine_path(p) is not None)
        if tables:
            fwd_t, fwd_s, inv_t, inv_s = _butterfly_tables(p)
        else:
            fwd_t = fwd_s = inv_t = inv_s = None
        word = 64 if is64 else 32
        ninv_sh = (p.n_inv << word) // q
        if is64:
            scal = lambda v: bo.u64_const(int(v))
        else:
            scal = lambda v: jnp.uint32(int(v))
        plan = MergePlan(
            logn=p.logn,
            q=q,
            bit=p.modulus.bit,
            mu=p.modulus.mu,
            n_inv=p.n_inv,
            reduction_poly=p.poly_reduction,
            is64=is64,
            fwd_table=fwd_t,
            fwd_shoup=fwd_s,
            inv_table=inv_t,
            inv_shoup=inv_s,
            n_inv_rep=scal(p.n_inv),
            n_inv_shoup=scal(ninv_sh),
            params=p,
        )
        return plan.resolved() if on_tpu else plan

    def resolved(self) -> "MergePlan":
        """This plan with its MXU engine plans attached as pytree data
        (no-op when already attached, no params, or no MXU coverage).
        Pass the resolved plan through your jax.jit as an ARGUMENT and
        ntt_lanes/intt_lanes/polymul_lanes inside the trace route to the
        composed MXU programs with the tables as runtime buffers —
        required at logn >= 24, where inline tables exceed compile
        payload limits.  from_params does this automatically on TPU."""
        if self.engines is not None or self.params is None:
            return self
        eng = _tpu_engines(self.params)
        if not eng:
            return self
        import dataclasses

        return dataclasses.replace(self, engines=eng)

    def with_tables(self) -> "MergePlan":
        """This plan with the butterfly tables present (built/cached on
        the params object) — for explicit XLA-engine use of a plan whose
        tables were skipped at construction."""
        if self.fwd_table is not None or self.params is None:
            return self
        import dataclasses

        fwd_t, fwd_s, inv_t, inv_s = _butterfly_tables(self.params)
        return dataclasses.replace(self, fwd_table=fwd_t, fwd_shoup=fwd_s,
                                   inv_table=inv_t, inv_shoup=inv_s)

    def kernel_plan(self):
        """Lazily-built Pallas kernel plan (cached on the params object)."""
        if self.params is None:
            return None
        kp = getattr(self.params, "_kernel_plan_cache", None)
        if kp is None:
            from .pallas_merge import KernelMergePlan

            kp = KernelMergePlan.from_params(self.params)
            self.params._kernel_plan_cache = kp
        return kp

    # butterfly op bundle (reads only meta fields — safe under tracing)
    def ops(self):
        if self.is64:
            qc = bo.u64_const(self.q)
            return dict(
                add=lambda a, b: bo.modadd64(a, b, qc),
                sub=lambda a, b: bo.modsub64(a, b, qc),
                mulc=lambda x, w, ws: bo.shoup_mul64(x, w, ws, qc),
            )
        q = self.q
        return dict(
            add=lambda a, b: bo.modadd32(a, b, q),
            sub=lambda a, b: bo.modsub32(a, b, q),
            mulc=lambda x, w, ws: bo.shoup_mul32(x, w, ws, q),
        )


# Registered as a pytree (tables = data, plan scalars = static meta) so
# plans can be passed as jit ARGUMENTS: closed-over tables enter HLO as
# inline constants, which XLA constant-folds per-op (minutes at logn >=
# 24) and the relay's compile helper rejects outright past a few MB
# (HTTP 413).  As arguments they become runtime buffers — same trick as
# pallas_mxu.plan_to_device, at the jit boundary.
jax.tree_util.register_dataclass(
    MergePlan,
    data_fields=["fwd_table", "fwd_shoup", "inv_table", "inv_shoup",
                 "n_inv_rep", "n_inv_shoup", "engines"],
    meta_fields=["logn", "q", "bit", "mu", "n_inv", "reduction_poly",
                 "is64", "params"],
)


# ------------------------------------------------------------- transforms


def ct_stages(x, table, shoup, ops, log_size: int, xnp: bool):
    """Cooley-Tukey butterfly stage sweep along the last axis.

    Stage s (m = 2^s groups, t = N >> (s+1)) pairs j and j+t; with the
    bit-reversed table the group twiddles are table[0:m] (X_N_minus,
    cf. ntt_cpu.cu:102-104) or table[m:2m] (X_N_plus, :107-109).
    Shared by the merge NTT and the 4-step column/row NTTs
    (core_ntt, ntt_4step_cpu.cu:117-154, is the xnp=False case).
    """
    n = 1 << log_size
    lead = jax.tree_util.tree_leaves(x)[0].shape[:-1]

    for s in range(log_size):
        m = 1 << s
        t = n >> (s + 1)
        lo, hi = (m, 2 * m) if xnp else (0, m)
        tw = _stage_slice(table, lo, hi)
        tws = _stage_slice(shoup, lo, hi)
        v = _reshape(x, lead + (m, 2, t))
        u_part = _take_pair(v, 0)
        tw_b = _tmap(lambda a: a[..., :, None], tw)
        tws_b = _tmap(lambda a: a[..., :, None], tws)
        v_part = ops["mulc"](_take_pair(v, 1), tw_b, tws_b)
        hi_o = ops["add"](u_part, v_part)
        lo_o = ops["sub"](u_part, v_part)
        x = _reshape(_tmap(lambda a, b: jnp.stack([a, b], axis=-2), hi_o, lo_o),
                     lead + (n,))
    return x


def gs_stages(x, table, shoup, ops, log_size: int, xnp: bool):
    """Gentleman-Sande (inverse) butterfly stage sweep, no scaling."""
    n = 1 << log_size
    lead = jax.tree_util.tree_leaves(x)[0].shape[:-1]

    for s in range(log_size - 1, -1, -1):
        h = 1 << s
        t = n >> (s + 1)
        lo, hi = (h, 2 * h) if xnp else (0, h)
        tw = _stage_slice(table, lo, hi)
        tws = _stage_slice(shoup, lo, hi)
        v = _reshape(x, lead + (h, 2, t))
        u_part = _take_pair(v, 0)
        v_part = _take_pair(v, 1)
        tw_b = _tmap(lambda a: a[..., :, None], tw)
        tws_b = _tmap(lambda a: a[..., :, None], tws)
        hi_o = ops["add"](u_part, v_part)
        lo_o = ops["mulc"](ops["sub"](u_part, v_part), tw_b, tws_b)
        x = _reshape(_tmap(lambda a, b: jnp.stack([a, b], axis=-2), hi_o, lo_o),
                     lead + (n,))
    return x


def _tables_for_engine(plan: MergePlan, x_leaf) -> MergePlan:
    """Restore the butterfly tables for the XLA engine, refusing to do
    so INSIDE a trace at big rings: with_tables() builds concrete host
    arrays, which a trace bakes into the jaxpr as constants — 10s of MB
    to GBs at logn >= 18, the relay compile-payload trap (CLAUDE.md).
    Table-less plans only exist on TPU backends where dispatch routes
    these sizes to the MXU engines; reaching this path under a trace
    means the caller explicitly forced the XLA engine (use_pallas=False)
    on a table-skipped plan — build the plan with
    MergePlan.from_params(p, tables=True) (or call .with_tables()
    outside the jit) and pass it as the jit argument instead."""
    if plan.logn >= 18 and isinstance(x_leaf, jax.core.Tracer):
        raise ValueError(
            f"XLA butterfly engine at logn={plan.logn} inside a trace "
            "with a table-skipped plan: the 2^n twiddle tables would "
            "inline into the compiled program as constants.  Build the "
            "plan with MergePlan.from_params(params, tables=True) (or "
            "plan.with_tables() outside the jit) and pass it through "
            "your jit as an argument.")
    return plan.with_tables()


def merge_ntt_lanes(x, plan: MergePlan):
    """Forward merged NTT along the last axis of the lane representation.

    Matches GPU_NTT output element-for-element (ntt.cu:2076-2256).
    """
    if plan.fwd_table is None:
        plan = _tables_for_engine(plan, jax.tree_util.tree_leaves(x)[0])
    xnp = plan.reduction_poly == ReductionPolynomial.X_N_plus
    return ct_stages(x, plan.fwd_table, plan.fwd_shoup, plan.ops(), plan.logn, xnp)


def merge_intt_lanes(x, plan: MergePlan, scale: bool = True):
    """Inverse merged NTT (Gentleman-Sande) along the last axis.

    n^-1 scaling happens once at the end, matching the reference's
    last-kernel placement (ntt.cu:1170-1192); `scale=False` gives the
    unscaled variant used when the caller owns cfg.mod_inverse.
    """
    if plan.inv_table is None:
        plan = _tables_for_engine(plan, jax.tree_util.tree_leaves(x)[0])
    ops = plan.ops()
    xnp = plan.reduction_poly == ReductionPolynomial.X_N_plus
    x = gs_stages(x, plan.inv_table, plan.inv_shoup, ops, plan.logn, xnp)
    if scale:
        x = ops["mulc"](x, plan.n_inv_rep, plan.n_inv_shoup)
    return x


# ------------------------------------------------- lane <-> numpy boundary


def to_lanes(x, is64: bool):
    if is64:
        return u64_from_numpy(np.asarray(x, dtype=np.uint64))
    return jnp.asarray(np.asarray(x, dtype=np.uint32))


def from_lanes(x, is64: bool):
    if is64:
        return u64_to_numpy(x)
    return np.asarray(x)
