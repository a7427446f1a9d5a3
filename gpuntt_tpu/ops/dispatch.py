"""Public transform API — the GPU_NTT / GPU_INTT equivalent surface.

Rebuild of the reference's host dispatch layer (ntt.cu:2076-3097 and
the ordered variants :3600-4459) as functional, jittable entry points:

  ntt / intt                      <- GPU_NTT / GPU_INTT (+ *_Inplace,
                                     which is meaningless under XLA's
                                     functional semantics — the jitted
                                     computation is in-place where the
                                     compiler proves it safe)
  ntt_rns / intt_rns              <- RNS overloads (ntt.cu:2560-3059)
  ntt_modulus_ordered / intt_...  <- GPU_NTT_Modulus_Ordered (:3600-3768)
  ntt_poly_ordered / intt_...     <- GPU_NTT_Poly_Ordered (:4281-4459)

Layout semantics (NTTLayout, ntt.cuh doc :360-394): PerPolynomial
transforms the last axis of a (batch, N) buffer; PerCoefficient
transforms axis 0 of an (N, batch) buffer — same memory, different
interpretation; on TPU this is an axis choice, not a kernel family
(the reference needs a dedicated transpose kernel family for it,
ntt.cu:1554-2075).

Signed variants (Data32s/Data64s instantiations, ntt.cu:4508-5244):
`ntt(..., signed_input=True)` reduces on load; `intt(...,
signed_output=True)` applies centered reduction in the last stage.

`zero_padding` is accepted for parity and ignored — the reference
threads it through but no kernel body reads it (SURVEY.md §5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..params.merge import NTTLayout, NTTType, ReductionPolynomial
from . import barrett as bo
from .merge_ntt import MergePlan, from_lanes, merge_intt_lanes, merge_ntt_lanes, to_lanes


@dataclass(frozen=True)
class NTTConfig:
    """Parity stand-in for ntt_configuration (ntt.cuh:31-51)."""

    n_power: int
    ntt_type: NTTType = NTTType.FORWARD
    ntt_layout: NTTLayout = NTTLayout.PerPolynomial
    reduction_poly: ReductionPolynomial = ReductionPolynomial.X_N_minus
    zero_padding: bool = False  # accepted, never read (parity)
    mod_inverse: int | None = None


def _kernel_path(plan: MergePlan, x_shape, layout,
                 inverse: bool = False) -> str | None:
    """Kernel-path selection — the TPU analog of the reference's
    LowRing/standard/Core_ dispatch thresholds (ntt.cu:2095-2224).

    64-bit data routes to the MXU digit-matmul kernel (pallas_mxu.py)
    — measured 2.1x over the XLA butterfly engine at 2^16 b128 on v5e
    — when the modulus fits its q < 2^62 bound; 32-bit batched
    PerPolynomial transforms take the roll-based VPU kernel; everything
    else takes the XLA engine.

    Direction matters at the in-VMEM ceiling: the u64 INVERSE kernel's
    scoped-VMEM stack runs hotter than the forward's (W^-1 products
    live across the matmul phases) and exceeds the v5e 16M limit at
    2^17 (16.66M measured, benchmarks/chiplog/r3_merge26.out) — so
    logn 17 inverse takes the large-ring composed route instead."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    if layout != NTTLayout.PerPolynomial or len(x_shape) != 2:
        return None
    if plan.params is None:
        return None
    if plan.is64:
        if plan.q < (1 << 62):
            if 12 <= plan.logn <= (16 if inverse else 17):
                return "mxu"
            if plan.logn == 17:
                return "mxu-large"
            # the WHOLE big-N range 18-28 runs as one composed col+row
            # jitted program (r4: plans as pytree jit arguments killed
            # the closure-constant compile failures; the pre-r4 "the
            # compiler cannot handle composed big-N programs" doctrine
            # was a misdiagnosis) — inside a user trace the tables ride
            # as runtime buffers via MergePlan.engines (r5)
            if 18 <= plan.logn <= 28:
                return "mxu-large"
        return None
    n = x_shape[-1]
    if n < 256 or n % 128:
        return None
    if plan.logn <= 16:
        return "vpu"  # whole block VMEM-resident
    # The VPU whole-block kernel's scoped stack overflows past 2^16
    # (22.11M at 2^17 / 46.37M at 2^18 vs the 16M v5e limit, named
    # per-program errors in benchmarks/u32vpu_diag.py, r3 — interpret
    # mode never sees it).  logn 17 fits VMEM as ONE MXU digit-matmul
    # block; 18-25 (the reference u32 pool ceiling,
    # nttparameters.cu:84-98) ride the composed col+row large engine.
    if plan.logn == 17 and plan.q < (1 << 30):
        return "mxu32"
    if plan.logn <= 25 and plan.q < (1 << 30):
        return "mxu32-large"
    return None


_MXU_PATHS = ("mxu", "mxu-large", "mxu32", "mxu32-large")


def _explicit_path(plan: MergePlan, inverse: bool = False) -> str:
    """Route for an explicit use_pallas=True request: the best Pallas
    kernel for the plan's width and size (unlike "auto", no backend
    check — the caller insisted).  Same logn-17 inverse exception as
    _kernel_path (the in-VMEM inverse kernel exceeds scoped VMEM
    there)."""
    if plan.is64:
        return "mxu" if plan.logn <= (16 if inverse else 17) else "mxu-large"
    if plan.logn <= 16:
        return "vpu"
    return "mxu32" if plan.logn == 17 else "mxu32-large"


def _resolve_mxu(path, plan: MergePlan):
    """Resolve an MXU path to (path, engine plan, kernel fn).

    Prefers the engine plan attached to the MergePlan pytree
    (plan.engines — runtime buffers when the MergePlan itself is a jit
    argument); otherwise builds it from the host params (cached there).
    Falls back to the XLA engine for non-root caller-supplied factors
    (the reference's garbage-in/garbage-out tables have no matrix
    factorization)."""
    if path not in _MXU_PATHS:
        return path, None, None
    if path == "mxu":
        from .pallas_mxu import mxu_plan as mk
        from .pallas_mxu import pallas_mxu_u64 as fn
    elif path == "mxu-large":
        from .pallas_mxu_large import mxu_large_plan as mk
        from .pallas_mxu_large import pallas_mxu_large_u64 as fn
    elif path == "mxu32":
        from .pallas_mxu32 import mxu32_plan as mk
        from .pallas_mxu32 import pallas_mxu_u32 as fn
    else:
        from .pallas_mxu32 import mxu32_large_plan as mk
        from .pallas_mxu32 import pallas_mxu32_large as fn
    eng = getattr(plan, "engines", None)
    if eng and path in eng:
        return path, eng[path], fn
    try:
        return path, mk(plan.params), fn
    except ValueError:
        return None, None, None


def _signed_view(x):
    """numpy int32/int64 -> same-width unsigned bit pattern."""
    x = np.asarray(x)
    if x.dtype == np.int32:
        return x.view(np.uint32), 32
    if x.dtype == np.int64:
        return x.view(np.uint64), 64
    raise TypeError(f"signed input must be int32/int64, got {x.dtype}")


def _apply_layout_in(x_lanes, layout: NTTLayout):
    if layout == NTTLayout.PerCoefficient:
        return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), x_lanes)
    return x_lanes


def _apply_layout_out(x_lanes, layout: NTTLayout):
    if layout == NTTLayout.PerCoefficient:
        return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, -1, 0), x_lanes)
    return x_lanes


def ntt_lanes(
    x,
    plan: MergePlan,
    layout: NTTLayout = NTTLayout.PerPolynomial,
    signed_input: bool = False,
    use_pallas: bool | str = "auto",
):
    """Forward NTT on the lane representation (jittable building block).

    PerCoefficient is an axis relayout applied BEFORE kernel-path
    selection, so it reaches the same Pallas/MXU engines as
    PerPolynomial (the reference needs a dedicated transpose-fused
    kernel family for this, ntt.cu:1554-2075; on TPU the relayout is
    one XLA transpose — measured at parity in benchmarks/sweep.py).

    Composes into user jits at EVERY size the reference supports
    (GPU_NTT composes into any stream/graph, ntt.cu:2076-2256): at
    logn >= 18 the transform is one composed MXU program whose tables
    ride as runtime buffers when the MergePlan is a jit ARGUMENT
    (from_params attaches them on TPU — see MergePlan.resolved).  A
    closure-captured plan still works but inlines its tables into the
    HLO; pass the plan as an argument."""
    if signed_input:
        if plan.is64:
            x = bo.reduce_signed64(x, bo.u64_const(plan.q))
        else:
            x = bo.reduce_signed32(x, plan.q)
    x = _apply_layout_in(x, layout)
    shape = jax.tree_util.tree_leaves(x)[0].shape
    if len(shape) != 2:
        # canonicalize to (batch, N): the MXU engines are 2-D, and a
        # 1-D/3-D shape must not silently change the ROUTE (pre-r5 it
        # fell to the XLA engine, which at big N rebuilt the skipped
        # butterfly tables as multi-MB inline constants under traces)
        x2 = jax.tree_util.tree_map(lambda a: a.reshape(-1, shape[-1]), x)
        y = ntt_lanes(x2, plan, use_pallas=use_pallas)
        y = jax.tree_util.tree_map(
            lambda a: a.reshape(shape[:-1] + (shape[-1],)), y)
        return _apply_layout_out(y, layout)
    if use_pallas == "auto":
        use_pallas = _kernel_path(plan, shape, NTTLayout.PerPolynomial)
    elif use_pallas is True:
        use_pallas = _explicit_path(plan)
    use_pallas, _mp, _mxu_fn = _resolve_mxu(use_pallas, plan)
    if use_pallas in _MXU_PATHS:
        y = _mxu_fn(x, _mp)
    elif use_pallas:
        kp = plan.kernel_plan()
        if plan.is64:
            from .pallas_merge64 import pallas_merge2_u64

            y = pallas_merge2_u64(x, kp)
        else:
            from .pallas_merge2 import pallas_merge2_u32

            y = pallas_merge2_u32(x, kp)
    else:
        y = merge_ntt_lanes(x, plan)
    return _apply_layout_out(y, layout)


def intt_lanes(
    x,
    plan: MergePlan,
    layout: NTTLayout = NTTLayout.PerPolynomial,
    signed_output: bool = False,
    use_pallas: bool | str = "auto",
):
    """Inverse NTT on the lane representation (jittable building block).

    Layout semantics as ntt_lanes: PerCoefficient relayouts before
    kernel-path selection.  Composes into user jits at every size like
    ntt_lanes (pass the plan as a jit argument)."""
    x = _apply_layout_in(x, layout)
    shape = jax.tree_util.tree_leaves(x)[0].shape
    if len(shape) != 2:
        # canonicalize to (batch, N) — see ntt_lanes
        x2 = jax.tree_util.tree_map(lambda a: a.reshape(-1, shape[-1]), x)
        y = intt_lanes(x2, plan, signed_output=signed_output,
                       use_pallas=use_pallas)
        y = jax.tree_util.tree_map(
            lambda a: a.reshape(shape[:-1] + (shape[-1],)), y)
        return _apply_layout_out(y, layout)
    if use_pallas == "auto":
        use_pallas = _kernel_path(plan, shape, NTTLayout.PerPolynomial,
                                  inverse=True)
    elif use_pallas is True:
        use_pallas = _explicit_path(plan, inverse=True)
    use_pallas, _mp, _mxu_fn = _resolve_mxu(use_pallas, plan)
    if use_pallas in _MXU_PATHS:
        y = _mxu_fn(x, _mp, inverse=True)
    elif use_pallas:
        if plan.is64:
            from .pallas_merge64 import pallas_merge2_u64

            y = pallas_merge2_u64(x, plan.kernel_plan(), inverse=True)
        else:
            from .pallas_merge2 import pallas_merge2_u32

            y = pallas_merge2_u32(x, plan.kernel_plan(), inverse=True)
    else:
        y = merge_intt_lanes(x, plan)
    y = _apply_layout_out(y, layout)
    if signed_output:
        if plan.is64:
            return bo.centered64(y, bo.u64_const(plan.q))
        return bo.centered32(y, plan.q)
    return y


# --------------------------------------------- staged big-N route (24-28)


def staged_ntt_lanes(x_lanes, plan: MergePlan,
                     layout: NTTLayout = NTTLayout.PerPolynomial,
                     inverse: bool = False, signed_input: bool = False,
                     signed_output: bool = False):
    """Device-resident merge NTT at logn 24-28 on TPU.

    The WHOLE range runs as ONE composed cached jitted program with the
    plan as a pytree jit argument (r4: the multi-program staging was
    working around the closure-constant inline path; the composed form
    beats it at every size — 8.28 ms at 2^24, -41% fwd at 2^26,
    chiplog/r4_composed*.out); rows recurse into nested large plans
    inside the same program at 26-28 (the TPU rendition of the
    reference's 3-4-launch big-N plans, ntt.cuh:665-698, ForwardCore_
    ntt.cu:2163-2224).  Call from eager code with lane-representation
    (U64 pair / uint32) inputs; the first call per (plan, batch)
    compiles, later calls are cache hits.  (Since r5, ntt_lanes inside
    a user jit reaches the same kernels — this entry remains the eager
    numpy-path workhorse.)  Returns None when ineligible (non-TPU, wide
    q, u32 beyond the pool ceiling, non-root factors) — callers fall
    back to the jitted XLA engine."""
    import jax as _jax

    if (_jax.default_backend() != "tpu" or plan.params is None
            or not 24 <= plan.logn <= 28):
        return None
    shape = jax.tree_util.tree_leaves(x_lanes)[0].shape
    if len(shape) != 2:
        return None
    if not plan.is64:
        # u32 big-N route: the reference u32 pool reaches logn 25
        # (nttparameters.cu:84-98).  r4: with the plan as a pytree jit
        # ARGUMENT the composed col+row program compiles on chip
        # (chiplog/r4_composed25.out — the r3 staging was working
        # around the closure-constant inline path), so both sizes run
        # as ONE cached jitted program.
        if plan.q >= (1 << 30) or plan.logn > 25:
            return None
        from .pallas_mxu32 import mxu32_large_plan, pallas_mxu32_large_jit

        try:
            mp = mxu32_large_plan(plan.params)
        except ValueError:
            return None
        x_lanes = _apply_layout_in(x_lanes, layout)
        if signed_input:
            x_lanes = bo.reduce_signed32(x_lanes, plan.q)
        y = pallas_mxu32_large_jit(x_lanes, mp, inverse=inverse)
        if signed_output:
            y = bo.centered32(y, plan.q)
        return _apply_layout_out(y, layout)
    if plan.q >= (1 << 62):
        return None
    from .pallas_mxu_large import mxu_large_plan, pallas_mxu_large_jit

    try:
        mp = mxu_large_plan(plan.params)
    except ValueError:
        return None  # garbage-in factors: XLA engine parity path
    x_lanes = _apply_layout_in(x_lanes, layout)
    if signed_input:
        x_lanes = bo.reduce_signed64(x_lanes, bo.u64_const(plan.q))
    # composed single program for the WHOLE big-N range (r4): with the
    # plan as a pytree jit argument it compiles and beats the staged
    # chain at every size — 8.28/8.58 ms at 2^24 (-18%), 50.8 ms fwd
    # at 2^26 (-41%), 192/205 ms at 2^28 (-7/-5%), all roundtrip
    # bit-exact on chip (chiplog/r4_composed*.out)
    y = pallas_mxu_large_jit(x_lanes, mp, inverse=inverse)
    if signed_output:
        y = bo.centered64(y, bo.u64_const(plan.q))
    return _apply_layout_out(y, layout)


# backwards-compatible internal name
_staged_route = staged_ntt_lanes


@jax.jit
def _pointwise_jit(fa, fb, plan: MergePlan):
    return pointwise_mult_lanes(fa, fb, plan)


def staged_polymul_lanes(a_lanes, b_lanes, plan: MergePlan):
    """Device-resident polymul INTT(NTT(a) o NTT(b)) at logn 24-28 on
    TPU: forward phases per input, then (rows delegating to the in-VMEM
    kernel, merge 24-25) the pointwise product FUSED into the
    row-inverse program — the big-N analog of the in-VMEM fused polymul
    — else the product as its own jitted program between the staged
    chains.  Returns None when the staged route is ineligible."""
    import jax as _jax

    if (_jax.default_backend() != "tpu" or not plan.is64
            or plan.params is None or plan.q >= (1 << 62)
            or not 24 <= plan.logn <= 28):
        return None
    if len(jax.tree_util.tree_leaves(a_lanes)[0].shape) != 2:
        return None
    from .pallas_mxu import MXUMergePlan
    from .pallas_mxu_large import (mxu_large_plan, pallas_mxu_large_jit,
                                   pallas_mxu_large_polymul_inv_jit)

    try:
        mp = mxu_large_plan(plan.params)
    except ValueError:
        return None  # garbage-in factors: XLA engine parity path
    fa = pallas_mxu_large_jit(a_lanes, mp)
    fb = pallas_mxu_large_jit(b_lanes, mp)
    if isinstance(mp.row_plan, MXUMergePlan):
        # fused product+row-inverse as one program (merge 24-25): three
        # compiled programs total — 28.7 ms at 2^24, 16% under the
        # unfused chain (r4_composed_more.out)
        return pallas_mxu_large_polymul_inv_jit(fa, fb, mp)
    # recursive rows (logn >= 26): unfused composed chain
    prod = _pointwise_jit(fa, fb, plan)
    return pallas_mxu_large_jit(prod, mp, inverse=True)


# ------------------------------------------------------ numpy convenience


def _cached_jit(plan: MergePlan, key, maker):
    """Jitted-transform cache keyed on the plan's params object, so the
    numpy convenience wrappers (and the per-modulus RNS routing built on
    them) don't retrace on every call."""
    host = plan.params
    if host is None:
        return jax.jit(maker())
    cache = getattr(host, "_jit_cache", None)
    if cache is None:
        cache = {}
        host._jit_cache = cache
    if key not in cache:
        cache[key] = jax.jit(maker())
    return cache[key]


def ntt(x, plan: MergePlan, cfg: NTTConfig | None = None, **kw):
    """GPU_NTT equivalent over numpy arrays (device round-trip included).

    Accepts uint32/uint64 (or int32/int64 with signed_input semantics,
    matching the Data32s/Data64s instantiations).  At logn 24-28 on TPU
    this entry runs the composed single-program MXU route (ms-scale);
    to compose the transform inside your own jit use ntt_lanes with the
    plan passed as a jit ARGUMENT (see its docstring).
    """
    layout = kw.pop("layout", cfg.ntt_layout if cfg else NTTLayout.PerPolynomial)
    signed_input = kw.pop("signed_input", False)
    x = np.asarray(x)
    if x.dtype in (np.dtype(np.int32), np.dtype(np.int64)):
        xv, _ = _signed_view(x)
        signed_input = True
    else:
        xv = x
    lanes = to_lanes(xv, plan.is64)
    staged = _staged_route(lanes, plan, layout, inverse=False,
                           signed_input=signed_input)
    if staged is not None:
        return from_lanes(staged, plan.is64)
    fn = _cached_jit(
        plan, ("ntt", layout, signed_input),
        lambda: lambda v, pl: ntt_lanes(v, pl, layout=layout,
                                        signed_input=signed_input))
    return from_lanes(fn(lanes, plan), plan.is64)


def intt(x, plan: MergePlan, cfg: NTTConfig | None = None, **kw):
    """GPU_INTT equivalent over numpy arrays."""
    layout = kw.pop("layout", cfg.ntt_layout if cfg else NTTLayout.PerPolynomial)
    signed_output = kw.pop("signed_output", False)
    lanes = to_lanes(np.asarray(x), plan.is64)
    staged = _staged_route(lanes, plan, layout, inverse=True,
                           signed_output=signed_output)
    if staged is not None:
        res = from_lanes(staged, plan.is64)
        return res.view(np.int64) if signed_output else res
    fn = _cached_jit(
        plan, ("intt", layout, signed_output),
        lambda: lambda v, pl: intt_lanes(v, pl, layout=layout,
                                         signed_output=signed_output))
    res = from_lanes(fn(lanes, plan), plan.is64)
    if signed_output:
        return res.view(np.int64) if plan.is64 else res.view(np.int32)
    return res


# --------------------------------------------------------- RNS + ordered

def _rns_mod_idx(batch: int, mod_count: int) -> np.ndarray:
    """Default cyclic modulus schedule: batch b -> modulus b % mod_count
    (ntt.cu RNS kernels, q_index = block_y % mod_count)."""
    return np.arange(batch, dtype=np.int64) % mod_count


def _merge_plan_cached(params):
    mp = getattr(params, "_merge_plan_cache", None)
    if mp is None:
        mp = MergePlan.from_params(params)
        params._merge_plan_cache = mp
    return mp


def _mxu_rns_plan_cached(plan, large: bool):
    """Single-kernel stacked-table plan, cached on the first member."""
    from .pallas_mxu_rns import MXU32RNSPlan, MXULargeRNSPlan, MXURNSPlan

    if not plan.is64 and large:
        return None  # u32 large rings: per-modulus host split
    host = plan.members[0]
    cache = getattr(host, "_mxu_rns_cache", None)
    if cache is None:
        cache = {}
        host._mxu_rns_cache = cache
    # key includes each member's roots: NTTFactors allows two plans to
    # share moduli but differ in caller-supplied psi/omega (ADVICE r1)
    key = (plan.logn, plan.qs, plan.reduction_poly, large,
           tuple((m.root_of_unity, m.poly_reduction) for m in plan.members))
    if key not in cache:
        cls = (MXULargeRNSPlan if large else
               MXURNSPlan if plan.is64 else MXU32RNSPlan)
        try:
            cache[key] = cls.from_members(plan.members)
        except ValueError:
            cache[key] = None
    return cache[key]


def _rns_cached_jit(plan, key, maker):
    """Cached jit for RNS entry points, hosted on members[0] (the plan
    dataclasses are frozen) — same role as _cached_jit for MergePlan:
    without it every ntt_rns/intt_rns call would rebuild a fresh
    jax.jit closure and pay a full retrace+recompile (the advertised
    HE workload calls these per evaluation step)."""
    host = plan.members[0] if getattr(plan, "members", None) else None
    if host is None:
        return jax.jit(maker())
    cache = getattr(host, "_rns_jit_cache", None)
    if cache is None:
        cache = {}
        host._rns_jit_cache = cache
    full = (plan.logn, plan.qs, getattr(plan, "reduction_poly", None),
            tuple((m.root_of_unity, m.poly_reduction)
                  for m in plan.members)) + key
    if full not in cache:
        cache[full] = jax.jit(maker())
    return cache[full]


def _rns_mxu_route(x, plan, mod_idx, inverse: bool):
    """MXU transforms for RNS batches on TPU.

    The reference's RNS kernels are the single-modulus kernels with a
    per-batch table offset (ntt.cu:3135).  In the in-VMEM range the
    whole schedule runs as ONE kernel whose per-batch tables are
    gathered by scalar-prefetch BlockSpecs (pallas_mxu_rns.py);
    large rings split the batch per modulus through the large-ring
    engines.  Returns None when ineligible (non-TPU, u32, out-of-range
    logn, wide moduli) — callers fall back to the XLA RNS engine."""
    import jax as _jax

    # u32 RNS stays on the XLA engine: the stacked u32 kernel measured
    # 0.64x XLA at 2^16x128 (a u32 Shoup modmul is ~6 lane multiplies,
    # so the digit-combine overhead dominates, as for the single-modulus
    # u32 MXU engine); pallas_mxu32_rns remains available for hardware
    # where the balance differs.
    if (_jax.default_backend() != "tpu" or not plan.is64
            or getattr(plan, "members", None) is None
            or not 12 <= plan.logn <= 23
            or any(q >= (1 << 60) for q in plan.qs)):
        return None
    x = np.asarray(x)
    # in-VMEM stacked kernel ceiling is 2^16: at 2^17 its forward needs
    # 17.77M scoped VMEM vs the 16M v5e limit (chiplog/r3_drive_compiled
    # u64-rns-17 probe) — logn 17 rides the stacked large-ring engine
    large = plan.logn > 16
    rplan = _mxu_rns_plan_cached(plan, large)
    if rplan is not None:
        from .pallas_mxu_rns import (pallas_mxu_large_rns_u64,
                                     pallas_mxu_rns_u64)

        fn = pallas_mxu_large_rns_u64 if large else pallas_mxu_rns_u64
        lanes = to_lanes(x, True)
        out = fn(lanes, rplan, mod_idx, inverse=inverse)
        return from_lanes(out, True).astype(x.dtype)
    out = np.empty_like(x)
    for m in range(plan.mod_count):
        sel = np.nonzero(mod_idx == m)[0]
        if sel.size == 0:
            continue
        mp = _merge_plan_cached(plan.members[m])
        out[sel] = intt(x[sel], mp) if inverse else ntt(x[sel], mp)
    return out


def ntt_rns(x, plan, cfg: NTTConfig | None = None):
    """GPU_NTT RNS overload (ntt.cu:2560-2800)."""
    from .rns import rns_ntt_lanes

    x = np.asarray(x)
    mod_idx = _rns_mod_idx(x.shape[0], plan.mod_count)
    routed = _rns_mxu_route(x, plan, mod_idx, inverse=False)
    if routed is not None:
        return routed
    lanes = to_lanes(x, plan.is64)
    fn = _rns_cached_jit(plan, ("ntt_rns", tuple(mod_idx.tolist())),
                         lambda: lambda v, pl: rns_ntt_lanes(v, pl, mod_idx))
    return from_lanes(fn(lanes, plan), plan.is64)


def intt_rns(x, plan, cfg: NTTConfig | None = None):
    """GPU_INTT RNS overload (ntt.cu:2800-3059)."""
    from .rns import rns_intt_lanes

    x = np.asarray(x)
    mod_idx = _rns_mod_idx(x.shape[0], plan.mod_count)
    routed = _rns_mxu_route(x, plan, mod_idx, inverse=True)
    if routed is not None:
        return routed
    lanes = to_lanes(x, plan.is64)
    fn = _rns_cached_jit(plan, ("intt_rns", tuple(mod_idx.tolist())),
                         lambda: lambda v, pl: rns_intt_lanes(v, pl, mod_idx))
    return from_lanes(fn(lanes, plan), plan.is64)


def ntt_modulus_ordered(x, plan, order, cfg: NTTConfig | None = None):
    """GPU_NTT_Modulus_Ordered (ntt.cu:3600-3768): modulus index =
    order[b % mod_count]."""
    from .rns import rns_ntt_lanes

    x = np.asarray(x)
    order = np.asarray(order, dtype=np.int64)
    mod_idx = order[np.arange(x.shape[0]) % len(order)]
    routed = _rns_mxu_route(x, plan, mod_idx, inverse=False)
    if routed is not None:
        return routed
    lanes = to_lanes(x, plan.is64)
    fn = _rns_cached_jit(plan, ("ntt_rns", tuple(mod_idx.tolist())),
                         lambda: lambda v, pl: rns_ntt_lanes(v, pl, mod_idx))
    return from_lanes(fn(lanes, plan), plan.is64)


def intt_modulus_ordered(x, plan, order, cfg: NTTConfig | None = None):
    from .rns import rns_intt_lanes

    x = np.asarray(x)
    order = np.asarray(order, dtype=np.int64)
    mod_idx = order[np.arange(x.shape[0]) % len(order)]
    routed = _rns_mxu_route(x, plan, mod_idx, inverse=True)
    if routed is not None:
        return routed
    lanes = to_lanes(x, plan.is64)
    fn = _rns_cached_jit(plan, ("intt_rns", tuple(mod_idx.tolist())),
                         lambda: lambda v, pl: rns_intt_lanes(v, pl, mod_idx))
    return from_lanes(fn(lanes, plan), plan.is64)


def ntt_poly_ordered(x, plan, order, batch_size: int | None = None,
                     cfg: NTTConfig | None = None):
    """GPU_NTT_Poly_Ordered (ntt.cu:3782-4459): for b < batch_size, poly
    order[b] is transformed in place at position order[b] with modulus
    b % mod_count; other rows pass through untouched."""
    from .rns import rns_ntt_lanes

    x = np.asarray(x)
    order = np.asarray(order, dtype=np.int64)
    b = batch_size if batch_size is not None else len(order)
    sel = order[:b]
    mod_idx = np.arange(b, dtype=np.int64) % plan.mod_count
    out = _rns_mxu_route(x[sel], plan, mod_idx, inverse=False)
    if out is None:
        lanes = to_lanes(x[sel], plan.is64)
        fn = _rns_cached_jit(
            plan, ("ntt_rns", tuple(mod_idx.tolist())),
            lambda: lambda v, pl: rns_ntt_lanes(v, pl, mod_idx))
        out = from_lanes(fn(lanes, plan), plan.is64)
    res = x.copy()
    res[sel] = out.astype(x.dtype)
    return res


def intt_poly_ordered(x, plan, order, batch_size: int | None = None,
                      cfg: NTTConfig | None = None):
    from .rns import rns_intt_lanes

    x = np.asarray(x)
    order = np.asarray(order, dtype=np.int64)
    b = batch_size if batch_size is not None else len(order)
    sel = order[:b]
    mod_idx = np.arange(b, dtype=np.int64) % plan.mod_count
    out = _rns_mxu_route(x[sel], plan, mod_idx, inverse=True)
    if out is None:
        lanes = to_lanes(x[sel], plan.is64)
        fn = _rns_cached_jit(
            plan, ("intt_rns", tuple(mod_idx.tolist())),
            lambda: lambda v, pl: rns_intt_lanes(v, pl, mod_idx))
        out = from_lanes(fn(lanes, plan), plan.is64)
    res = x.copy()
    res[sel] = out.astype(x.dtype)
    return res


# ---------------------------------------------- pointwise mult / polymul


def pointwise_mult_lanes(a, b, plan):
    """Elementwise a*b mod q on the lane representation (jittable).

    Device-side rendition of NTTCPU::mult (ntt_cpu.cu:67-79), which the
    reference offers host-side only — exact Barrett, reference schedule
    (modular_arith.cuh:316-338).  `plan` is any plan carrying
    q/bit/mu/is64 (MergePlan or FourStepPlan)."""
    if plan.is64:
        return bo.barrett_mul64(a, b, plan.q, plan.bit, plan.mu)
    return bo.barrett_mul32(a, b, plan.q, plan.bit, plan.mu)


def pointwise_mult(x, y, plan: MergePlan):
    """NTT-domain pointwise product over numpy arrays."""
    xl = to_lanes(np.asarray(x), plan.is64)
    yl = to_lanes(np.asarray(y), plan.is64)
    fn = _cached_jit(plan, ("pmult",),
                     lambda: lambda a, b, pl: pointwise_mult_lanes(a, b, pl))
    return from_lanes(fn(xl, yl, plan), plan.is64)


def polymul_lanes(a, b, plan: MergePlan, use_pallas: bool | str = "auto"):
    """Fused polynomial multiplication modulo (q, X^N +- 1) on lanes
    (jittable): INTT(NTT(a) o NTT(b)), cyclic for X_N_minus and
    negacyclic for X_N_plus — one compiled computation.

    On the u64 in-VMEM MXU route the pointwise product is fused INTO
    the inverse kernel (pallas_mxu_polymul_inv_u64), saving the HBM
    write+read of the product buffer between the pointwise stage and
    the inverse pallas_call; outputs are bit-identical either way."""
    fa = ntt_lanes(a, plan, use_pallas=use_pallas)
    fb = ntt_lanes(b, plan, use_pallas=use_pallas)
    shape = jax.tree_util.tree_leaves(fa)[0].shape
    # the fused product+inverse kernel inherits the INVERSE kernel's
    # scoped-VMEM profile (and adds the 128-bit product) — route with
    # inverse=True so logn 17 takes the large-ring fusion
    path = (_kernel_path(plan, shape, NTTLayout.PerPolynomial,
                         inverse=True)
            if use_pallas == "auto" else None)
    if path in ("mxu", "mxu-large"):
        path, mp, _fn = _resolve_mxu(path, plan)
        if path == "mxu":
            from .pallas_mxu import pallas_mxu_polymul_inv_u64

            return pallas_mxu_polymul_inv_u64(fa, fb, mp)
        if path == "mxu-large":
            from .pallas_mxu import MXUMergePlan
            from .pallas_mxu_large import pallas_mxu_large_polymul_inv

            if isinstance(mp.row_plan, MXUMergePlan):
                return pallas_mxu_large_polymul_inv(fa, fb, mp)
    prod = pointwise_mult_lanes(fa, fb, plan)
    return intt_lanes(prod, plan, use_pallas=use_pallas)


def polymul(x, y, plan: MergePlan):
    """Polynomial multiplication over numpy (batch, N) arrays — the
    reference example flow (test_cpu_merge_ntt.cu:70-77: ntt, mult,
    intt) as one fused jitted computation; bit-exact vs
    schoolbook_poly_multiplication for the plan's reduction polynomial.

    logn 24-28 on TPU runs the big-N route (staged_polymul_lanes):
    composed forward programs per input, then (merge 24-25) the
    pointwise product fused into the row-inverse program."""
    x = np.asarray(x)
    y = np.asarray(y)
    if plan.logn >= 24:
        xl = to_lanes(x, plan.is64)
        yl = to_lanes(y, plan.is64)
        staged = staged_polymul_lanes(xl, yl, plan)
        if staged is not None:
            return from_lanes(staged, plan.is64)
        return intt(pointwise_mult(ntt(x, plan), ntt(y, plan), plan), plan)
    xl = to_lanes(x, plan.is64)
    yl = to_lanes(y, plan.is64)
    fn = _cached_jit(plan, ("polymul",),
                     lambda: lambda a, b, pl: polymul_lanes(a, b, pl))
    return from_lanes(fn(xl, yl, plan), plan.is64)


def rns_pointwise_mult_lanes(a, b, plan, mod_idx):
    """Jittable RNS spectrum product: row r uses modulus mod_idx[r].

    A data x data product needs full Barrett with each modulus' exact
    (q, bit, mu) — the reference shift schedule is static per modulus —
    so each member's constants run over the whole batch and rows are
    mask-selected.  mod_count is small (an HE prime ladder) and the
    pointwise stage is bandwidth-bound next to the transforms, so the
    mod_count x ALU overhead is noise; the numpy entry
    (rns_pointwise_mult) slices per modulus instead and pays nothing."""
    mod_idx = jnp.asarray(np.asarray(mod_idx))
    out = None
    for m, member in enumerate(plan.members):
        mm = member.modulus
        if plan.is64:
            r = bo.barrett_mul64(a, b, mm.value, mm.bit, mm.mu)
        else:
            r = bo.barrett_mul32(a, b, mm.value, mm.bit, mm.mu)
        if out is None:
            out = r
        else:
            sel = mod_idx == m

            def pick(rr, oo):
                mask = sel.reshape((-1,) + (1,) * (rr.ndim - 1))
                return jnp.where(mask, rr, oo)

            out = jax.tree_util.tree_map(pick, r, out)
    return out


def _order_mod_idx(batch: int, plan, order):
    if order is None:
        return _rns_mod_idx(batch, plan.mod_count)
    order = np.asarray(order, dtype=np.int64)
    if order.size and (order.min() < 0 or order.max() >= plan.mod_count):
        raise ValueError(
            f"order entries must be in [0, {plan.mod_count}), got {order}")
    return order[np.arange(batch) % len(order)]


def rns_pointwise_mult(x, y, plan, order=None):
    """NTT-domain RNS product over numpy arrays (cyclic modulus
    schedule by default; `order` as in GPU_NTT_Modulus_Ordered).

    Device-side rendition of the per-modulus NTTCPU::mult loop HE
    callers must otherwise write by hand (the reference offers no RNS
    pointwise at all)."""
    x = np.asarray(x)
    y = np.asarray(y)
    mod_idx = _order_mod_idx(x.shape[0], plan, order)
    out = np.empty_like(x)
    for m in range(plan.mod_count):
        sel = np.nonzero(mod_idx == m)[0]
        if sel.size:
            out[sel] = pointwise_mult(x[sel], y[sel],
                                      _merge_plan_cached(plan.members[m]))
    return out


def rns_polymul(x, y, plan, order=None):
    """RNS polynomial multiplication — the HE evaluation workload:
    forward RNS NTT of both operands (single-kernel MXU RNS engines on
    TPU), per-modulus spectrum product, inverse.  Row r of the batch is
    a residue polynomial modulo (q_{mod_idx[r]}, X^N +/- 1)."""
    if order is None:
        prod = rns_pointwise_mult(ntt_rns(x, plan), ntt_rns(y, plan), plan)
        return intt_rns(prod, plan)
    fx = ntt_modulus_ordered(x, plan, order)
    fy = ntt_modulus_ordered(y, plan, order)
    prod = rns_pointwise_mult(fx, fy, plan, order=order)
    return intt_modulus_ordered(prod, plan, order)
