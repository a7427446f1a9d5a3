"""Kernel-path selection logic (no TPU needed — backend is stubbed).

The dispatch table is the TPU analog of the reference's launch-plan
tables (ntt.cuh:606-797); these tests pin the routing decisions."""

import numpy as np
import pytest

from gpuntt_tpu import NTTParameters, ReductionPolynomial
from gpuntt_tpu.ops import dispatch
from gpuntt_tpu.ops.merge_ntt import MergePlan
from gpuntt_tpu.params.merge import NTTLayout


def _path(monkeypatch, logn, dtype, backend="tpu",
          layout=NTTLayout.PerPolynomial, inverse=False):
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: backend)
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=dtype)
    plan = MergePlan.from_params(p)
    return dispatch._kernel_path(plan, (4, p.n), layout, inverse=inverse)


def test_u64_routes(monkeypatch):
    assert _path(monkeypatch, 12, np.uint64) == "mxu"
    assert _path(monkeypatch, 17, np.uint64) == "mxu"
    assert _path(monkeypatch, 18, np.uint64) == "mxu-large"
    assert _path(monkeypatch, 23, np.uint64) == "mxu-large"
    # r5: the composed single program covers the WHOLE reference u64
    # pool range — no jit cliff at 24-28 (VERDICT r4 item 1)
    assert _path(monkeypatch, 24, np.uint64) == "mxu-large"
    assert _path(monkeypatch, 28, np.uint64) == "mxu-large"


def test_u64_inverse_17_routes_large(monkeypatch):
    """The in-VMEM u64 INVERSE kernel exceeds the 16M scoped-VMEM limit
    at 2^17 (16.66M, chiplog/r3_merge26.out); the inverse (only) takes
    the large-ring composed route at that size."""
    assert _path(monkeypatch, 16, np.uint64, inverse=True) == "mxu"
    assert _path(monkeypatch, 17, np.uint64, inverse=True) == "mxu-large"
    assert _path(monkeypatch, 18, np.uint64, inverse=True) == "mxu-large"


def test_rns_17_routes_large(monkeypatch):
    """RNS logn 17 takes the stacked LARGE-ring engine: the stacked
    in-VMEM kernel's forward needs 17.77M scoped VMEM at 2^17
    (chiplog/r3_drive_compiled.out u64-rns-17 probe)."""
    from gpuntt_tpu.ops.rns import RNSMergePlan

    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    seen = {}

    def spy(plan, large):
        seen[plan.logn] = large
        return None  # fall through to the grouped route

    monkeypatch.setattr(dispatch, "_mxu_rns_plan_cached", spy)
    monkeypatch.setattr(dispatch, "ntt", lambda x, mp, **kw: x)
    monkeypatch.setattr(dispatch, "_merge_plan_cached",
                        lambda prm: type("MP", (), {"params": prm})())
    for logn, want_large in [(16, False), (17, True), (18, True)]:
        p0 = NTTParameters(logn, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
        plan = RNSMergePlan.from_params([p0])
        x = np.zeros((1, p0.n), dtype=np.uint64)
        dispatch._rns_mxu_route(x, plan, np.array([0]), inverse=False)
        assert seen[logn] is want_large


def test_bigring_26_rows_delegate_both_directions():
    """Merge 2^26 delegates its 2^17 rows to the in-VMEM kernel in BOTH
    directions (r5): no nested plan, the inverse delegate carrying the
    raised scoped-VMEM cap it needs (the pre-r5 '2^17 inverse does not
    fit scoped VMEM' was Mosaic's 16M default, not hardware — the
    delegation beats the nested recursion 2x, inv26_rows_diag)."""
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan
    from gpuntt_tpu.ops.pallas_mxu_large import MXULargePlan

    p = NTTParameters(26, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    mp = MXULargePlan.from_params(p)
    assert mp.row_plan is None
    assert isinstance(mp.row_plan_fwd, MXUMergePlan)
    assert isinstance(mp.row_plan_inv, MXUMergePlan)
    assert mp.row_plan_inv.vmem_limit > (1 << 24)


def test_u32_routes(monkeypatch):
    assert _path(monkeypatch, 12, np.uint32) == "vpu"
    assert _path(monkeypatch, 16, np.uint32) == "vpu"
    # the whole-block VPU kernel overflows scoped VMEM past 2^16 on
    # chip (22.11M at 2^17 vs the 16M limit, benchmarks/u32vpu_diag.py
    # r3): 17 fits as one in-VMEM MXU block, 18 joins the large engine
    assert _path(monkeypatch, 17, np.uint32) == "mxu32"
    assert _path(monkeypatch, 18, np.uint32) == "mxu32-large"
    assert _path(monkeypatch, 19, np.uint32) == "mxu32-large"
    assert _path(monkeypatch, 23, np.uint32) == "mxu32-large"
    # r5: u32 large engine covers the full reference u32 pool range
    # (logn <= 25, nttparameters.cu:84-98)
    assert _path(monkeypatch, 24, np.uint32) == "mxu32-large"
    assert _path(monkeypatch, 25, np.uint32) == "mxu32-large"
    # logn 26 u32 is unreachable: the parameter pool itself stops at 25


def test_cpu_and_layout_fall_back(monkeypatch):
    assert _path(monkeypatch, 14, np.uint64, backend="cpu") is None
    assert _path(monkeypatch, 14, np.uint64,
                 layout=NTTLayout.PerCoefficient) is None


def test_rns_mxu_route_grouping(monkeypatch):
    """When the single-kernel plan is unavailable, _rns_mxu_route falls
    back to grouping batches by modulus, transforming each group with
    its member plan, and scattering results back in order."""
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dispatch, "_mxu_rns_plan_cached",
                        lambda plan, large: None)
    p0 = NTTParameters(12, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    p1 = NTTParameters(12, ReductionPolynomial.X_N_minus, dtype=np.uint64)

    from gpuntt_tpu.ops.rns import RNSMergePlan

    plan = RNSMergePlan.from_params([p0, p1])
    calls = []

    def fake_ntt(x, mp, **kw):
        calls.append((id(mp.params), x.shape[0]))
        return x + np.uint64(1)

    monkeypatch.setattr(dispatch, "ntt", fake_ntt)
    monkeypatch.setattr(dispatch, "_merge_plan_cached",
                        lambda prm: type("MP", (), {"params": prm})())
    x = np.arange(5 * p0.n, dtype=np.uint64).reshape(5, p0.n)
    mod_idx = np.array([0, 1, 0, 1, 0])
    out = dispatch._rns_mxu_route(x, plan, mod_idx, inverse=False)
    assert out is not None
    np.testing.assert_array_equal(out, x + 1)
    assert sorted(c[1] for c in calls) == [2, 3]  # group sizes


def test_rns_mxu_route_prefers_single_kernel(monkeypatch):
    """On TPU the route prefers the stacked single-kernel engine."""
    import gpuntt_tpu.ops.pallas_mxu_rns as prns

    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    p0 = NTTParameters(12, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    p1 = NTTParameters(12, ReductionPolynomial.X_N_minus, dtype=np.uint64)

    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.ops.rns import RNSMergePlan

    plan = RNSMergePlan.from_params([p0, p1])
    seen = {}

    def fake_kernel(lanes, rplan, mod_idx, inverse=False, interpret=False):
        seen["mod_idx"] = np.asarray(mod_idx).tolist()
        seen["mc"] = rplan.mod_count
        return lanes

    monkeypatch.setattr(prns, "pallas_mxu_rns_u64", fake_kernel)
    x = np.arange(4 * p0.n, dtype=np.uint64).reshape(4, p0.n)
    mod_idx = np.array([0, 1, 1, 0])
    out = dispatch._rns_mxu_route(x, plan, mod_idx, inverse=False)
    assert out is not None
    np.testing.assert_array_equal(out, x)  # identity fake
    assert seen == {"mod_idx": [0, 1, 1, 0], "mc": 2}


def test_rns_mxu_route_declines_off_tpu(monkeypatch):
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "cpu")
    p = NTTParameters(12, ReductionPolynomial.X_N_minus, dtype=np.uint64)

    from gpuntt_tpu.ops.rns import RNSMergePlan

    plan = RNSMergePlan.from_params([p])
    x = np.zeros((2, p.n), dtype=np.uint64)
    assert dispatch._rns_mxu_route(x, plan, np.zeros(2, np.int64),
                                   inverse=False) is None


def test_fourstep_logn24_routes_in_and_out_of_traces(monkeypatch):
    """logn 24 (MATRIX_DIMENSIONS max) routes to the MXU 4-step engine
    both eagerly AND under a trace (r5 — the pre-r5 trace gate was the
    refuted 'composed 2^24 overwhelms the compiler' doctrine; the m4
    plan tables are factored-small)."""
    import types

    import jax
    import numpy as np

    from gpuntt_tpu.ops import fourstep as fs
    from gpuntt_tpu.ops import pallas_mxu_4step as m4
    from gpuntt_tpu.ops.limb import U64

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(m4, "fourstep_mxu_plan", lambda p: object())
    monkeypatch.setattr(
        m4, "fourstep_mxu_lanes",
        lambda x2, mplan, inverse=False, interpret=False: x2)
    # eager takes the cached composed jit at every size (r4)
    monkeypatch.setattr(
        m4, "fourstep_mxu_jit",
        lambda x2, mplan, inverse=False, interpret=False: x2)

    plan = types.SimpleNamespace(params=object(), q=97, logn=24, is64=True)
    x = U64(*(np.zeros((2, 16), dtype=np.uint32),) * 2)

    assert fs._mxu_route(x, plan, inverse=False) is not None  # eager: routed

    traced_result = []

    @jax.jit
    def probe(v):
        traced_result.append(fs._mxu_route(v, plan, inverse=False))
        return v.hi

    probe(x)
    assert traced_result[0] is not None  # traced: ALSO routed (r5)

    plan25 = types.SimpleNamespace(params=object(), q=97, logn=25, is64=True)
    traced_result.clear()

    @jax.jit
    def probe25(v):
        traced_result.append(fs._mxu_route(v, plan25, inverse=False))
        return v.hi

    probe25(x)
    assert traced_result == [None]  # beyond MATRIX_DIMENSIONS: declined


def test_from_params_attaches_engines_on_tpu(monkeypatch):
    """On a TPU backend from_params attaches the MXU engine plans as
    pytree DATA (plan.engines) and, at the big-ring sizes the MXU
    engines fully cover, SKIPS the 2^n butterfly tables (they are never
    read there and cost ~1 min + GBs at logn 28 — VERDICT r4 item 5)."""
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    p = NTTParameters(18, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    assert plan.fwd_table is None and plan.inv_table is None
    assert set(plan.engines) == {"mxu-large"}
    # _resolve_mxu must hand back the ATTACHED plan object (identity),
    # not rebuild from host params — that is what makes the tables ride
    # as runtime buffers when the MergePlan is a jit argument
    path, mp, fn = dispatch._resolve_mxu("mxu-large", plan)
    assert path == "mxu-large" and mp is plan.engines["mxu-large"]
    # with_tables() restores the butterfly tables for explicit XLA use
    full = plan.with_tables()
    assert full.fwd_table is not None and full.inv_table is not None

    # small rings keep their tables (the XLA/VPU engines read them)
    p13 = NTTParameters(13, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan13 = MergePlan.from_params(p13)
    assert plan13.fwd_table is not None
    assert "mxu" in plan13.engines


def test_ntt_lanes_composes_in_user_jit(monkeypatch):
    """The r4 jit cliff is dead: ntt_lanes/intt_lanes inside a USER
    jax.jit route to the MXU engines via the plan's attached engine
    pytree when the plan rides as a jit ARGUMENT — bit-exact vs the
    golden (run at logn 13 / in-VMEM engine so interpret mode is cheap;
    the logn 24-28 composed route is chip-verified in
    benchmarks/drive_compiled.py userjit cells)."""
    import jax as _jax

    import gpuntt_tpu.ops.pallas_mxu as pm
    from gpuntt_tpu import NTTCPU
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    real = pm.pallas_mxu_u64
    monkeypatch.setattr(
        pm, "pallas_mxu_u64",
        lambda x, mp, inverse=False, interpret=False: real(
            x, mp, inverse=inverse, interpret=True))
    p = NTTParameters(13, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    assert "mxu" in plan.engines
    rng = np.random.default_rng(5)
    x = rng.integers(0, p.modulus.value, size=(2, p.n), dtype=np.uint64)

    calls = []
    orig_resolve = dispatch._resolve_mxu

    def spy(path, pl):
        out = orig_resolve(path, pl)
        calls.append(out[0])
        return out

    monkeypatch.setattr(dispatch, "_resolve_mxu", spy)

    fwd = _jax.jit(lambda v, pl: dispatch.ntt_lanes(v, pl))
    inv = _jax.jit(lambda v, pl: dispatch.intt_lanes(v, pl))
    got = from_lanes(fwd(to_lanes(x, True), plan), True)
    assert calls == ["mxu"]  # routed to the engine INSIDE the trace
    gen = NTTCPU(p)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    np.testing.assert_array_equal(got, exp)
    back = from_lanes(inv(to_lanes(exp, True), plan), True)
    np.testing.assert_array_equal(back, x)


def test_bigring_plan_as_jit_argument_has_no_giant_consts(monkeypatch):
    """Tracing ntt_lanes at logn 18 with the plan as a jit argument must
    not bake multi-MB tables into the jaxpr as constants — inline
    constants are exactly what broke big-N compiles pre-r4 (the relay
    rejects multi-MB payloads, HTTP 413)."""
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    p = NTTParameters(18, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    from gpuntt_tpu.ops.merge_ntt import to_lanes

    x = to_lanes(np.zeros((1, p.n), dtype=np.uint64), True)
    jaxpr = _jax.make_jaxpr(
        lambda v, pl: dispatch.ntt_lanes(v, pl))(x, plan)

    def const_bytes(jx):
        return sum(np.asarray(c).nbytes for c in jx.consts
                   if hasattr(c, "nbytes") or isinstance(c, np.ndarray))

    assert const_bytes(jaxpr) < (1 << 20), "giant consts in 2-D trace"
    # 1-D and 3-D batches canonicalize to the same MXU route (r5 review
    # finding: they used to fall to the XLA engine, whose in-trace
    # table rebuild inlined the 2^n tables)
    x1 = to_lanes(np.zeros(p.n, dtype=np.uint64), True)
    j1 = _jax.make_jaxpr(lambda v, pl: dispatch.ntt_lanes(v, pl))(x1, plan)
    assert const_bytes(j1) < (1 << 20), "giant consts in 1-D trace"
    x3 = to_lanes(np.zeros((2, 2, p.n), dtype=np.uint64), True)
    j3 = _jax.make_jaxpr(lambda v, pl: dispatch.intt_lanes(v, pl))(x3, plan)
    assert const_bytes(j3) < (1 << 20), "giant consts in 3-D trace"


def test_tableless_xla_fallback_raises_in_trace(monkeypatch):
    """Explicitly forcing the XLA engine (use_pallas=False) on a
    table-skipped big-ring plan INSIDE a trace must raise with guidance
    instead of silently inlining the 2^n tables as constants (r5 review
    finding); the same call works eagerly (tables rebuilt host-side)."""
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    p = NTTParameters(18, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    assert plan.fwd_table is None
    from gpuntt_tpu.ops.merge_ntt import to_lanes

    x = to_lanes(np.zeros((1, p.n), dtype=np.uint64), True)
    with pytest.raises(ValueError, match="with_tables"):
        _jax.make_jaxpr(lambda v, pl: dispatch.ntt_lanes(
            v, pl, use_pallas=False))(x, plan)
    # eager call with tables restored works (and matches the engine)
    full = plan.with_tables()
    assert full.fwd_table is not None
