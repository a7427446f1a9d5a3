"""Compiled-route drive log (VERDICT r1 item 3) — run on the real chip.

Drives every MXU route that the interpret-mode suite cannot exercise
through Mosaic, checks bit-exactness against the golden models, and
prints one PASS/FAIL line per route.  Complements the example scripts
(which cover the default-dispatch routes); this file reaches the
NON-default engines:

  u32-rns-kernel   pallas_mxu32_rns (kept off the default route; see
                   pallas_mxu_rns.py: measured 0.64x XLA on v5e)
  u32-mxu          pallas_mxu_u32 single-modulus (non-default)
  u64-rns-large    pallas_mxu_large_rns_u64 at a production shape
  percoeff-mxu     PerCoefficient layout through the MXU route
  wide62-mxu       in-VMEM MXU kernel at a near-2^62 modulus (the
                   radix-2^32 trimmed combine, pallas_mxu.combine_mode)

Run routes individually with `python benchmarks/drive_compiled.py
<route>` or all of them with no argument (sequential — never two TPU
processes).  `--interpret` forces CPU + Pallas interpret mode at
reduced shapes — a logic smoke check for when the chip is unavailable
(and for CI); the compiled shapes stay the default.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

INTERPRET = False


def _rns_members(logn, dtype):
    from gpuntt_tpu import (Modulus32, Modulus64, NTTFactors, NTTParameters,
                            ReductionPolynomial)

    from gpuntt_tpu.arith.host import find_ntt_primes, ntt_root_pair

    if np.dtype(dtype) == np.uint64:
        bits, mk = 59, Modulus64
    else:
        bits, mk = 29, Modulus32
    out = []
    for q in find_ntt_primes(bits, logn, 3):
        om, psi = ntt_root_pair(q, logn)
        out.append(
            NTTParameters(logn, ReductionPolynomial.X_N_minus, dtype=dtype,
                          factors=NTTFactors(mk(q), om, psi)))
    return out


def drive_u32_rns(logn=13, batch=6):
    from gpuntt_tpu import NTTCPU
    from gpuntt_tpu.ops.pallas_mxu_rns import MXU32RNSPlan, pallas_mxu32_rns

    members = _rns_members(logn, np.uint32)
    plan = MXU32RNSPlan.from_members(members)
    gens = [NTTCPU(p) for p in members]
    rng = np.random.default_rng(3)
    mod_idx = np.arange(batch, dtype=np.int64) % len(members)
    x = np.stack([
        rng.integers(0, members[m].modulus.value, 1 << logn,
                     dtype=np.uint64).astype(np.uint32)
        for m in mod_idx
    ])
    got = np.asarray(pallas_mxu32_rns(x, plan, mod_idx, interpret=INTERPRET))
    exp = np.stack([gens[m].ntt(x[b]) for b, m in enumerate(mod_idx)])
    ok = np.array_equal(got, exp)
    back = np.asarray(
        pallas_mxu32_rns(exp, plan, mod_idx, inverse=True,
                         interpret=INTERPRET))
    ok = ok and np.array_equal(back, x)
    return ok, f"2^{logn} x{batch}, 3 moduli, fwd+inv"


def drive_u32_mxu(logn=13, batch=8):
    from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.pallas_mxu32 import MXU32Plan, pallas_mxu_u32

    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    plan = MXU32Plan.from_params(p)
    gen = NTTCPU(p)
    rng = np.random.default_rng(4)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                     dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pallas_mxu_u32(x, plan, interpret=INTERPRET))
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
    ok = np.array_equal(got, exp)
    back = np.asarray(
        pallas_mxu_u32(exp, plan, inverse=True, interpret=INTERPRET))
    return ok and np.array_equal(back, x), f"2^{logn} x{batch}, fwd+inv"


def drive_u64_rns_large(logn=18, batch=6):
    from gpuntt_tpu import NTTCPU
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_rns import (MXULargeRNSPlan,
                                               pallas_mxu_large_rns_u64)

    members = _rns_members(logn, np.uint64)
    plan = MXULargeRNSPlan.from_members(members)
    gens = [NTTCPU(p) for p in members]
    rng = np.random.default_rng(5)
    mod_idx = np.arange(batch, dtype=np.int64) % len(members)
    x = np.stack([
        rng.integers(0, members[m].modulus.value, 1 << logn, dtype=np.uint64)
        for m in mod_idx
    ])
    got = from_lanes(
        pallas_mxu_large_rns_u64(to_lanes(x, True), plan, mod_idx,
                                 interpret=INTERPRET), True)
    exp = np.stack([gens[m].ntt(x[b]) for b, m in enumerate(mod_idx)])
    ok = np.array_equal(got, exp)
    back = from_lanes(
        pallas_mxu_large_rns_u64(to_lanes(exp, True), plan, mod_idx,
                                 inverse=True, interpret=INTERPRET), True)
    return ok and np.array_equal(back, x), f"2^{logn} x{batch}, 3 moduli, fwd+inv"


def drive_percoeff(logn=13, batch=128):
    from gpuntt_tpu import (NTTCPU, NTTLayout, NTTParameters,
                            ReductionPolynomial, intt, ntt)
    from gpuntt_tpu.ops.dispatch import _kernel_path
    from gpuntt_tpu.ops.merge_ntt import MergePlan

    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    # the claim under test is PerCoefficient-reaches-the-MXU-engines
    # (dispatch relayouts before path selection): fail rather than
    # silently drive the XLA engine if dispatch routes elsewhere
    path = _kernel_path(plan, (batch, p.n), NTTLayout.PerPolynomial)
    if not INTERPRET and path != "mxu":
        return False, f"dispatch routed to {path!r}, expected 'mxu'"
    gen = NTTCPU(p)
    rng = np.random.default_rng(6)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)
    got = ntt(x.T.copy(), plan, layout=NTTLayout.PerCoefficient)
    exp = np.stack([gen.ntt(x[i]) for i in range(4)])
    ok = np.array_equal(got.T[:4], exp)
    back = intt(got, plan, layout=NTTLayout.PerCoefficient)
    route = "XLA smoke" if INTERPRET else f"route {path}"
    return (ok and np.array_equal(back.T, x),
            f"2^{logn} x{batch} (N, batch) axis-0, {route}")


def drive_wide62(logn=14, batch=16):
    from gpuntt_tpu import (NTTCPU, NTTFactors, NTTParameters,
                            ReductionPolynomial)
    from gpuntt_tpu.arith.modulus import Modulus64
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan, pallas_mxu_u64

    # q = 2^62 - 65535 with psi of exact order 2^15 (covers logn <= 14)
    q, psi = 4611686018427322369, 3971270619688269558
    assert pow(psi, 1 << (logn + 1), q) == 1
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64,
                      factors=NTTFactors(Modulus64(q), psi * psi % q, psi))
    plan = MXUMergePlan.from_params(p)
    gen = NTTCPU(p)
    rng = np.random.default_rng(8)
    x = rng.integers(0, q, size=(batch, p.n), dtype=np.uint64)
    got = from_lanes(
        pallas_mxu_u64(to_lanes(x, True), plan, interpret=INTERPRET), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
    ok = np.array_equal(got, exp)
    back = from_lanes(
        pallas_mxu_u64(to_lanes(exp, True), plan, inverse=True,
                       interpret=INTERPRET), True)
    return (ok and np.array_equal(back, x),
            f"2^{logn} x{batch}, q=2^62-65535, fwd+inv")


def drive_u64_rns_17(logn=17, batch=3):
    """The logn-17 RNS route, BOTH directions.  The stacked in-VMEM
    kernel's FORWARD needs 17.77M scoped VMEM at 2^17 (> the 16M v5e
    limit — first probe of this route, r3), so dispatch now sends 17 to
    the stacked LARGE-ring engine; this drives that corrected route
    compiled."""
    from gpuntt_tpu import NTTCPU
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_rns import (MXULargeRNSPlan,
                                               pallas_mxu_large_rns_u64)

    if INTERPRET:
        logn = 13
    members = _rns_members(logn, np.uint64)
    plan = MXULargeRNSPlan.from_members(members)
    gens = [NTTCPU(p) for p in members]
    rng = np.random.default_rng(10)
    mod_idx = np.arange(batch, dtype=np.int64) % len(members)
    x = np.stack([
        rng.integers(0, members[m].modulus.value, 1 << logn, dtype=np.uint64)
        for m in mod_idx
    ])
    got = from_lanes(
        pallas_mxu_large_rns_u64(to_lanes(x, True), plan, mod_idx,
                                 interpret=INTERPRET), True)
    exp = np.stack([gens[m].ntt(x[b]) for b, m in enumerate(mod_idx)])
    ok = np.array_equal(got, exp)
    back = from_lanes(
        pallas_mxu_large_rns_u64(to_lanes(exp, True), plan, mod_idx,
                                 inverse=True, interpret=INTERPRET), True)
    return (ok and np.array_equal(back, x),
            f"2^{logn} x{batch}, 3 moduli, fwd+inv (large engine at the "
            f"in-VMEM kernel's broken size)")


def drive_shardmap_4step(logn=17, batch=2):
    """Compiled shard_map + Mosaic seam (VERDICT r2 weak item 5): the
    distributed 4-step with the MXU local row engine, jitted over a
    real-device mesh.  On the single chip the mesh is dp=1,sp=1 — the
    collectives are degenerate but the Pallas kernels still compile and
    run INSIDE shard_map, which no interpret-mode test can show."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpuntt_tpu import NTT4StepCPU, NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.parallel.fourstep_dist import (DistFourStepPlan,
                                                   dist_fourstep_intt,
                                                   dist_fourstep_ntt)
    from gpuntt_tpu.parallel.mesh import make_mesh

    if INTERPRET:
        # smoke shape: lower the MXU floor so a small ring exercises the
        # same route (mirrors tests/test_distributed.py)
        import gpuntt_tpu.parallel.fourstep_dist as fd

        fd.MXU_LOCAL_MIN_LOGN = 8
        logn, batch = 13, 2
    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    dplan = DistFourStepPlan.from_params(p)
    if dplan.row_mxu is None:
        return False, f"n2={p.n2} below MXU floor — route not exercised"
    mesh = make_mesh(dp=1)  # sp = all remaining devices (1 on the chip)
    gen = NTT4StepCPU(p)
    rng = np.random.default_rng(9)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)
    lanes = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("dp", None, "sp"))),
        to_lanes(x.reshape(batch, p.n1, p.n2), True))

    fwd = jax.jit(lambda v: dist_fourstep_ntt(
        v, dplan, mesh, local_engine="mxu", interpret=INTERPRET))
    spec = fwd(lanes)
    got = from_lanes(spec, True).reshape(batch, p.n)
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
    ok = np.array_equal(got, exp)

    inv = jax.jit(lambda v: dist_fourstep_intt(
        v, dplan, mesh, local_engine="mxu", interpret=INTERPRET))
    back = from_lanes(inv(spec), True).reshape(batch, p.n)
    ok = ok and np.array_equal(back, x)
    sp = mesh.shape["sp"]
    return ok, (f"2^{logn} x{batch} u64, mesh dp=1 sp={sp}, MXU rows "
                f"inside compiled shard_map, fwd+inv")


def _drive_shardmap_ring(logn, batch, dims, label, check_golden=True):
    """Compiled shard_map drive at north-star rings (VERDICT r3 item 1):
    the distributed 4-step jitted over the dp=1 sp=1 mesh with the
    DistFourStepPlan passed as a JIT ARGUMENT (registered pytree) — at
    ring 2^24 the W tables are ~100s of MB and must ride as runtime
    buffers, not closure constants (the relay compile-payload trap)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpuntt_tpu import NTT4StepCPU, NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.parallel.fourstep_dist import (DistFourStepPlan,
                                                   dist_fourstep_intt,
                                                   dist_fourstep_ntt)
    from gpuntt_tpu.parallel.mesh import make_mesh

    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64, dims=dims)
    dplan = DistFourStepPlan.from_params(p)
    mesh = make_mesh(dp=1)
    rng = np.random.default_rng(11)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)
    lanes = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("dp", None, "sp"))),
        to_lanes(x.reshape(batch, p.n1, p.n2), True))

    fwd = jax.jit(lambda v, dp: dist_fourstep_ntt(
        v, dp, mesh, local_engine="mxu", interpret=INTERPRET))
    spec = fwd(lanes, dplan)
    got = from_lanes(spec, True).reshape(batch, p.n)
    if check_golden:
        gen = NTT4StepCPU(p)
        exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
        ok = np.array_equal(got, exp)
    else:
        ok = True
    inv = jax.jit(lambda v, dp: dist_fourstep_intt(
        v, dp, mesh, local_engine="mxu", interpret=INTERPRET))
    back = from_lanes(inv(spec, dplan), True).reshape(batch, p.n)
    ok = ok and np.array_equal(back, x)
    par = "golden fwd + roundtrip" if check_golden else "roundtrip"
    return ok, (f"2^{logn} x{batch} u64 n1xn2={p.n1}x{p.n2}, dp=1 sp=1, "
                f"{label} rows inside compiled shard_map, dplan as jit "
                f"arg, {par}")


def drive_shardmap_24():
    """North-star ring 2^24 (reference factor 256 x 65536) compiled:
    local rows on the in-VMEM MXU engine at 2^16."""
    if INTERPRET:
        return _drive_shardmap_ring(16, 2, None, "in-VMEM MXU")
    return _drive_shardmap_ring(24, 1, None, "in-VMEM MXU")


def drive_shardmap_large():
    """Ring 2^24 refactored 128 x 2^17 (the `dims` extension): local
    rows through the COMPOSED LARGE-RING engine inside compiled
    shard_map — the local-engine regime the 2^20+ efficiency claims
    depend on (VERDICT r3 item 1)."""
    if INTERPRET:
        import gpuntt_tpu.parallel.fourstep_dist as fd

        fd.MXU_LOCAL_LARGE_MIN_LOGN = 12
        return _drive_shardmap_ring(14, 2, (4, 1 << 12), "large-engine")
    return _drive_shardmap_ring(24, 1, (128, 1 << 17), "large-engine")


def _drive_userjit(logn, dtype, batch=1, want_path=None, golden=True):
    """The killed jit cliff (VERDICT r4 item 1): ntt_lanes/intt_lanes
    composed inside a USER jax.jit, with the MergePlan passed as a jit
    ARGUMENT, must route to the composed MXU program at EVERY size the
    reference supports — the engine tables ride as runtime buffers via
    plan.engines (MergePlan.resolved), so the compile payload stays
    small at logn 24+ where inline tables would be tens of MB.
    Reference bar: GPU_NTT composes into any stream/graph at every
    size (ntt.cu:2076-2256)."""
    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial, _native
    from gpuntt_tpu.ops.dispatch import (NTTLayout, _kernel_path, intt_lanes,
                                         ntt_lanes)
    from gpuntt_tpu.ops.merge_ntt import MergePlan, from_lanes, to_lanes

    is64 = np.dtype(dtype) == np.uint64
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=dtype)
    q = p.modulus.value
    plan = MergePlan.from_params(p)
    if not INTERPRET:
        path = _kernel_path(plan, (batch, p.n), NTTLayout.PerPolynomial)
        if path != want_path:
            return False, f"dispatch routed to {path!r}, expected {want_path!r}"
        if not plan.engines or want_path not in plan.engines:
            return False, f"plan.engines missing {want_path!r}: {plan.engines}"
    rng = np.random.default_rng(12)
    x = rng.integers(0, q, size=(batch, p.n), dtype=np.uint64).astype(dtype)

    # the user's own jit — plan as ARGUMENT (tables as runtime buffers)
    fwd = jax.jit(lambda v, pl: ntt_lanes(v, pl))
    inv = jax.jit(lambda v, pl: intt_lanes(v, pl))
    got = from_lanes(fwd(to_lanes(x, is64), plan), is64)
    ok = True
    detail = f"2^{logn} x{batch} {np.dtype(dtype).name}"
    if golden and _native.available():
        exp = _native.ntt_merge(x.astype(np.uint64), p.logn,
                                p.forward_root_of_unity_table.astype(
                                    np.uint64), q, True)
        ok = np.array_equal(got.astype(np.uint64), exp)
        detail += ", golden fwd"
    back = from_lanes(inv(to_lanes(got, is64), plan), is64)
    ok = ok and np.array_equal(back, x)
    return ok, detail + ", roundtrip, inside USER jit, plan as jit arg"


def drive_userjit_24():
    if INTERPRET:
        # CPU smoke: engines attach via resolved(); dispatch falls to
        # the XLA engine off-TPU (route decision itself is meta-only
        # and pinned in test_dispatch_routing)
        return _drive_userjit(14, np.uint64)
    return _drive_userjit(24, np.uint64, want_path="mxu-large")


def drive_userjit_u32_25():
    if INTERPRET:
        return _drive_userjit(13, np.uint32)
    return _drive_userjit(25, np.uint32, want_path="mxu32-large")


def drive_userjit_polymul_24(logn=24):
    """polymul_lanes at a big ring inside a USER jit: TWO composed
    forwards + the fused product+row-inverse + inverse column — the
    largest single composed program in the tree (~3x the transform
    program).  The library-user shape: polynomial multiplication as one
    building block inside their own pipeline."""
    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import polymul_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, from_lanes, to_lanes
    from gpuntt_tpu.reference.schoolbook import schoolbook_poly_multiplication

    if INTERPRET:
        logn = 12
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p.modulus.value
    plan = MergePlan.from_params(p)
    rng = np.random.default_rng(13)
    a = rng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    b = rng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    fn = jax.jit(lambda va, vb, pl: polymul_lanes(va, vb, pl))
    got = from_lanes(fn(to_lanes(a, True), to_lanes(b, True), plan), True)
    if INTERPRET or logn <= 14:
        exp = schoolbook_poly_multiplication(a[0], b[0], p.modulus,
                                             ReductionPolynomial.X_N_plus)
        ok = np.array_equal(got[0], exp)
        par = "schoolbook parity"
    else:
        # schoolbook at 2^24 is O(n^2)-infeasible; cross-check against
        # the eager big-N route (itself chip golden-verified, r4)
        from gpuntt_tpu.ops.dispatch import staged_polymul_lanes

        ref = staged_polymul_lanes(to_lanes(a, True), to_lanes(b, True), plan)
        ok = np.array_equal(got, from_lanes(ref, True))
        par = "parity vs eager big-N route"
    return ok, f"2^{logn} u64 negacyclic polymul inside USER jit, {par}"


def drive_userjit_4step_24(logn=24):
    """4-step at MATRIX_DIMENSIONS max (2^24) inside a USER jit (r5 —
    the pre-r5 trace gate at 24 was the refuted composed-program
    doctrine; the m4 plan tables are factored-small, so the route now
    fires under traces).  Parity vs the eager route (itself chip
    golden-verified, r4) + roundtrip."""
    import jax

    from gpuntt_tpu import NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops.fourstep import (FourStepPlan, fourstep_intt_full,
                                         fourstep_ntt_full)
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes

    if INTERPRET:
        logn = 13
    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    q = p.modulus.value
    plan = FourStepPlan.from_params(p)
    rng = np.random.default_rng(14)
    x = rng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)
    fwd = jax.jit(lambda v, pl: fourstep_ntt_full(v, pl))
    inv = jax.jit(lambda v, pl: fourstep_intt_full(v, pl))
    got = from_lanes(fwd(lanes, plan), True)
    ref = from_lanes(fourstep_ntt_full(lanes, plan), True)  # eager route
    ok = np.array_equal(got, ref)
    back = from_lanes(inv(to_lanes(got, True), plan), True)
    ok = ok and np.array_equal(back, x)
    return ok, (f"2^{logn} u64 4-step inside USER jit, parity vs eager "
                f"route + roundtrip, plan as jit arg")


def drive_userjit_nd_24(logn=24):
    """1-D and 3-D batch shapes through ntt_lanes/intt_lanes at a big
    ring inside a USER jit (r5 post-review fix: pre-fix these fell to
    the XLA engine, whose in-trace table rebuild inlines the 2^n
    butterfly tables as HLO constants at big rings — the canonicalize-
    to-(batch, N) path must reach the SAME composed MXU program).
    Golden fwd (native oracle) + roundtrip + parity vs the 2-D route."""
    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial, _native
    from gpuntt_tpu.ops.dispatch import intt_lanes, ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, from_lanes, to_lanes

    if INTERPRET:
        logn = 14
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p.modulus.value
    plan = MergePlan.from_params(p)
    rng = np.random.default_rng(15)
    x = rng.integers(0, q, size=(2, p.n), dtype=np.uint64)

    fwd = jax.jit(lambda v, pl: ntt_lanes(v, pl))
    inv = jax.jit(lambda v, pl: intt_lanes(v, pl))
    ref2d = from_lanes(fwd(to_lanes(x, True), plan), True)

    # 1-D: a single ring with no batch axis
    l1 = jax.tree_util.tree_map(lambda a: a[0], to_lanes(x[:1], True))
    got1 = from_lanes(jax.tree_util.tree_map(
        lambda a: a[None], fwd(l1, plan)), True)
    ok = np.array_equal(got1, ref2d[:1])
    # 3-D: (2, 1, N) — a ladder-style leading axis
    l3 = jax.tree_util.tree_map(lambda a: a[:, None], to_lanes(x, True))
    got3 = fwd(l3, plan)
    got3_2d = from_lanes(jax.tree_util.tree_map(
        lambda a: a[:, 0], got3), True)
    ok = ok and np.array_equal(got3_2d, ref2d)
    if _native.available():
        exp = _native.ntt_merge(x, p.logn,
                                p.forward_root_of_unity_table.astype(
                                    np.uint64), q, True)
        ok = ok and np.array_equal(ref2d, exp)
    back3 = from_lanes(jax.tree_util.tree_map(
        lambda a: a[:, 0], inv(got3, plan)), True)
    ok = ok and np.array_equal(back3, x)
    return ok, (f"2^{logn} u64 1-D/3-D canonicalization inside USER jit, "
                f"parity vs 2-D + golden fwd + roundtrip")


ROUTES = {
    "u32-rns-kernel": drive_u32_rns,
    "u32-mxu": drive_u32_mxu,
    "u64-rns-large": drive_u64_rns_large,
    "u64-rns-17": drive_u64_rns_17,
    "percoeff-mxu": drive_percoeff,
    "wide62-mxu": drive_wide62,
    "shardmap-4step": drive_shardmap_4step,
    "shardmap-24": drive_shardmap_24,
    "shardmap-large": drive_shardmap_large,
    "userjit-24": drive_userjit_24,
    "userjit-u32-25": drive_userjit_u32_25,
    "userjit-polymul-24": drive_userjit_polymul_24,
    "userjit-4step-24": drive_userjit_4step_24,
    "userjit-nd-24": drive_userjit_nd_24,
}


def main():
    global INTERPRET
    argv = [a for a in sys.argv[1:] if a != "--interpret"]
    if len(argv) != len(sys.argv) - 1:
        INTERPRET = True
        import jax

        # env JAX_PLATFORMS is ignored on this box (axon plugin); the
        # config update before first backend use is the only way.
        jax.config.update("jax_platforms", "cpu")
        # shrink the production-shape route to an interpret-feasible ring
        ROUTES["u64-rns-large"] = lambda: drive_u64_rns_large(14, 4)
    import jax

    names = argv or list(ROUTES)
    print(f"device: {jax.devices()[0]}"
          + (" [interpret smoke]" if INTERPRET else ""))
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            ok, detail = ROUTES[name]()
        except Exception as e:  # noqa: BLE001 — report and continue
            ok, detail = False, f"EXCEPTION {type(e).__name__}: {e}"
        cold = time.time() - t0
        # Per-route compile accounting (VERDICT r3 item 6): a second run
        # of a passing route hits the jit cache (the RNS plans are
        # registered pytrees entering module-level jits as arguments, so
        # a REBUILT plan with identical meta/shapes keys the same cache
        # entry) — cold - warm ~= trace + compile time, warm = plan
        # build + golden + steady-state execution.
        warm = None
        if ok and not INTERPRET:
            t1 = time.time()
            try:
                ok2, _ = ROUTES[name]()
                warm = time.time() - t1
                ok = ok and ok2
            except Exception as e:  # noqa: BLE001
                ok, detail = False, f"WARM EXCEPTION {type(e).__name__}: {e}"
        failed += not ok
        wtxt = f", warm {warm:.1f}s" if warm is not None else ""
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail} "
              f"(cold {cold:.1f}s{wtxt})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
