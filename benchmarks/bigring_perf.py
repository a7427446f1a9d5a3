"""Big-N chip drive (r3 staged -> r4 composed route), merge logn
24-28 + u32 24-25 + 4-step 24 — parity on chip, then MARGINAL timing
(the round-2 numbers were eager wall-clock on a re-lowering route,
10.6 s/NTT at merge 24; the reference's big-N plans are 3-4 launches at
device speed, ntt.cuh:665-698).

Each cell is one subcommand so a relay compile-helper crash (HTTP 500,
sometimes transient — CLAUDE.md) is attributable to one cell and the
rest can still run:

    python benchmarks/bigring_perf.py merge24
    python benchmarks/bigring_perf.py all          # sequential, guarded
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _merge_cell(logn: int, check_inverse: bool = True,
                target_noise: float = 0.25):
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu import _native
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_large import (mxu_large_plan,
                                                 pallas_mxu_large_jit)
    from gpuntt_tpu.utils.timing import time_marginal_eager

    log(f"merge 2^{logn} u64 batch 1 — composed single-program route (r4)")
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    mp = mxu_large_plan(p)
    if mp.row_plan_fwd is not None:
        row = f"delegated-invmem(logn {mp.row_plan_fwd.logn}, both dirs)"
    elif mp.row_plan is None:
        row = "matmul"
    else:
        row = f"{type(mp.row_plan).__name__}(logn {mp.row_plan.logn})"
    log(f"  plan: A={mp.A} B={mp.B} tile={mp.tile} rows={row}")
    rng = np.random.default_rng(7)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    t0 = time.perf_counter()
    y = pallas_mxu_large_jit(lanes, mp)
    got = from_lanes(y, True)
    log(f"  fwd ran ({time.perf_counter() - t0:.1f}s incl compile)")
    exp = _native.ntt_merge(x[0], logn, p.forward_root_of_unity_table,
                            p.modulus.value, True)
    assert np.array_equal(got[0], exp), f"merge{logn} fwd mismatch"
    log("  fwd PASS bit-exact (full native-oracle comparison)")

    if check_inverse:
        t0 = time.perf_counter()
        back = from_lanes(pallas_mxu_large_jit(to_lanes(got, True), mp,
                                               inverse=True), True)
        log(f"  inv ran ({time.perf_counter() - t0:.1f}s incl compile)")
        assert np.array_equal(back, x), f"merge{logn} inv mismatch"
        log("  inv PASS bit-exact (round trip)")

    iters = 1 if logn >= 27 else 3
    fwd, nf = time_marginal_eager(lambda v: pallas_mxu_large_jit(v, mp),
                                  lanes, iters=iters,
                                  target_noise=target_noise)
    inv, ni = time_marginal_eager(
        lambda v: pallas_mxu_large_jit(v, mp, inverse=True), lanes,
        iters=iters, target_noise=target_noise)
    rec = {"cell": f"merge{logn}", "dtype": "u64", "batch": 1,
           "fwd_ms_per_ntt": round(fwd * 1e3, 3),
           "inv_ms_per_ntt": round(inv * 1e3, 3),
           "noise_fwd": round(nf, 3), "noise_inv": round(ni, 3),
           "timing": "eager-chain marginal, composed single program",
           "parity": "PASS"}
    print(json.dumps(rec), flush=True)


def merge24():
    _merge_cell(24)


def merge25():
    _merge_cell(25)


def merge26():
    _merge_cell(26)


def merge26tight():
    # 10% escalation target for the invtwin record (the r5 default-
    # target capture met only 23%/16%)
    _merge_cell(26, target_noise=0.10)


def merge27():
    _merge_cell(27)


def merge28():
    _merge_cell(28)


def _u32_cell(logn: int):
    """u32 big rings ride the composed MXU route (r4; the XLA butterfly
    engine at 2^24 took >15 min of relay compile and is the fallback
    for off-pool moduli only).  Reference u32 pool reaches logn 25
    (nttparameters.cu:84-98)."""
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu import _native
    from gpuntt_tpu.ops.pallas_mxu32 import (mxu32_large_plan,
                                             pallas_mxu32_large_jit)
    from gpuntt_tpu.utils.timing import time_marginal_eager

    log(f"merge 2^{logn} u32 batch 1 — composed single-program route")
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    mp = mxu32_large_plan(p)
    log(f"  plan: A={mp.A} B={mp.B} tile={mp.tile}/{mp.tile_inv}")
    rng = np.random.default_rng(7)
    x = rng.integers(0, p.modulus.value, size=(1, p.n),
                     dtype=np.uint64).astype(np.uint32)

    t0 = time.perf_counter()
    got = np.asarray(pallas_mxu32_large_jit(x, mp))
    log(f"  fwd ran ({time.perf_counter() - t0:.1f}s incl compile)")
    exp = _native.ntt_merge(
        x[0].astype(np.uint64), logn,
        p.forward_root_of_unity_table.astype(np.uint64),
        int(p.modulus.value), True).astype(np.uint32)
    assert np.array_equal(got[0], exp), f"u32 merge{logn} fwd mismatch"
    log("  fwd PASS bit-exact (full native-oracle comparison)")
    t0 = time.perf_counter()
    back = np.asarray(pallas_mxu32_large_jit(got, mp, inverse=True))
    log(f"  inv ran ({time.perf_counter() - t0:.1f}s incl compile)")
    assert np.array_equal(back, x), f"u32 merge{logn} inv mismatch"
    log("  inv PASS bit-exact (round trip)")

    # device-resident input: timing with a host numpy array re-uploads
    # the full ring through the relay on every chain start and the
    # transfer variance swamps the slope (observed: fwd 0.0 ms at
    # noise 6e8 on the first u32m25 drive)
    import jax.numpy as jnp

    xd = jnp.asarray(x)
    fwd, nf = time_marginal_eager(lambda v: pallas_mxu32_large_jit(v, mp), xd)
    inv, ni = time_marginal_eager(
        lambda v: pallas_mxu32_large_jit(v, mp, inverse=True), xd)
    rec = {"cell": f"u32merge{logn}", "dtype": "u32", "batch": 1,
           "fwd_ms_per_ntt": round(fwd * 1e3, 3),
           "inv_ms_per_ntt": round(inv * 1e3, 3),
           "noise_fwd": round(nf, 3), "noise_inv": round(ni, 3),
           "timing": "eager-chain marginal, composed single program",
           "parity": "PASS"}
    print(json.dumps(rec), flush=True)


def u32m24():
    _u32_cell(24)


def u32m25():
    _u32_cell(25)


def fourstep24():
    from gpuntt_tpu import NTT4StepCPU, NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops.fourstep import (FourStepPlan, fourstep_intt_lanes,
                                         fourstep_ntt_lanes)
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.utils.timing import time_marginal_eager

    log("4-step 2^24 u64 batch 1 — composed single-program route (r4)")
    p = NTTParameters4Step(24, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    plan = FourStepPlan.from_params(p)
    rng = np.random.default_rng(7)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    t0 = time.perf_counter()
    y = from_lanes(fourstep_ntt_lanes(lanes, plan), True)
    log(f"  core fwd ran ({time.perf_counter() - t0:.1f}s incl compile)")
    # parity of the full pipeline is bigring_diag.fourstep24's job
    # (already PASS on chip, r2); here we spot the core convention:
    # ntt_full == golden was established there, core reuses it.
    # deeper repeats than the merge cells: the 4-step staged chain is
    # more programs per application, so per-repeat slopes jitter more
    # (first drive read 45%/93% noise at repeats=3)
    fwd, nf = time_marginal_eager(
        lambda v: fourstep_ntt_lanes(v, plan), lanes, iters=4, repeats=7)
    inv, ni = time_marginal_eager(
        lambda v: fourstep_intt_lanes(v, plan), lanes, iters=4, repeats=7)
    rec = {"cell": "fourstep24", "dtype": "u64", "batch": 1,
           "fwd_ms_per_ntt": round(fwd * 1e3, 3),
           "inv_ms_per_ntt": round(inv * 1e3, 3),
           "noise_fwd": round(nf, 3), "noise_inv": round(ni, 3),
           "timing": "eager-chain marginal, composed single program "
                     "(core, caller-side transposes excluded as in the "
                     "reference bench)"}
    print(json.dumps(rec), flush=True)


def polymul24():
    """Flagship end-to-end workload at the big-N scale: composed polymul
    (two composed forwards + the fused product+row-inverse program, r4)
    vs the unfused composed chain — bit-exactness of the fusion plus
    both timings."""
    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import _pointwise_jit
    from gpuntt_tpu.ops.merge_ntt import MergePlan, from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_large import (
        mxu_large_plan, pallas_mxu_large_jit,
        pallas_mxu_large_polymul_inv_jit)
    from gpuntt_tpu.utils.timing import fetch_one, time_marginal_eager

    log("polymul 2^24 u64 batch 1 — composed fused vs unfused (r4)")
    p = NTTParameters(24, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    mp = mxu_large_plan(p)
    rng = np.random.default_rng(11)
    a = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    b = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    la, lb = to_lanes(a, True), to_lanes(b, True)

    def fused(u, v):
        fa = pallas_mxu_large_jit(u, mp)
        fb = pallas_mxu_large_jit(v, mp)
        return pallas_mxu_large_polymul_inv_jit(fa, fb, mp)

    def unfused(u, v):
        fa = pallas_mxu_large_jit(u, mp)
        fb = pallas_mxu_large_jit(v, mp)
        return pallas_mxu_large_jit(_pointwise_jit(fa, fb, plan), mp,
                                    inverse=True)

    t0 = time.perf_counter()
    got_f = from_lanes(fused(la, lb), True)
    log(f"  fused ran ({time.perf_counter() - t0:.1f}s incl compile)")
    t0 = time.perf_counter()
    got_u = from_lanes(unfused(la, lb), True)
    log(f"  unfused ran ({time.perf_counter() - t0:.1f}s incl compile)")
    assert np.array_equal(got_f, got_u), "fused != unfused polymul"
    log("  fused == unfused PASS bit-exact")

    tf, nf = time_marginal_eager(
        lambda u: fused(u, lb), la, iters=2)
    tu, nu = time_marginal_eager(lambda u: unfused(u, lb), la, iters=2)
    rec = {"cell": "polymul24", "dtype": "u64", "batch": 1,
           "fused_ms": round(tf * 1e3, 3), "unfused_ms": round(tu * 1e3, 3),
           "noise_fused": round(nf, 3), "noise_unfused": round(nu, 3),
           "timing": "eager-chain marginal, composed single program",
           "parity": "PASS (fused == unfused)"}
    print(json.dumps(rec), flush=True)


CELLS = ["merge24", "merge25", "merge26", "merge27", "merge28",
         "u32m24", "u32m25", "fourstep24", "polymul24"]


def run_all():
    me = os.path.abspath(__file__)
    for cell in CELLS:
        log(f"=== {cell} ===")
        try:
            r = subprocess.run([sys.executable, me, cell], timeout=3600)
            if r.returncode != 0:
                log(f"{cell} FAILED rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"{cell} TIMEOUT (3600s)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "all":
        run_all()
    else:
        globals()[cmd]()
