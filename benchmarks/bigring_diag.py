"""Diagnose the staged big-N chip cells phase by phase (merge 26 and
4-step 24 crashed the relay compile helper in the round-2 backlog,
benchmarks/chip_backlog.out 16:21-16:28, while merge 24 passed).

Runs each staged phase as its own program with wall timing and a
progress line before every device call, so a compile-helper crash is
attributable to ONE program.  Sequential, chip-only.

    python benchmarks/bigring_diag.py merge26
    python benchmarks/bigring_diag.py fourstep24
    python benchmarks/bigring_diag.py row17      # just the 2^17 row shape
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def fetch(o):
    from gpuntt_tpu.utils.timing import fetch_one
    return fetch_one(o)


def merge26():
    import jax  # noqa: F401

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.ops.pallas_mxu_large import (_col_call, _row_call,
                                                 mxu_large_plan)

    logn = 26
    log(f"building params + plan (logn {logn})")
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    mp = mxu_large_plan(p)
    log(f"plan: A={mp.A} B={mp.B} tile={mp.tile} "
        f"row={'matmul' if mp.row_plan is None else type(mp.row_plan).__name__}")
    rng = np.random.default_rng(3)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    log("phase 1: column kernel (forward)")
    t0 = time.perf_counter()
    y = _col_call(lanes, mp, inverse=False, interpret=False)
    fetch(y)
    log(f"  col fwd ok ({time.perf_counter() - t0:.1f}s incl compile)")

    from gpuntt_tpu.ops.limb import U64
    y2 = U64(y.hi.reshape(1, p.n), y.lo.reshape(1, p.n))
    log("phase 2: row transforms (2^17-point in-VMEM kernel, batch 512)")
    t0 = time.perf_counter()
    z = _row_call(y2, mp, inverse=False, interpret=False)
    fetch(z)
    log(f"  rows fwd ok ({time.perf_counter() - t0:.1f}s incl compile)")

    log("golden check (full 2^26-point bit-exact comparison, NTTCPU model)")
    from gpuntt_tpu.ops.merge_ntt import from_lanes
    from gpuntt_tpu import NTTCPU
    got = from_lanes(z, True)[0]
    exp = NTTCPU(p).ntt(x[0])
    assert np.array_equal(got, exp), "merge26 mismatch vs golden"
    log("merge26 PASS bit-exact")


def row17():
    import jax  # noqa: F401

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.ops.pallas_mxu import mxu_plan, pallas_mxu_u64

    log("2^17 in-VMEM kernel alone, batch 8")
    p = NTTParameters(17, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    mp = mxu_plan(p)
    rng = np.random.default_rng(3)
    x = rng.integers(0, p.modulus.value, size=(8, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)
    t0 = time.perf_counter()
    y = pallas_mxu_u64(lanes, mp)
    fetch(y)
    log(f"  2^17 fwd ok ({time.perf_counter() - t0:.1f}s incl compile)")
    from gpuntt_tpu import NTTCPU
    from gpuntt_tpu.ops.merge_ntt import from_lanes
    got = from_lanes(y, True)
    exp = np.stack([NTTCPU(p).ntt(x[i]) for i in range(2)])
    assert np.array_equal(got[:2], exp), "row17 mismatch"
    log("row17 PASS bit-exact")


def fourstep24():
    import jax  # noqa: F401

    from gpuntt_tpu import NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops.fourstep import FourStepPlan, fourstep_ntt_full
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes

    log("building 4-step logn 24 plan (n1=256, n2=65536)")
    p = NTTParameters4Step(24, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    plan = FourStepPlan.from_params(p)
    rng = np.random.default_rng(3)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    log("full staged 4-step forward (eager, per-phase programs)")
    t0 = time.perf_counter()
    y = fourstep_ntt_full(lanes, plan)
    fetch(y)
    log(f"  fwd ok ({time.perf_counter() - t0:.1f}s incl compile)")

    log("golden check (4-step CPU model)")
    from gpuntt_tpu import NTT4StepCPU
    got = from_lanes(y, True)[0]
    exp = NTT4StepCPU(p).ntt(x[0])
    assert np.array_equal(got, exp), "fourstep24 mismatch vs golden"
    log("fourstep24 PASS bit-exact")


if __name__ == "__main__":
    {"merge26": merge26, "fourstep24": fourstep24,
     "row17": row17}[sys.argv[1]]()
