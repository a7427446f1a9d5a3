"""Diagnose the u32 batch-1 logn 17/18 compile crash (r3).

The u32 batch-1 sweep's scan chains crashed the relay compile helper
at logn 17 (1.2 MB MLIR) and 18 (2.4 MB) — the cells ride the
whole-block VPU kernel (dispatch._kernel_path: u32 logn <= 18 ->
"vpu"), never driven at batch 1 before.  Bracket: k=1 single
application (with golden check), then k=4 unrolled, then lax.scan
k=32 — and print the FULL error so the per-program cause (scoped
VMEM vs payload vs flake) is named.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def fixed():
    """Drive the FIXED dispatch routes on chip: u32 2^17 -> in-VMEM
    MXU block ("mxu32"), 2^18 -> composed large engine, golden-checked
    both directions."""
    import jax

    from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import _kernel_path, NTTLayout, intt_lanes, \
        ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, from_lanes, to_lanes
    from gpuntt_tpu.utils.timing import fetch_one

    for logn in (17, 18):
        p = NTTParameters(logn, ReductionPolynomial.X_N_plus,
                          dtype=np.uint32)
        plan = MergePlan.from_params(p)
        rng = np.random.default_rng(0)
        x = rng.integers(0, p.modulus.value, size=(1, p.n),
                         dtype=np.uint64).astype(np.uint32)
        lanes = to_lanes(x, False)
        route = _kernel_path(plan, x.shape, NTTLayout.PerPolynomial)
        t0 = time.perf_counter()
        fwd = jax.jit(ntt_lanes)(lanes, plan)
        fetch_one(fwd)
        log(f"logn {logn} route={route} fwd compiled+ran in "
            f"{time.perf_counter() - t0:.1f}s")
        got = from_lanes(fwd, False)[0]
        exp = NTTCPU(p).ntt(x[0].astype(np.uint64)).astype(np.uint32)
        assert np.array_equal(got, exp), f"logn {logn} fwd mismatch"
        t0 = time.perf_counter()
        back = jax.jit(intt_lanes)(fwd, plan)
        fetch_one(back)
        log(f"logn {logn} inv compiled+ran in {time.perf_counter() - t0:.1f}s")
        assert np.array_equal(from_lanes(back, False)[0], x[0]), \
            f"logn {logn} roundtrip mismatch"
        log(f"logn {logn} PASS bit-exact fwd + roundtrip")


def main():
    import jax

    from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, from_lanes, to_lanes
    from gpuntt_tpu.utils.timing import fetch_one

    for logn in (17, 18):
        p = NTTParameters(logn, ReductionPolynomial.X_N_plus,
                          dtype=np.uint32)
        plan = MergePlan.from_params(p)
        rng = np.random.default_rng(0)
        x = rng.integers(0, p.modulus.value, size=(1, p.n),
                         dtype=np.uint64).astype(np.uint32)
        lanes = to_lanes(x, False)

        # force the whole-block VPU route: after the r3 fix dispatch
        # no longer selects it at these sizes, but this script stays
        # the reproducer for the named scoped-VMEM overflow
        def k1(v, pl):
            return ntt_lanes(v, pl, use_pallas="vpu")

        def k4(v, pl):
            for _ in range(4):
                v = ntt_lanes(v, pl, use_pallas="vpu")
            return v

        def scan32(v, pl):
            return jax.lax.scan(
                lambda c, _: (ntt_lanes(c, pl, use_pallas="vpu"), None),
                v, None, length=32)[0]

        for name, g in (("k=1", k1), ("k=4", k4), ("scan32", scan32)):
            t0 = time.perf_counter()
            try:
                o = jax.jit(g)(lanes, plan)
                fetch_one(o)
                log(f"logn {logn} {name} compiled+ran in "
                    f"{time.perf_counter() - t0:.1f}s")
            except Exception as e:
                log(f"logn {logn} {name} FAILED after "
                    f"{time.perf_counter() - t0:.1f}s: {type(e).__name__}")
                print(str(e), flush=True)
                break
            if name == "k=1":
                got = from_lanes(o, False)[0]
                exp = NTTCPU(p).ntt(x[0].astype(np.uint64)).astype(np.uint32)
                assert np.array_equal(got, exp), f"logn {logn} mismatch"
                log(f"logn {logn} k=1 PASS bit-exact vs golden")


if __name__ == "__main__":
    if "--fixed" in sys.argv:
        fixed()
    else:
        main()
