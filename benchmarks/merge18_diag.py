"""Diagnose the batch-1 merge 2^18 chain-compile crash (r3).

The batch-1 sweep's k=4 unrolled chain of the composed col+row program
at logn 18 sent a 6.4 MB MLIR payload to the relay compile helper and
got HTTP 500 three times (r3_batch1_merge*.out).  logn 18 is the only
size on the A=512/B=512 single-matmul row config (pallas_mxu_large
from_spec), whose digit tables are the largest per-kernel.  This
script brackets the failure: k=1 (the program dispatch actually serves
a jitted user), then k=2, then k=4 — with a golden check at k=1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, from_lanes, to_lanes
    from gpuntt_tpu.utils.timing import fetch_one

    p = NTTParameters(18, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    rng = np.random.default_rng(0)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    for k in (1, 2, 4):
        def g(v, pl):
            for _ in range(k):
                v = ntt_lanes(v, pl)
            return v

        t0 = time.perf_counter()
        try:
            o = jax.jit(g)(lanes, plan)
            fetch_one(o)
        except Exception as e:
            log(f"k={k} FAILED after {time.perf_counter() - t0:.1f}s: "
                f"{type(e).__name__}: {str(e)[:1500]}")
            break
        log(f"k={k} compiled+ran in {time.perf_counter() - t0:.1f}s")
        if k == 1:
            got = from_lanes(o, True)[0]
            exp = NTTCPU(p).ntt(x[0])
            assert np.array_equal(got, exp), "merge18 k=1 mismatch vs golden"
            log("k=1 PASS bit-exact vs golden")


if __name__ == "__main__":
    main()
