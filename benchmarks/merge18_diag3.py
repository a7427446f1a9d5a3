"""Can the A=128 logn-18 composed program ride deeper timing chains?

After the r3 routing fix (from_params at logn 18 -> A=128 with
delegated in-VMEM rows; the A=512 split's 6.4 MB MLIR crashed the
relay compile helper), the k=4 unrolled chain compiles (merge18_diag2).
The batch-1 cell still read 206% fwd noise at k=1/4 — the ~0.1 ms
signal drowns in multi-ms relay dispatch jitter.  This script checks
whether the smaller program unlocks (a) a lax.scan chain (the
scan-chain marginal is the best methodology) and (b) a k=16 unrolled
chain, so sweep.py can use a deeper slope for this cell.
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

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.utils.timing import fetch_one

    p = NTTParameters(18, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    rng = np.random.default_rng(0)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    def scan_chain(v, pl):
        def body(c, _):
            return ntt_lanes(c, pl), None

        o, _ = jax.lax.scan(body, v, None, length=32)
        return o

    t0 = time.perf_counter()
    try:
        fetch_one(jax.jit(scan_chain)(lanes, plan))
        log(f"scan k=32 compiled+ran in {time.perf_counter() - t0:.1f}s")
    except Exception as e:
        log(f"scan k=32 FAILED after {time.perf_counter() - t0:.1f}s: "
            f"{type(e).__name__}: {str(e)[:1200]}")

    def g16(v, pl):
        for _ in range(16):
            v = ntt_lanes(v, pl)
        return v

    t0 = time.perf_counter()
    try:
        fetch_one(jax.jit(g16)(lanes, plan))
        log(f"k=16 unrolled compiled+ran in {time.perf_counter() - t0:.1f}s")
    except Exception as e:
        log(f"k=16 FAILED after {time.perf_counter() - t0:.1f}s: "
            f"{type(e).__name__}: {str(e)[:1200]}")


if __name__ == "__main__":
    main()
