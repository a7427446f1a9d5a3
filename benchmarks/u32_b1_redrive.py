"""Re-drive the u32 batch-1 logn 20-21 cells with the scan-chain
marginal (RESULTS_r5 honesty note: these two cells fell back to the
unrolled k=1/4 spread at 42-71% noise after the scan compile "re-tripped
the relay helper").  The MXU32LargePlan's tables are all pytree DATA
fields, so a scan with the plan as a jit argument carries no multi-MB
inline constants — per CLAUDE.md's transient-500 discipline the failed
compile must be re-driven before being treated as a program defect.

Run on the real chip: python benchmarks/u32_b1_redrive.py [sizes...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20, 21]
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import intt_lanes, ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.utils.timing import time_marginal_scan

    rng = np.random.default_rng(7)
    for logn in sizes:
        p = NTTParameters(logn, ReductionPolynomial.X_N_plus,
                          dtype=np.uint32)
        q = p.modulus.value
        plan = MergePlan.from_params(p)
        x = rng.integers(0, q, size=(1, p.n), dtype=np.uint32)
        lanes = to_lanes(x, False)
        t0 = time.time()
        try:
            fwd, nf = time_marginal_scan(
                lambda v, pl: ntt_lanes(v, pl), lanes, extra=(plan,),
                target_noise=0.10)
            inv, ni = time_marginal_scan(
                lambda v, pl: intt_lanes(v, pl), lanes, extra=(plan,),
                target_noise=0.10)
        except Exception as e:  # noqa: BLE001 — record the failure class
            print(f"2^{logn} u32 b1: scan FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"2^{logn} u32 b1 scan-chain: fwd {fwd*1e3:.4f} ms "
              f"({nf:.0%}) inv {inv*1e3:.4f} ms ({ni:.0%}) "
              f"[{time.time()-t0:.0f}s incl compile]", flush=True)


if __name__ == "__main__":
    main()
