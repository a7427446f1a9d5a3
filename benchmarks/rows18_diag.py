"""Can the in-VMEM kernel stretch to 2^18 rows? (r5 stretch experiment)

Merge 2^27/28 recurse their 2^18/2^19 rows into nested large plans
(A=512, B=512 single-matmul).  inv26_rows_diag showed the nested route
costs 2x the in-VMEM kernel at 2^17; if the in-VMEM kernel also works
at 2^18 under a raised scoped-VMEM cap, the 2^27 rows could delegate
instead, mirroring the 2^26 win.  This measures in-VMEM(2^18) vs the
nested large plan at the real 2^27 row-batch shape (256 rows keeps the
device footprint at 0.5 GB).

Run: python benchmarks/rows18_diag.py
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(rows=256, logb=18, limit_mib=64):
    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu import (MXUMergePlan, pallas_mxu_u64,
                                           plan_to_device)
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 pallas_mxu_large_u64)
    from gpuntt_tpu.utils.timing import time_marginal_eager

    print(f"device: {jax.devices()[0]}, rows {rows} x 2^{logb} u64, "
          f"cap {limit_mib}M")
    p27 = NTTParameters(27, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p27.modulus.value
    A = 512
    rr = pow(p27.root_of_unity, 2 * A, q)
    rri = pow(p27.inverse_root_of_unity, 2 * A, q)
    B = 1 << logb
    b_inv = pow(B, q - 2, q)

    rng = np.random.default_rng(33)
    x = rng.integers(0, q, size=(rows, B), dtype=np.uint64)
    lanes = to_lanes(x, True)

    pv = plan_to_device(MXUMergePlan.from_spec(q, logb, rr, rri, False,
                                               b_inv))
    pv = dataclasses.replace(pv, vmem_limit=limit_mib << 20)
    pl_ = plan_to_device(MXULargePlan.from_spec(q, logb, rr, rri, False,
                                                b_inv))
    print(f"in-VMEM split: A={pv.A} B={pv.B}; nested: A={pl_.A} B={pl_.B}")

    fwd = jax.jit(pallas_mxu_u64, static_argnames=("inverse", "interpret"))
    lfn = jax.jit(pallas_mxu_large_u64,
                  static_argnames=("inverse", "interpret"))
    try:
        exp = from_lanes(lfn(lanes, pl_), True)  # nested as reference
        got = from_lanes(fwd(lanes, pv), True)
        ok_f = np.array_equal(got, exp)
        back_v = from_lanes(fwd(to_lanes(exp, True), pv, inverse=True), True)
        ok_i = np.array_equal(back_v, x)
        print(f"parity: in-VMEM-2^18 fwd {ok_f}, inv roundtrip {ok_i}")
        if not (ok_f and ok_i):
            return 1
    except Exception as e:  # noqa: BLE001
        print(f"in-VMEM 2^18 FAILED: {type(e).__name__}: {str(e)[:400]}")
        return 1

    lf = to_lanes(exp, True)
    for name, fn in (
            ("in-VMEM-18 fwd", lambda v: fwd(v, pv)),
            ("in-VMEM-18 inv", lambda v: fwd(v, pv, inverse=True)),
            ("nested-large fwd (current 2^27 rows)", lambda v: lfn(v, pl_)),
            ("nested-large inv", lambda v: lfn(v, pl_, inverse=True))):
        t, n = time_marginal_eager(fn, lf, iters=3)
        print(json.dumps({"cell": name, "rows": rows,
                          "ms_per_batch": round(t * 1e3, 2),
                          "noise": round(n, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
