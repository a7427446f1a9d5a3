"""2^26 inverse row-phase head-to-head (r5, VERDICT r4 item 3).

inv26_diag showed the column tile is irrelevant (84.9/85.4/87.8 ms) —
the 32 ms fwd/inv asymmetry at 2^26 lives in the ROW phase: forward
delegates 512 rows of 2^17 to ONE in-VMEM kernel, inverse recurses into
a nested large plan (2 more kernels + a W pass).  This measures the
in-VMEM 2^17 INVERSE kernel (unlocked by vmem_limit, r5) against the
nested large plan at the REAL shape: a (512, 2^17) row batch — a ~40 ms
window, far above relay jitter.

Run: python benchmarks/inv26_rows_diag.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(rows=512, logb=17):
    import dataclasses

    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu import (MXUMergePlan, pallas_mxu_u64,
                                           plan_to_device)
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 pallas_mxu_large_u64)
    from gpuntt_tpu.utils.timing import time_marginal_eager

    print(f"device: {jax.devices()[0]}, rows {rows} x 2^{logb} u64")
    # the row spec of the 2^26 plan: X_N_minus at root^A with B^-1
    p26 = NTTParameters(26, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p26.modulus.value
    A = 512
    rr = pow(p26.root_of_unity, 2 * A, q)
    rri = pow(p26.inverse_root_of_unity, 2 * A, q)
    B = 1 << logb
    b_inv = pow(B, q - 2, q)

    rng = np.random.default_rng(27)
    x = rng.integers(0, q, size=(rows, B), dtype=np.uint64)
    lanes = to_lanes(x, True)

    # candidate: in-VMEM inverse kernel with the cap raised
    pv = plan_to_device(MXUMergePlan.from_spec(q, logb, rr, rri, False,
                                               b_inv))
    pv = dataclasses.replace(pv, vmem_limit=24 << 20)
    # incumbent: the nested large plan (what the 2^26 inverse runs today)
    pl_ = plan_to_device(MXULargePlan.from_spec(q, logb, rr, rri, False,
                                                b_inv))

    fwd = jax.jit(pallas_mxu_u64, static_argnames=("inverse", "interpret"))
    exp = from_lanes(fwd(lanes, pv), True)
    # cross-check the two inverse engines agree and invert
    got_v = from_lanes(fwd(to_lanes(exp, True), pv, inverse=True), True)
    lfn = jax.jit(pallas_mxu_large_u64,
                  static_argnames=("inverse", "interpret"))
    got_l = from_lanes(lfn(to_lanes(exp, True), pl_, inverse=True), True)
    okv, okl = np.array_equal(got_v, x), np.array_equal(got_l, x)
    print(f"parity: in-VMEM inverse {okv}, nested-large inverse {okl}")
    if not (okv and okl):
        return 1

    lf = to_lanes(exp, True)
    for name, fn in (
            ("in-VMEM fwd (the fwd route's rows)",
             lambda v: fwd(v, pv)),
            ("in-VMEM inv vmem24",
             lambda v: fwd(v, pv, inverse=True)),
            ("nested-large inv (current route)",
             lambda v: lfn(v, pl_, inverse=True)),
            ("nested-large fwd",
             lambda v: lfn(v, pl_))):
        t, n = time_marginal_eager(fn, lf, iters=3)
        print(json.dumps({"cell": name, "rows": rows,
                          "ms_per_batch": round(t * 1e3, 2),
                          "ms_per_ring": round(t / rows * 1e6, 2),
                          "noise": round(n, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
