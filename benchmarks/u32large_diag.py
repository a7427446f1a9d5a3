"""u32 large-route breakdown at 2^20 (r5, VERDICT r4 item 2b).

BENCH_r04 read u32_large_roofline_frac 0.73 at 2^20 b16 (target 0.80).
The route = col32 kernel + in-VMEM u32 row kernel as one composed
program.  This script splits the time by phase (_col_phase32 /
_row_phase32 are separate cached jits) and drives plan variants
(a_col, tile) to find where the 27% goes.

Run: python benchmarks/u32large_diag.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(logn=20, batch=16):
    import jax

    from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.pallas_mxu import plan_to_device
    from gpuntt_tpu.ops.pallas_mxu32 import (MXU32LargePlan, _col_phase32,
                                             _row_phase32,
                                             pallas_mxu32_large_jit)
    from gpuntt_tpu.utils.timing import time_marginal_scan

    print(f"device: {jax.devices()[0]}, 2^{logn} x{batch} u32")
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    q = p.modulus.value
    rng = np.random.default_rng(17)
    x = rng.integers(0, q, size=(batch, p.n), dtype=np.uint64).astype(
        np.uint32)
    gen = NTTCPU(p)
    exp = np.stack([gen.ntt(x[i]) for i in range(batch)])

    from gpuntt_tpu.ops.pallas_mxu32 import pallas_mxu32_large

    def drive(name, plan):
        # fresh jits per variant: the bt choice is trace-internal, so
        # the module-level jit cache would alias across bt variants
        fwd_ = jax.jit(lambda v, pl_: pallas_mxu32_large(v, pl_))
        inv_ = jax.jit(
            lambda v, pl_: pallas_mxu32_large(v, pl_, inverse=True))
        got = np.asarray(fwd_(x, plan))
        ok = np.array_equal(got, exp)
        back = np.asarray(inv_(exp, plan))
        ok = ok and np.array_equal(back, x)
        if not ok:
            print(f"{name}: FAIL bit-exactness")
            return
        xd = jax.device_put(x)
        tf, nf = time_marginal_scan(
            lambda v, pl_: pallas_mxu32_large(v, pl_), xd, extra=(plan,))
        tc, nc = time_marginal_scan(
            lambda v, pl_: _col_phase32(v, pl_, False, interpret=False),
            xd, extra=(plan,))
        row_fn = lambda v, pl_: _row_phase32(v, pl_, False, interpret=False)
        tr, nr = time_marginal_scan(row_fn, xd, extra=(plan,))
        print(json.dumps({
            "variant": name, "A": plan.A, "B": plan.B, "tile": plan.tile,
            "full_ms": round(tf * 1e3, 3), "noise": round(nf, 3),
            "col_ms": round(tc * 1e3, 3), "row_ms": round(tr * 1e3, 3),
            "col_noise": round(nc, 3), "row_noise": round(nr, 3),
            "parity": "PASS"}), flush=True)

    import gpuntt_tpu.ops.pallas_mxu32 as pm32

    base = plan_to_device(MXU32LargePlan.from_params(p))
    for target in (16, 17, 18):
        pm32._pick_bt32 = (
            lambda batch, n, _t=target: max(
                1, next(bt for bt in range((1 << _t) // max(n, 1), 0, -1)
                        if batch % bt == 0)))
        drive(f"A=128 bt-target 2^{target}", base)
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
