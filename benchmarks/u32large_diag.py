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

    def drive(name, plan):
        got = np.asarray(pallas_mxu32_large_jit(x, plan))
        ok = np.array_equal(got, exp)
        back = np.asarray(pallas_mxu32_large_jit(exp, plan, inverse=True))
        ok = ok and np.array_equal(back, x)
        if not ok:
            print(f"{name}: FAIL bit-exactness")
            return
        xd = jax.device_put(x)
        tf, nf = time_marginal_scan(
            lambda v, pl_: pallas_mxu32_large_jit(v, pl_), xd, extra=(plan,))
        tc, nc = time_marginal_scan(
            lambda v, pl_: _col_phase32(v, pl_, False), xd, extra=(plan,))
        tr, nr = time_marginal_scan(
            lambda v, pl_: _row_phase32(v, pl_, False), xd, extra=(plan,))
        print(json.dumps({
            "variant": name, "A": plan.A, "B": plan.B, "tile": plan.tile,
            "full_ms": round(tf * 1e3, 3), "noise": round(nf, 3),
            "col_ms": round(tc * 1e3, 3), "row_ms": round(tr * 1e3, 3),
            "col_noise": round(nc, 3), "row_noise": round(nr, 3),
            "parity": "PASS"}), flush=True)

    drive("default A=128", plan_to_device(MXU32LargePlan.from_params(p)))
    drive("A=256", plan_to_device(MXU32LargePlan.from_params(p, a_col=256)))
    drive("A=512", plan_to_device(MXU32LargePlan.from_params(p, a_col=512)))
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
