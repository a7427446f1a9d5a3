"""u32 roll-kernel half-multiply A/B (r5, VERDICT r4 item 2).

The r4 defect log: the roll kernel Shoup-multiplies BOTH butterfly
halves every stage (~2x the reference's modmul count).  r5 adds split
(half-multiply) stage forms for pair-stride t >= 8 via a tile-preserving
(S//2t, 2, t, L) reshape.  This drives both variants on the real chip:
bit-exactness, then marginal time at the headline shape (2^16 x128) and
a mid shape (2^14 x128).

Run: python benchmarks/u32split_diag.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax

    from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops import pallas_merge2 as pm2
    from gpuntt_tpu.ops.merge_ntt import MergePlan
    from gpuntt_tpu.utils.timing import time_marginal_scan

    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(31)
    for logn in (16, 14):
        p = NTTParameters(logn, ReductionPolynomial.X_N_plus,
                          dtype=np.uint32)
        plan = MergePlan.from_params(p)
        kp = plan.kernel_plan()
        gen = NTTCPU(p)
        batch = 128
        x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                         dtype=np.uint64).astype(np.uint32)
        exp = np.stack([gen.ntt(x[i]) for i in range(batch)])

        for name, min_t in (("split", 8), ("roll-only", 1 << 30)):
            pm2.SPLIT_MIN_T = min_t
            # kp is not a pytree: closure-capture it (its stage tables
            # are small; this is what dispatch does today)
            fwd = lambda v: pm2.pallas_merge2_u32(v, kp)
            inv = lambda v: pm2.pallas_merge2_u32(v, kp, inverse=True)
            got = np.asarray(jax.jit(fwd)(x))
            ok = np.array_equal(got, exp)
            back = np.asarray(jax.jit(inv)(got))
            ok = ok and np.array_equal(back, x)
            if not ok:
                print(f"2^{logn} {name}: FAIL bit-exactness")
                continue
            xd = jax.device_put(x)
            tf, nf = time_marginal_scan(fwd, xd)
            ti, ni = time_marginal_scan(inv, jax.device_put(got))
            print(f"2^{logn} x{batch} {name}: fwd {tf * 1e3:.3f} ms "
                  f"({nf * 100:.0f}%), inv {ti * 1e3:.3f} ms "
                  f"({ni * 100:.0f}%)  [bit-exact]")
        pm2.SPLIT_MIN_T = 8
    return 0


if __name__ == "__main__":
    sys.exit(main())
