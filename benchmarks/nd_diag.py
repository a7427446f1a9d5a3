"""Digit-count (ND) combine-cost experiment (r5, VERDICT r4 item 8).

The r4 duty trace: the u64 MXU kernel is VPU-recombination-bound (full
2.618 ms ~= combine-only 2.580; dots-only 1.448) — the per-diagonal
shift/add chain over NDIAG = 2*ND-1 = 15 diagonals is the bound.
Narrower moduli need fewer balanced radix-256 digits (q < 2^55 -> 7,
q < 2^46.4 -> 6, see MXUMergePlan.from_spec nd=), cutting the diagonal
count to 13/11 and the dot count to 49/36.  HE prime ladders live at
40-60 bits, so this is a real workload axis, not a synthetic one.

Run: python benchmarks/nd_diag.py   (2^16 x128, the headline shape)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(logn=16, batch=128):
    import jax

    from gpuntt_tpu import (NTTCPU, NTTFactors, NTTParameters,
                            ReductionPolynomial)
    from gpuntt_tpu.arith.host import find_ntt_primes, ntt_root_pair
    from gpuntt_tpu.arith.modulus import Modulus64
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu import (MXUMergePlan, pallas_mxu_u64,
                                           plan_to_device)
    from gpuntt_tpu.utils.timing import time_marginal_spread

    print(f"device: {jax.devices()[0]}, 2^{logn} x{batch} u64")
    rng = np.random.default_rng(23)
    for bits, nds in ((61, (8,)), (54, (8, 7)), (46, (8, 7, 6))):
        q = find_ntt_primes(bits, logn, 1)[0]
        om, psi = ntt_root_pair(q, logn)
        p = NTTParameters(logn, ReductionPolynomial.X_N_plus,
                          dtype=np.uint64,
                          factors=NTTFactors(Modulus64(q), om, psi))
        gen = NTTCPU(p)
        x = rng.integers(0, q, size=(batch, p.n), dtype=np.uint64)
        exp = np.stack([gen.ntt(x[i]) for i in range(batch)])
        lanes = to_lanes(x, True)
        lanes_f = to_lanes(exp, True)
        for nd in nds:
            plan = plan_to_device(MXUMergePlan.from_spec(
                q, logn, p.root_of_unity, p.inverse_root_of_unity, True,
                p.n_inv, nd=nd))
            got = from_lanes(
                jax.jit(pallas_mxu_u64, static_argnames=("inverse",))(
                    lanes, plan), True)
            ok = np.array_equal(got, exp)
            back = from_lanes(
                jax.jit(pallas_mxu_u64, static_argnames=("inverse",))(
                    lanes_f, plan, inverse=True), True)
            ok = ok and np.array_equal(back, x)
            if not ok:
                print(f"q {bits}b nd={nd}: FAIL bit-exactness")
                continue
            t, n = time_marginal_spread(
                lambda v, pl_: pallas_mxu_u64(v, pl_), lanes, extra=(plan,),
                target_noise=0.10)
            print(json.dumps({
                "q_bits": bits, "nd": nd, "ndiag": 2 * nd - 1,
                "ms_per_batch": round(t * 1e3, 3),
                "ntts_per_sec": round(batch / t, 1),
                "noise": round(n, 3), "parity": "PASS"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
