"""Round-2 headline-floor experiments (VERDICT item 2) — one v5e chip.

Measures the 2^16 u64 x128 merge NTT under combine-stage variants so the
effect of each VPU-side change is attributable:

  base    — shipped kernel (OFF folded into corr tables + shoup_pow2_lazy
            Horner shift fast path)
  nopow2  — generic Horner product (pre-r2 behaviour) via monkeypatch
  nooff   — OFF re-added per diagonal in-kernel (pre-r2 behaviour)

Run each variant in its OWN process (jit caches are per-process):

    python benchmarks/r2_headline.py base
    python benchmarks/r2_headline.py nopow2
    python benchmarks/r2_headline.py nooff

Timing: gpuntt_tpu.utils.timing.time_marginal (k=1 vs k=4 jitted
chains) — the only honest measurement through the relay (CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

LOGN = 16
BATCH = 128


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"

    from gpuntt_tpu.ops import barrett as bo
    from gpuntt_tpu.ops import pallas_mxu as pm

    if variant == "nopow2":
        pm.bo.shoup_pow2_lazy = (
            lambda x, s, ws, q: bo.shoup_mul64_lazy(
                x, bo.u64_const(1 << s), ws, q))
    elif variant == "nooff":
        # the pre-fold (+OFF per diagonal in-kernel) schedule touches
        # the corr tables AND the accumulator cast — measure it by
        # checking out the parent of the fold commit instead of
        # simulating it here
        raise SystemExit("nooff: run from the pre-fold commit "
                         "(git checkout 43fd9c2 -- gpuntt_tpu/ops/"
                         "pallas_mxu.py), variant 'base'")
    elif variant != "base":
        raise SystemExit(f"unknown variant {variant}")

    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import intt_lanes, ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.utils.timing import time_marginal

    p = NTTParameters(LOGN, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    rng = np.random.default_rng(7)
    x = rng.integers(0, p.modulus.value, size=(BATCH, 1 << LOGN),
                     dtype=np.uint64)
    lanes = to_lanes(x, True)

    # correctness first: one forward vs the golden model on 2 rows
    from gpuntt_tpu import NTTCPU
    from gpuntt_tpu.ops.merge_ntt import from_lanes
    gen = NTTCPU(p)
    got = from_lanes(jax.jit(lambda v: ntt_lanes(v, plan))(lanes), True)
    exp = np.stack([gen.ntt(x[i]) for i in range(2)])
    assert np.array_equal(got[:2], exp), "variant broke bit-exactness"

    fwd = time_marginal(lambda v: ntt_lanes(v, plan), lanes)
    inv = time_marginal(lambda v: intt_lanes(v, plan), lanes)
    print(json.dumps({
        "experiment": "r2_headline",
        "variant": variant,
        "shape": f"2^{LOGN} u64 x{BATCH}",
        "fwd_ms": round(fwd * 1e3, 3),
        "inv_ms": round(inv * 1e3, 3),
        "fwd_ntts_per_sec": round(BATCH / fwd),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
