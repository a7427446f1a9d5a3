"""Round-4 measurement-defect re-drives (VERDICT r3 item 5).

  fourstep13   the 4-step logn-13 anomaly: r3 read fwd 0.0332 ms at
               logn 13 vs 0.0163 at logn 14 — physically implausible for
               adjacent sizes.  logn 13 rides the XLA stage engine
               (fourstep._mxu_route u64 floor is 14), logn 14 the MXU
               engine, so the "anomaly" is an engine crossover, not a
               mis-tiled split.  This cell re-measures 12/13/14 on the
               auto route AND logn 12/13 on the FORCED MXU engine to
               settle where the crossover belongs.
  u32-19       u32 merge logn 19 batch 1, fwd+inv, escalating spread to
               the 25% target (r3 fwd cell read 33%).
  polymul24    fused vs unfused staged polymul at 2^24 — repeat captures
               (r3's -21% win rested on one capture at 16% noise).

Run cells individually or all: python benchmarks/r4_defects.py [cell ..]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def cell_fourstep13():
    from gpuntt_tpu import NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops import pallas_mxu_4step as m4
    from gpuntt_tpu.ops.fourstep import (FourStepPlan, fourstep_intt_lanes,
                                         fourstep_ntt_lanes)
    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.utils.timing import time_marginal_scan

    rng = np.random.default_rng(0)
    for logn in (12, 13, 14):
        p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus,
                               dtype=np.uint64)
        plan = FourStepPlan.from_params(p)
        x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
        lanes = to_lanes(x, True)
        fwd, nf = time_marginal_scan(
            lambda v, pl: fourstep_ntt_lanes(v, pl), lanes, extra=(plan,))
        inv, ni = time_marginal_scan(
            lambda v, pl: fourstep_intt_lanes(v, pl), lanes, extra=(plan,))
        print(f"4step auto  logn {logn}: fwd {fwd*1e3:.4f} ms ({nf:.0%}) "
              f"inv {inv*1e3:.4f} ms ({ni:.0%})")
        if logn <= 13:
            mplan = m4.fourstep_mxu_plan(p)
            fwd, nf = time_marginal_scan(
                lambda v, pl: m4.fourstep_mxu_jit(v, pl), lanes,
                extra=(mplan,))
            inv, ni = time_marginal_scan(
                lambda v, pl: m4.fourstep_mxu_jit(v, pl, inverse=True),
                lanes, extra=(mplan,))
            print(f"4step MXU   logn {logn}: fwd {fwd*1e3:.4f} ms ({nf:.0%}) "
                  f"inv {inv*1e3:.4f} ms ({ni:.0%})")


def cell_u32_19():
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import intt_lanes, ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.utils.timing import time_marginal_spread

    rng = np.random.default_rng(0)
    p = NTTParameters(19, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    plan = MergePlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(1, p.n),
                     dtype=np.uint64).astype(np.uint32)
    lanes = to_lanes(x, False)
    fwd, nf = time_marginal_spread(
        lambda v, pl: ntt_lanes(v, pl), lanes, extra=(plan,))
    inv, ni = time_marginal_spread(
        lambda v, pl: intt_lanes(v, pl), lanes, extra=(plan,))
    print(f"u32 merge logn 19: fwd {fwd*1e3:.4f} ms ({nf:.0%}) "
          f"inv {inv*1e3:.4f} ms ({ni:.0%})")


def cell_polymul24(captures=2):
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import (_pointwise_jit, staged_polymul_lanes)
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_large import (mxu_large_plan,
                                                 staged_mxu_large_u64)
    from gpuntt_tpu.utils.timing import time_marginal_eager

    rng = np.random.default_rng(0)
    p = NTTParameters(24, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    plan = MergePlan.from_params(p)
    a = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    b = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    la, lb = to_lanes(a, True), to_lanes(b, True)
    mp = mxu_large_plan(p)

    def unfused(ab):
        x, y = ab
        fa = staged_mxu_large_u64(x, mp)
        fb = staged_mxu_large_u64(y, mp)
        prod = _pointwise_jit(fa, fb, plan)
        return staged_mxu_large_u64(prod, mp, inverse=True), y

    def fused(ab):
        x, y = ab
        return staged_polymul_lanes(x, y, plan), y

    for i in range(captures):
        tf, nzf = time_marginal_eager(fused, (la, lb))
        tu, nzu = time_marginal_eager(unfused, (la, lb))
        print(f"polymul24 capture {i}: fused {tf*1e3:.2f} ms ({nzf:.0%}) "
              f"unfused {tu*1e3:.2f} ms ({nzu:.0%}) "
              f"win {(1 - tf/tu)*100:.0f}%")


def cell_u32_crossover(logn=16, batch=128):
    """u32 headline-shape engine comparison: the default VPU whole-block
    route reads 0.354 of the u32 Shoup-modmul roofline (r4 bench) — is
    the MXU32 digit-matmul engine faster at the batched shape?  (r1
    measured the STACKED RNS u32 kernel at 0.64x XLA; the single-modulus
    engine at batch was never measured head-to-head.)"""
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.utils.timing import time_marginal_spread

    rng = np.random.default_rng(0)
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint32)
    plan = MergePlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                     dtype=np.uint64).astype(np.uint32)
    lanes = to_lanes(x, False)
    for route in ("vpu", "mxu32"):
        dt, nz = time_marginal_spread(
            lambda v, pl: ntt_lanes(v, pl, use_pallas=route), lanes,
            extra=(plan,))
        print(f"u32 2^{logn} x{batch} route={route}: {dt*1e3:.3f} ms/batch "
              f"({batch/dt:.0f} NTT/s) noise {nz:.0%}")


CELLS = {
    "fourstep13": cell_fourstep13,
    "u32-19": cell_u32_19,
    "polymul24": cell_polymul24,
    "u32-crossover": cell_u32_crossover,
}


def main():
    import jax

    names = sys.argv[1:] or list(CELLS)
    print(f"device: {jax.devices()[0]}")
    for name in names:
        t0 = time.time()
        try:
            CELLS[name]()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
        print(f"  [{name} wall {time.time() - t0:.1f}s]")


if __name__ == "__main__":
    main()
