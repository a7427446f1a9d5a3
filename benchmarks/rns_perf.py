"""RNS throughput at current routing and at ladder scale (VERDICT r3
item 3) — run on the real chip, one cell per invocation or all.

Round 1's RNS numbers (47.5k NTT/s at 2^16 x96 ladder 3) predate the
round-3 rerouting (in-VMEM RNS ceiling dropped to 2^16, logn 17 via the
stacked large engine) and the round-4 pytree/jit rework.  Real HE
ladders run 8-20+ moduli (the reference ships 13 u32 / 17 u64 4-step
pool primes, nttparameters.cu:229-255); this harness measures

  invmem-L3/L8/L16   stacked in-VMEM RNS kernel, 2^16, ladders 3/8/16
  large-17/18        stacked large-ring RNS engine, ladder 3
  polymul-L8         rns_polymul as one jitted lanes computation,
                     2^16 ladder 8 — the HE evaluation headline

Timing: time_marginal_spread over once-compiled k=1/4 chains, the RNS
plan threaded as a jit ARGUMENT via extra= (stacked tables closed over
would inline ~10s of MB into the chain HLO and crash the relay compile
helper).  Output: one line per cell with ms/batch, NTTs/sec (batch rows
per second through the full schedule), and the noise bound.

Usage: python benchmarks/rns_perf.py [cell ...] (default: all)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from gpuntt_tpu.utils.timing import time_marginal_spread  # noqa: E402


def _members(logn, count, bits=59):
    from gpuntt_tpu import (Modulus64, NTTFactors, NTTParameters,
                            ReductionPolynomial)
    from gpuntt_tpu.arith.host import find_ntt_primes, ntt_root_pair

    out = []
    for q in find_ntt_primes(bits, logn, count):
        om, psi = ntt_root_pair(q, logn)
        out.append(NTTParameters(logn, ReductionPolynomial.X_N_minus,
                                 dtype=np.uint64,
                                 factors=NTTFactors(Modulus64(q), om, psi)))
    return out


def _data(members, mod_idx, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.integers(0, members[m].modulus.value, members[0].n,
                     dtype=np.uint64) for m in mod_idx])


def cell_invmem(ladder, batch=64, logn=16):
    """Stacked in-VMEM RNS kernel at 2^16 (the default dispatch route
    for logn <= 16 RNS), fwd + inv cells."""
    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.ops.pallas_mxu_rns import MXURNSPlan, pallas_mxu_rns_u64

    members = _members(logn, ladder)
    t0 = time.time()
    plan = MXURNSPlan.from_members(members)
    build = time.time() - t0
    mod_idx = np.arange(batch, dtype=np.int32) % ladder
    lanes = to_lanes(_data(members, mod_idx), True)

    dt_f, nz_f = time_marginal_spread(
        lambda v, pl: pallas_mxu_rns_u64(v, pl, mod_idx), lanes,
        extra=(plan,))
    dt_i, nz_i = time_marginal_spread(
        lambda v, pl: pallas_mxu_rns_u64(v, pl, mod_idx, inverse=True),
        lanes, extra=(plan,))
    print(f"invmem-L{ladder} 2^{logn} x{batch}: fwd {dt_f*1e3:.3f} ms/batch "
          f"({batch/dt_f:.0f} NTT/s) noise {nz_f:.0%} | inv {dt_i*1e3:.3f} "
          f"ms/batch ({batch/dt_i:.0f} NTT/s) noise {nz_i:.0%} "
          f"| plan build {build:.1f}s")


def cell_large(logn, ladder=3, batch=12):
    """Stacked large-ring RNS engine (dispatch route for logn 17-23
    RNS) at the post-r3 routing."""
    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.ops.pallas_mxu_rns import (MXULargeRNSPlan,
                                               pallas_mxu_large_rns_u64)

    members = _members(logn, ladder)
    t0 = time.time()
    plan = MXULargeRNSPlan.from_members(members)
    build = time.time() - t0
    mod_idx = np.arange(batch, dtype=np.int32) % ladder
    lanes = to_lanes(_data(members, mod_idx), True)

    dt_f, nz_f = time_marginal_spread(
        lambda v, pl: pallas_mxu_large_rns_u64(v, pl, mod_idx), lanes,
        extra=(plan,))
    dt_i, nz_i = time_marginal_spread(
        lambda v, pl: pallas_mxu_large_rns_u64(v, pl, mod_idx, inverse=True),
        lanes, extra=(plan,))
    print(f"large-{logn} L{ladder} x{batch}: fwd {dt_f*1e3:.3f} ms/batch "
          f"({batch/dt_f:.0f} NTT/s) noise {nz_f:.0%} | inv {dt_i*1e3:.3f} "
          f"ms/batch ({batch/dt_i:.0f} NTT/s) noise {nz_i:.0%} "
          f"| plan build {build:.1f}s")


def cell_polymul(ladder=8, batch=64, logn=16):
    """rns_polymul as ONE jitted lanes computation — NTT x2 (stacked RNS
    kernel), per-modulus spectrum product, inverse RNS kernel.  The HE
    evaluation headline (modulus-ordered semantics, ntt.cuh:468-494)."""
    import jax

    from gpuntt_tpu.ops.dispatch import rns_pointwise_mult_lanes
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_rns import MXURNSPlan, pallas_mxu_rns_u64
    from gpuntt_tpu.ops.rns import RNSMergePlan

    members = _members(logn, ladder)
    rplan = RNSMergePlan.from_params(members)
    kplan = MXURNSPlan.from_members(members)
    mod_idx = np.arange(batch, dtype=np.int32) % ladder
    a = _data(members, mod_idx, seed=1)
    b = _data(members, mod_idx, seed=2)
    la, lb = to_lanes(a, True), to_lanes(b, True)

    def step(ab, pl):
        x, y = ab
        fa = pallas_mxu_rns_u64(x, pl, mod_idx)
        fb = pallas_mxu_rns_u64(y, pl, mod_idx)
        prod = rns_pointwise_mult_lanes(fa, fb, rplan, mod_idx)
        return pallas_mxu_rns_u64(prod, pl, mod_idx, inverse=True), y

    # correctness first: one application vs the public numpy entry
    got = from_lanes(jax.jit(step)((la, lb), kplan)[0], True)
    from gpuntt_tpu.ops.dispatch import rns_polymul

    exp = rns_polymul(a, b, rplan)
    assert np.array_equal(got, exp.astype(np.uint64)), "fused != rns_polymul"

    dt, nz = time_marginal_spread(step, (la, lb), extra=(kplan,))
    print(f"polymul-L{ladder} 2^{logn} x{batch}: {dt*1e3:.3f} ms/batch "
          f"({batch/dt:.0f} polymuls/s across the ladder) noise {nz:.0%}, "
          f"bit-exact vs rns_polymul")


CELLS = {
    "invmem-L3": lambda: cell_invmem(3),
    "invmem-L8": lambda: cell_invmem(8),
    "invmem-L16": lambda: cell_invmem(16),
    "large-17": lambda: cell_large(17),
    "large-18": lambda: cell_large(18),
    "polymul-L8": lambda: cell_polymul(8),
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
