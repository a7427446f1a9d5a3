"""Scoped-VMEM limit experiment (r5, VERDICT item 3 groundwork).

Every scoped-VMEM ceiling in this tree (the 2^17 in-VMEM u64 INVERSE at
16.66M, the A=256 T=512 inverse column tile at 18.22M, the u32 VPU
whole-block kernel at 22.11M for 2^17) was measured against the Mosaic
DEFAULT limit of 16M — but v5e has 128 MiB of physical VMEM and
pltpu.CompilerParams(vmem_limit_bytes=...) raises the cap per kernel.
Nobody has tried.  If the 2^17 inverse fits-and-runs with a raised cap,
the 2^26 composed inverse gets the same 2-kernel structure as its
forward (the -41% split), closing the 82.6-vs-50.8 ms asymmetry.

Run on the real chip: python benchmarks/vmem_limit_diag.py [limit_mib]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(limit_mib=32):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpuntt_tpu import NTTCPU, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops import pallas_mxu
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan, plan_to_device

    print(f"device: {jax.devices()[0]}, vmem_limit {limit_mib} MiB")

    # Globally inject the raised cap into every pallas_call in this
    # process (experiment only — the library threads it per-plan).
    real_call = pl.pallas_call

    def patched(kernel, **kw):
        kw.setdefault("compiler_params", pltpu.CompilerParams(
            vmem_limit_bytes=limit_mib << 20))
        return real_call(kernel, **kw)

    pl.pallas_call = patched
    pallas_mxu.pl.pallas_call = patched

    # --- the headline question: in-VMEM u64 INVERSE at 2^17 ---
    p = NTTParameters(17, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p.modulus.value
    plan = plan_to_device(MXUMergePlan.from_params(p))
    gen = NTTCPU(p)
    rng = np.random.default_rng(21)
    x = rng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    exp = np.stack([gen.ntt(x[0])])

    t0 = time.time()
    try:
        back = from_lanes(
            jax.jit(pallas_mxu.pallas_mxu_u64, static_argnames=("inverse",))(
                to_lanes(exp, True), plan, inverse=True), True)
        ok = np.array_equal(back, x)
        print(f"invmem-inverse-17: {'PASS bit-exact' if ok else 'FAIL wrong'}"
              f" (compile+run {time.time() - t0:.1f}s)")
    except Exception as e:  # noqa: BLE001
        print(f"invmem-inverse-17: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}")
        return 1

    # marginal timing vs the current mxu-large route at the same size
    from gpuntt_tpu.utils.timing import time_marginal

    lanes = to_lanes(exp, True)
    t = time_marginal(
        lambda v, pl_: pallas_mxu.pallas_mxu_u64(v, pl_, inverse=True),
        lanes, extra=(plan,))
    print(f"invmem-inverse-17 marginal: {t * 1e3:.3f} ms")

    # control: the FORWARD under the same raised cap (it fits the 16M
    # default, so any slowdown vs its known ~0.07 ms is the cap's own
    # scheduling effect, not the kernel's)
    lanes_x = to_lanes(x, True)
    tf = time_marginal(
        lambda v, pl_: pallas_mxu.pallas_mxu_u64(v, pl_, inverse=False),
        lanes_x, extra=(plan,))
    print(f"invmem-forward-17 marginal (same cap): {tf * 1e3:.3f} ms")

    # batch amortization: the 2^26 row phase runs 512 such rings per
    # program — measure at batch 8 to see the per-ring steady rate
    xb = rng.integers(0, q, size=(8, p.n), dtype=np.uint64)
    expb = np.stack([gen.ntt(xb[i]) for i in range(8)])
    lanes_b = to_lanes(expb, True)
    tb = time_marginal(
        lambda v, pl_: pallas_mxu.pallas_mxu_u64(v, pl_, inverse=True),
        lanes_b, extra=(plan,))
    print(f"invmem-inverse-17 marginal batch8: {tb * 1e3:.3f} ms "
          f"({tb / 8 * 1e3:.3f} ms/ring)")
    tfb = time_marginal(
        lambda v, pl_: pallas_mxu.pallas_mxu_u64(v, pl_, inverse=False),
        lanes_b, extra=(plan,))
    print(f"invmem-forward-17 marginal batch8: {tfb * 1e3:.3f} ms "
          f"({tfb / 8 * 1e3:.3f} ms/ring)")

    from gpuntt_tpu.ops.pallas_mxu_large import (mxu_large_plan,
                                                 pallas_mxu_large_jit)

    lp = mxu_large_plan(p)
    t2 = time_marginal(
        lambda v, pl_: pallas_mxu_large_jit(v, pl_, inverse=True),
        lanes, extra=(lp,))
    print(f"mxu-large-inverse-17 marginal (current route): {t2 * 1e3:.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
