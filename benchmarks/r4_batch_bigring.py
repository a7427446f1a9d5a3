"""Batched big-ring throughput + single-chip distributed overhead (r4).

  batch24    staged merge 2^24 u64 forward at batch 1 / 4 / 8 — the
             reference nvbench scope is batch 1; HE servers batch, and
             the staged route's per-phase dispatch amortizes across the
             grid, so throughput/N TT should improve with batch.
  dist24     the compiled shard_map 4-step at ring 2^24 on the dp=1
             sp=1 mesh, fwd+inv roundtrip marginal — the single-chip
             "sharding tax" of the distributed formulation vs the
             staged merge route (which does the same ring in ~21 ms
             fwd+inv).

Usage: python benchmarks/r4_batch_bigring.py [cell ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def cell_batch24():
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_large import (mxu_large_plan,
                                                 staged_mxu_large_u64)
    from gpuntt_tpu.utils.timing import time_marginal_eager

    p = NTTParameters(24, ReductionPolynomial.X_N_minus, dtype=np.uint64)
    MergePlan.from_params(p)
    mp = mxu_large_plan(p)
    rng = np.random.default_rng(0)
    for batch in (1, 4, 8):
        x = rng.integers(0, p.modulus.value, size=(batch, p.n),
                         dtype=np.uint64)
        lanes = to_lanes(x, True)
        dt, nz = time_marginal_eager(
            lambda v: staged_mxu_large_u64(v, mp), lanes)
        print(f"merge24 batch {batch}: {dt*1e3:.2f} ms/batch = "
              f"{dt*1e3/batch:.2f} ms/NTT ({batch/dt:.0f} NTT/s) "
              f"noise {nz:.0%}")


def cell_dist24():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpuntt_tpu import NTT4StepCPU, NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.parallel.fourstep_dist import (DistFourStepPlan,
                                                   dist_fourstep_intt,
                                                   dist_fourstep_ntt)
    from gpuntt_tpu.parallel.mesh import make_mesh
    from gpuntt_tpu.utils.timing import time_marginal

    p = NTTParameters4Step(24, ReductionPolynomial.X_N_minus,
                           dtype=np.uint64)
    dplan = DistFourStepPlan.from_params(p)
    mesh = make_mesh(dp=1)
    rng = np.random.default_rng(1)
    x = rng.integers(0, p.modulus.value, size=(1, p.n), dtype=np.uint64)
    lanes = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("dp", None, "sp"))),
        to_lanes(x.reshape(1, p.n1, p.n2), True))

    def roundtrip(v, dpl):
        return dist_fourstep_intt(
            dist_fourstep_ntt(v, dpl, mesh, local_engine="mxu"),
            dpl, mesh, local_engine="mxu")

    # correctness first
    got = from_lanes(jax.jit(roundtrip)(lanes, dplan), True).reshape(1, p.n)
    assert np.array_equal(got, x), "dist roundtrip diverged"
    # k_hi=2: a k=4 unrolled chain of the full 2^24 shard_map program
    # would quadruple the relay compile payload for no extra signal at
    # a ~20 ms/application cell
    dt = time_marginal(roundtrip, lanes, k_hi=2, extra=(dplan,))
    print(f"dist 4-step 2^24 sp=1 fwd+inv roundtrip: {dt*1e3:.2f} ms "
          f"(staged merge24 fwd+inv reference ~20.9 ms, RESULTS_r3)")


CELLS = {
    "batch24": cell_batch24,
    "dist24": cell_dist24,
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
