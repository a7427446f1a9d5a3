"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md targets): batched 2^16 64-bit forward
merge NTTs per second per chip, plus the butterfly-modmul roofline
fraction.  The roofline is measured, not assumed: we time a pure
uint32-lane multiply microkernel at the same array footprint and derive
the chip's achievable modmul rate from the lane-multiply count of one
Shoup butterfly.

Mirrors the reference's nvbench harness scope (bench_merge_ntt.cu:71-75:
forward merge NTT latency sweep); correctness is the test suite's job.
"""

import json
import os
import sys
import time

import numpy as np


def _fetch_one(out):
    """Force a tiny device->host read (real completion barrier).

    block_until_ready under-waits for Pallas custom calls through the
    axon relay (measured: a 6 ms kernel "completed" in 35 us), so all
    timings here chain iterations and amortise a single fetch.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def _time_it(fn, x, iters=30):
    """Chained-iteration timing: y = fn(y) so no call can be elided,
    one sync at the end; 1-iteration baseline subtracted."""
    import time as _t

    def run(k):
        out = fn(x)
        _fetch_one(out)
        t0 = _t.perf_counter()
        out = x
        for _ in range(k):
            out = fn(out)
        _fetch_one(out)
        return _t.perf_counter() - t0

    t1 = run(1)
    tk = run(iters + 1)
    return max((tk - t1) / iters, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes

    logn = int(os.environ.get("BENCH_LOGN", "16"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))

    params = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = MergePlan.from_params(params)
    rng = np.random.default_rng(0)
    x = rng.integers(0, params.modulus.value, size=(batch, params.n), dtype=np.uint64)
    lanes = to_lanes(x, True)

    # auto dispatch: Pallas kernel where eligible, XLA engine otherwise
    fwd = jax.jit(lambda v: ntt_lanes(v, plan))
    dt = _time_it(fwd, lanes)
    ntts_per_sec = batch / dt

    # --- measured modmul roofline (compute-bound probe) ---
    # Peak rate of our own 64-bit modmul primitive (shoup_mul64), timed
    # as a K-deep chain fused into one kernel over a large array — the
    # speed-of-light for any butterfly-based transform built on it.
    # One butterfly = 1 twiddle modmul; (N/2)*logN butterflies per NTT.
    from gpuntt_tpu.ops import barrett as bo
    from gpuntt_tpu.ops.limb import U64

    K = 32
    probe_elems = (64, 65536)
    q = params.modulus.value
    w_val = rng.integers(1, q)
    ws_val = (int(w_val) << 64) // q
    qc = bo.u64_const(q)
    wc = bo.u64_const(int(w_val))
    wsc = bo.u64_const(ws_val)
    xp = rng.integers(0, q, size=probe_elems, dtype=np.uint64)
    xl = U64(
        jnp.asarray((xp >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((xp & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )

    @jax.jit
    def modmul_chain(v):
        for _ in range(K):
            v = bo.shoup_mul64(v, wc, wsc, qc)
        return v

    dt_mm = _time_it(modmul_chain, xl)
    modmuls_per_sec = K * xp.size / dt_mm

    butterflies_per_ntt = (params.n // 2) * params.logn
    achieved_modmuls_per_sec = ntts_per_sec * butterflies_per_ntt
    roofline_frac = achieved_modmuls_per_sec / modmuls_per_sec

    dev = jax.devices()[0]
    result = {
        "metric": f"fwd merge NTT 2^{logn} u64 batch {batch}, NTTs/sec/chip",
        "value": round(ntts_per_sec, 2),
        "unit": "NTTs/sec/chip",
        "vs_baseline": round(roofline_frac / 0.80, 4),
        "detail": {
            "latency_ms_per_batch": round(dt * 1e3, 3),
            "modmul_roofline_frac": round(roofline_frac, 4),
            "peak_modmuls_per_sec": f"{modmuls_per_sec:.3e}",
            "device": str(dev),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
