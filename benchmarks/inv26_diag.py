"""2^26 inverse-twin experiment (r5, VERDICT r4 item 3).

r4 record: merge 2^26 composed fwd 50.8 ms vs inv 82.6 ms — the forward
delegates 2^17 rows to the in-VMEM kernel (one program, 2 kernels), the
inverse recurses (3 kernels + a second W pass) because (a) the in-VMEM
INVERSE kernel overflowed the 16M scoped-VMEM default at 2^17 and (b)
tile_inv halves the inverse column tile at A > 128 for the same reason.
vmem_limit_diag (r5) showed the 16M cap is Mosaic's DEFAULT, not the
hardware: this script measures inverse variants with the cap raised.

Run: python benchmarks/inv26_diag.py [logn]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def log(m):
    print(m, flush=True)


def main(logn=26):
    import jax

    from gpuntt_tpu import NTTParameters, ReductionPolynomial, _native
    from gpuntt_tpu.ops.merge_ntt import from_lanes, to_lanes
    from gpuntt_tpu.ops.pallas_mxu_large import (MXULargePlan,
                                                 pallas_mxu_large_jit)
    from gpuntt_tpu.ops.pallas_mxu import plan_to_device
    from gpuntt_tpu.utils.timing import time_marginal_eager

    log(f"device: {jax.devices()[0]}, ring 2^{logn}")
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    q = p.modulus.value
    n_inv = pow(p.n, q - 2, q)
    rng = np.random.default_rng(9)
    x = rng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    lanes = to_lanes(x, True)
    exp = None

    def spec(**kw):
        return plan_to_device(MXULargePlan.from_spec(
            q, logn, p.root_of_unity, p.inverse_root_of_unity, True,
            n_inv, **kw))

    variants = [
        ("base (r4 tiles)", dict()),
        ("vmem32 tile_inv=tile", dict(vmem_limit=32 << 20)),
        ("vmem48 T=512", dict(tile=512, vmem_limit=48 << 20)),
    ]
    for name, kw in variants:
        try:
            mp = spec(**kw)
            log(f"-- {name}: A={mp.A} B={mp.B} tile={mp.tile} "
                f"tile_inv={mp.tile_inv} vmem={mp.vmem_limit >> 20}M")
            t0 = time.perf_counter()
            y = pallas_mxu_large_jit(lanes, mp)
            got = from_lanes(y, True)
            log(f"   fwd ran ({time.perf_counter() - t0:.1f}s incl compile)")
            if exp is None:
                exp = _native.ntt_merge(x[0], logn,
                                        p.forward_root_of_unity_table, q,
                                        True)
            assert np.array_equal(got[0], exp), f"{name} fwd mismatch"
            t0 = time.perf_counter()
            back = from_lanes(pallas_mxu_large_jit(to_lanes(got, True), mp,
                                                   inverse=True), True)
            log(f"   inv ran ({time.perf_counter() - t0:.1f}s incl compile)")
            assert np.array_equal(back, x), f"{name} inv mismatch"
            fwd, nf = time_marginal_eager(
                lambda v: pallas_mxu_large_jit(v, mp), lanes, iters=3)
            inv, ni = time_marginal_eager(
                lambda v: pallas_mxu_large_jit(v, mp, inverse=True),
                lanes, iters=3)
            print(json.dumps({
                "variant": name, "logn": logn,
                "fwd_ms": round(fwd * 1e3, 2), "inv_ms": round(inv * 1e3, 2),
                "noise_fwd": round(nf, 3), "noise_inv": round(ni, 3),
                "parity": "PASS"}), flush=True)
        except Exception as e:  # noqa: BLE001
            log(f"   {name} FAILED: {type(e).__name__}: {str(e)[:400]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
