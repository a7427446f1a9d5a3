"""Latency sweep harness — the nvbench-equivalent measurement surface.

Mirrors the reference's benchmark binaries (bench_merge_ntt.cu:71-75,
:137-141; bench_4step_ntt.cu:96-100, :185-189): forward/inverse merge
NTT and 4-step NTT latency over logN sweeps, for 32- and 64-bit data.

Timing is marginal in-jit application time (see bench.py) — the analog
of nvbench's stream-scoped kernel timing, excluding dispatch.

Each line is one JSON record; a summary table prints at the end.

Usage:
  python benchmarks/sweep.py [--engine merge|4step|all]
                             [--sizes 12,14,16,...] [--batch-mb 64]
                             [--platform cpu|tpu]   # escape a wedged relay
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "examples"))
import _platform  # noqa: E402

_platform.apply()

import numpy as np

from gpuntt_tpu.utils.timing import time_marginal  # noqa: E402


def bench_merge(logn: int, dtype, batch: int, rng, layout="poly"):
    import jax

    from gpuntt_tpu import NTTLayout, NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.dispatch import _kernel_path, intt_lanes, ntt_lanes
    from gpuntt_tpu.ops.merge_ntt import MergePlan, to_lanes
    from gpuntt_tpu.utils.timing import (time_chain, time_marginal_scan,
                                         time_marginal_spread, time_wall)

    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=dtype)
    plan = MergePlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)
    lanes = to_lanes(x.astype(dtype) if dtype == np.uint32 else x, plan.is64)

    tpu = jax.default_backend() == "tpu"
    if layout == "coeff":
        # PerCoefficient: (N, batch) buffer, transform along axis 0 —
        # measures the relayout cost on top of the same engines.  Same
        # big-N/XLA guards as the poly branch below: never put the XLA
        # engine at logn >= 19 inside a k>1 jitted chain (CLAUDE.md).
        import jax.numpy as jnp

        from gpuntt_tpu.ops.dispatch import intt, ntt

        lanes = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1),
                                       lanes)
        lo = NTTLayout.PerCoefficient
        if tpu and logn >= 24:
            from gpuntt_tpu.ops.dispatch import staged_ntt_lanes
            from gpuntt_tpu.utils.timing import time_marginal_eager

            if staged_ntt_lanes(lanes, plan, layout=lo) is not None:
                fwd, nf = time_marginal_eager(
                    lambda v: staged_ntt_lanes(v, plan, layout=lo), lanes)
                inv, ni = time_marginal_eager(
                    lambda v: staged_ntt_lanes(v, plan, layout=lo,
                                               inverse=True), lanes)
                return fwd, inv, (f"eager-chain marginal (PerCoefficient "
                                  f"staged, noise fwd {nf:.0%} inv {ni:.0%})")
            # ineligible for the staged MXU route (u32 / wide q):
            # numpy entry points, wall-clock
            xc = np.ascontiguousarray(
                (x.astype(dtype) if dtype == np.uint32 else x).T)
            fwd = time_wall(lambda: ntt(xc, plan, layout=lo))
            inv = time_wall(lambda: intt(xc, plan, layout=lo))
            return fwd, inv, "wall-clock (PerCoefficient, staged eager)"
        if tpu and _kernel_path(plan, x.shape,
                                NTTLayout.PerPolynomial) is None:
            fwd = time_chain(
                lambda v, pl: ntt_lanes(v, pl, layout=lo), lanes, k=1,
                extra=(plan,))
            inv = time_chain(
                lambda v, pl: intt_lanes(v, pl, layout=lo), lanes, k=1,
                extra=(plan,))
            return fwd, inv, "k=1 chain (PerCoefficient, XLA engine)"
        # small-footprint gate is BYTE-based (2 MB): u32 2^19 is the
        # same ring bytes as u64 2^18 and needs the same deep-chain
        # treatment (r3: its k=1/4 cell stuck at 42-54% noise)
        if batch * (1 << logn) * np.dtype(dtype).itemsize <= (1 << 21):
            fwd, nf = time_marginal_scan(
                lambda v, pl: ntt_lanes(v, pl, layout=lo), lanes,
                extra=(plan,))
            inv, ni = time_marginal_scan(
                lambda v, pl: intt_lanes(v, pl, layout=lo), lanes,
                extra=(plan,))
            return fwd, inv, (f"scan-chain marginal (PerCoefficient, noise "
                              f"fwd {nf:.0%} inv {ni:.0%})")
        fwd = time_marginal(
            lambda v, pl: ntt_lanes(v, pl, layout=lo), lanes, extra=(plan,))
        inv = time_marginal(
            lambda v, pl: intt_lanes(v, pl, layout=lo), lanes, extra=(plan,))
        return fwd, inv, "marginal (PerCoefficient)"

    if tpu and plan.is64 and plan.q < (1 << 62) and logn >= 24:
        # staged multi-program route: cached jitted phases chained
        # eagerly, device-resident — marginal-timed like everything else
        from gpuntt_tpu.ops.pallas_mxu_large import (mxu_large_plan,
                                                     staged_mxu_large_u64)
        from gpuntt_tpu.utils.timing import time_marginal_eager

        mp = mxu_large_plan(p)
        fwd, nf = time_marginal_eager(
            lambda v: staged_mxu_large_u64(v, mp), lanes)
        inv, ni = time_marginal_eager(
            lambda v: staged_mxu_large_u64(v, mp, inverse=True), lanes)
        return fwd, inv, (f"eager-chain marginal (staged device-resident, "
                          f"noise fwd {nf:.0%} inv {ni:.0%})")
    if (tpu and not plan.is64 and plan.q < (1 << 30)
            and 24 <= logn <= 25):
        # u32 staged route (reference u32 pool ceiling is logn 25)
        from gpuntt_tpu.ops.pallas_mxu32 import (mxu32_large_plan,
                                                 staged_mxu32_large)
        from gpuntt_tpu.utils.timing import time_marginal_eager

        mp = mxu32_large_plan(p)
        xu = to_lanes(x.astype(dtype), False)  # device-resident
        fwd, nf = time_marginal_eager(
            lambda v: staged_mxu32_large(v, mp), xu)
        inv, ni = time_marginal_eager(
            lambda v: staged_mxu32_large(v, mp, inverse=True), xu)
        return fwd, inv, (f"eager-chain marginal (staged device-resident, "
                          f"noise fwd {nf:.0%} inv {ni:.0%})")
    if tpu and _kernel_path(plan, x.shape, NTTLayout.PerPolynomial) is None:
        # XLA butterfly engine.  The historical k>1 compile blowup at
        # logn >= 19 was constant folding of closure-captured tables;
        # with plans as jit arguments a k=4 chain at logn 20 compiles
        # in ~20 s on CPU.  Small footprints (u64 logn <= 11: the
        # LowRing scope, where per-NTT time is microseconds) need the
        # scan-chain window or the slope clamps to garbage — the scan
        # crash is specific to composed Pallas programs, the XLA engine
        # scans fine.  Marginal-time through logn 23; keep k=1 above
        # that (the staged routes own those sizes — this branch only
        # sees them for off-pool moduli).
        # small-footprint gate is BYTE-based (2 MB): u32 2^19 is the
        # same ring bytes as u64 2^18 and needs the same deep-chain
        # treatment (r3: its k=1/4 cell stuck at 42-54% noise)
        if batch * (1 << logn) * np.dtype(dtype).itemsize <= (1 << 21):
            fwd, nf = time_marginal_scan(lambda v, pl: ntt_lanes(v, pl),
                                         lanes, extra=(plan,))
            inv, ni = time_marginal_scan(lambda v, pl: intt_lanes(v, pl),
                                         lanes, extra=(plan,))
            return fwd, inv, (f"scan-chain marginal (XLA engine, noise "
                              f"fwd {nf:.0%} inv {ni:.0%})")
        if logn <= 23:
            fwd, nf = time_marginal_spread(
                lambda v, pl: ntt_lanes(v, pl), lanes, extra=(plan,))
            inv, ni = time_marginal_spread(
                lambda v, pl: intt_lanes(v, pl), lanes, extra=(plan,))
            return fwd, inv, (f"marginal (XLA engine, plan-as-arg chains; "
                              f"noise fwd {nf:.0%} inv {ni:.0%})")
        fwd = time_chain(lambda v, pl: ntt_lanes(v, pl), lanes, k=1,
                         extra=(plan,))
        inv = time_chain(lambda v, pl: intt_lanes(v, pl), lanes, k=1,
                         extra=(plan,))
        return fwd, inv, "k=1 chain (XLA engine; incl dispatch)"
    # small-footprint gate is BYTE-based (2 MB): u32 2^19 is the
    # same ring bytes as u64 2^18 and needs the same deep-chain
    # treatment (r3: its k=1/4 cell stuck at 42-54% noise).  For the
    # composed large routes the gate widens to 8 MB: the u32 batch-1
    # 2^20/21 cells are sub-0.4 ms and their k=1/4 spread UNDER-read by
    # >2x at 42-71% noise (r5 re-drive: scan-chain 0.180/0.343 ms at
    # <=8% vs spread 0.076/0.251 — benchmarks/u32_b1_redrive.py; the
    # one observed scan-compile rejection at these sizes was transient)
    footprint = batch * (1 << logn) * np.dtype(dtype).itemsize
    path = (_kernel_path(plan, x.shape, NTTLayout.PerPolynomial)
            if tpu else None)
    if footprint <= (1 << 21) or (
            path in ("mxu-large", "mxu32-large")
            and footprint <= (1 << 23)):
        # small-footprint cells (the reference's batch-1 nvbench scope,
        # bench_merge_ntt.cu:71-75): sub-0.1 ms kernels drown in relay
        # jitter at k=1/k=4 — use deep scan chains and report the
        # measured noise bound instead of printing clamped garbage
        if tpu and path in ("mxu-large", "mxu32-large"):
            # The historical scan crash here (HTTP 500 at u64 logn 18
            # batch 1, r3) was the A=512 split's ~8 MB inline digit
            # tables; with the A=128 from_params routing the scan chain
            # compiles on chip (merge18_diag3: 41.5 s).  Try the
            # scan-chain marginal — the only methodology whose slope
            # survives the relay's multi-ms dispatch jitter at this
            # ~0.1 ms cell — and fall back to the k=1/4 unrolled spread
            # if a future table-size change re-trips the compile helper.
            try:
                fwd, nf = time_marginal_scan(
                    lambda v, pl: ntt_lanes(v, pl), lanes, extra=(plan,))
                inv, ni = time_marginal_scan(
                    lambda v, pl: intt_lanes(v, pl), lanes, extra=(plan,))
                return fwd, inv, (f"scan-chain marginal (composed program, "
                                  f"escalating depth, noise fwd {nf:.0%} "
                                  f"inv {ni:.0%})")
            except Exception as e:  # relay compile rejection
                print(f"  [scan chain failed ({type(e).__name__}); "
                      f"falling back to unrolled k=1/4]", flush=True)
            fwd, nf = time_marginal_spread(
                lambda v, pl: ntt_lanes(v, pl), lanes, k_hi=4, repeats=6,
                extra=(plan,))
            inv, ni = time_marginal_spread(
                lambda v, pl: intt_lanes(v, pl), lanes, k_hi=4, repeats=6,
                extra=(plan,))
            return fwd, inv, (f"marginal k=1/4 (composed program; no scan; "
                              f"noise fwd {nf:.0%} inv {ni:.0%})")
        fwd, nf = time_marginal_scan(lambda v, pl: ntt_lanes(v, pl),
                                     lanes, extra=(plan,))
        inv, ni = time_marginal_scan(lambda v, pl: intt_lanes(v, pl),
                                     lanes, extra=(plan,))
        return fwd, inv, (f"scan-chain marginal (escalating depth, noise "
                          f"fwd {nf:.0%} inv {ni:.0%})")
    fwd, nf = time_marginal_spread(lambda v, pl: ntt_lanes(v, pl), lanes,
                                   extra=(plan,))
    inv, ni = time_marginal_spread(lambda v, pl: intt_lanes(v, pl), lanes,
                                   extra=(plan,))
    return fwd, inv, f"marginal (noise fwd {nf:.0%} inv {ni:.0%})"


def bench_4step(logn: int, dtype, batch: int, rng):
    import jax

    from gpuntt_tpu import NTTParameters4Step, ReductionPolynomial
    from gpuntt_tpu.ops.fourstep import (FourStepPlan, fourstep_intt_lanes,
                                         fourstep_ntt_lanes)
    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.utils.timing import time_marginal_scan, time_wall

    p = NTTParameters4Step(logn, ReductionPolynomial.X_N_minus, dtype=dtype)
    plan = FourStepPlan.from_params(p)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)
    lanes = to_lanes(x.astype(dtype) if dtype == np.uint32 else x, plan.is64)
    # core-only timing, caller-side transposes excluded — matching the
    # reference bench, which times GPU_4STEP_NTT alone
    if jax.default_backend() == "tpu" and logn >= 24:
        # logn 24 routes to the staged MXU engine only EAGERLY (each
        # pallas_call its own cached jitted program, fourstep._mxu_route
        # hi gate); under jit it would fall to the XLA stage sweep,
        # whose k>1 chains take many minutes to compile on the relay
        from gpuntt_tpu.utils.timing import time_marginal_eager

        fwd, nf = time_marginal_eager(
            lambda v: fourstep_ntt_lanes(v, plan), lanes)
        inv, ni = time_marginal_eager(
            lambda v: fourstep_intt_lanes(v, plan), lanes)
        return fwd, inv, (f"eager-chain marginal (staged device-resident, "
                          f"noise fwd {nf:.0%} inv {ni:.0%})")
    # small-footprint gate is BYTE-based (2 MB): u32 2^19 is the
    # same ring bytes as u64 2^18 and needs the same deep-chain
    # treatment (r3: its k=1/4 cell stuck at 42-54% noise)
    if batch * (1 << logn) * np.dtype(dtype).itemsize <= (1 << 21):
        fwd, nf = time_marginal_scan(
            lambda v, pl: fourstep_ntt_lanes(v, pl), lanes, extra=(plan,))
        inv, ni = time_marginal_scan(
            lambda v, pl: fourstep_intt_lanes(v, pl), lanes, extra=(plan,))
        return fwd, inv, (f"scan-chain marginal (escalating depth, noise "
                          f"fwd {nf:.0%} inv {ni:.0%})")
    from gpuntt_tpu.utils.timing import time_marginal_spread

    fwd, nf = time_marginal_spread(
        lambda v, pl: fourstep_ntt_lanes(v, pl), lanes, extra=(plan,))
    inv, ni = time_marginal_spread(
        lambda v, pl: fourstep_intt_lanes(v, pl), lanes, extra=(plan,))
    return fwd, inv, f"marginal (noise fwd {nf:.0%} inv {ni:.0%})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="all", choices=["merge", "4step", "all"])
    ap.add_argument("--sizes", default="12,14,16,18,20,22,24")
    ap.add_argument("--dtypes", default="u32,u64")
    ap.add_argument("--batch-mb", type=int, default=64,
                    help="total data footprint per run (fixes work per size)")
    ap.add_argument("--batch", type=int, default=None,
                    help="fixed batch size (e.g. 1 for the reference's "
                         "nvbench latency scope); overrides --batch-mb")
    ap.add_argument("--layout", default="poly", choices=["poly", "coeff"],
                    help="merge-engine batch layout (coeff = "
                         "PerCoefficient, ntt.cu:1554-2075 equivalent)")
    args = ap.parse_args()

    import jax

    sizes = [int(s) for s in args.sizes.split(",")]
    dtypes = [np.uint32 if d == "u32" else np.uint64
              for d in args.dtypes.split(",")]
    rng = np.random.default_rng(0)
    dev = str(jax.devices()[0])
    rows = []

    for dtype in dtypes:
        dname = "u32" if dtype == np.uint32 else "u64"
        for logn in sizes:
            n = 1 << logn
            itemsize = 4 if dtype == np.uint32 else 8
            batch = args.batch or max(1, (args.batch_mb << 20) // (n * itemsize))
            for engine in (["merge", "4step"] if args.engine == "all"
                           else [args.engine]):
                if engine == "4step" and not 12 <= logn <= 24:
                    continue
                try:
                    if engine == "merge":
                        fwd, inv, tnote = bench_merge(logn, dtype, batch,
                                                      rng, args.layout)
                    else:
                        fwd, inv, tnote = bench_4step(logn, dtype, batch, rng)
                except Exception as e:
                    # keep enough of the error for a named per-program
                    # cause (e.g. a scoped-VMEM overflow line) — at 200
                    # chars the relay's detail was cut off (r3 logn 18)
                    print(json.dumps({"engine": engine, "logn": logn,
                                      "dtype": dname,
                                      "error": f"{type(e).__name__}: {e}"[:2000]}))
                    continue
                rec = {
                    "engine": engine, "logn": logn, "dtype": dname,
                    "batch": batch,
                    "fwd_ms_per_ntt": round(fwd / batch * 1e3, 6),
                    "inv_ms_per_ntt": round(inv / batch * 1e3, 6),
                    "fwd_ntts_per_sec": round(batch / fwd, 1),
                    "inv_ntts_per_sec": round(batch / inv, 1),
                    "timing": tnote,
                    "device": dev,
                }
                rows.append(rec)
                print(json.dumps(rec), flush=True)

    if rows:
        print(f"\n{'engine':7s} {'dtype':5s} {'logN':4s} {'batch':6s} "
              f"{'fwd NTTs/s':>12s} {'inv NTTs/s':>12s}")
        for r in rows:
            print(f"{r['engine']:7s} {r['dtype']:5s} {r['logn']:<4d} "
                  f"{r['batch']:<6d} {r['fwd_ntts_per_sec']:>12.0f} "
                  f"{r['inv_ntts_per_sec']:>12.0f}")


if __name__ == "__main__":
    main()
