"""Trace-backed decomposition of the headline MXU kernel (VERDICT r3
item 4): device-timeline evidence for the ~2.3-2.4 ms floor claim.

Three programs at the headline shape (2^16 u64 x128, A=B=256):

  full      the production forward kernel (pallas_mxu_u64)
  dots      a microkernel issuing the SAME 2x64 int8 digit matmuls
            (identical tile shapes, correction adds included) with the
            recombination replaced by one running int32 add — pure-MXU
            time at the real schedule
  combine   a microkernel running the group-build + Horner + W-Shoup +
            canonicalisation chain of both phases with the diagonal
            accumulators synthesised in ~2 VPU ops each — pure-VPU
            recombination time

Each program runs k times under jax.profiler; the DEVICE timeline
durations (trace.json XLA Ops events, not host wall time) are reported.
If t_full ~= t_dots + t_combine, the MXU and VPU phases are strictly
serialized on hardware (single instruction stream through the vector
datapath), duty_cycle = t_dots / t_full is structural for this
formulation, and the floor statement in docs/DESIGN.md is trace-backed
rather than op-count-derived.

Usage: python benchmarks/duty_trace.py  (real chip)
"""

import functools
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _build(logn=16, batch=128):
    from gpuntt_tpu import NTTParameters, ReductionPolynomial
    from gpuntt_tpu.ops.merge_ntt import to_lanes
    from gpuntt_tpu.ops.pallas_mxu import MXUMergePlan, plan_to_device

    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=np.uint64)
    plan = plan_to_device(MXUMergePlan.from_params(p))
    rng = np.random.default_rng(0)
    x = rng.integers(0, p.modulus.value, size=(batch, p.n), dtype=np.uint64)
    return plan, to_lanes(x, True)


def _dots_kernel(lh, lcorr, rh, rcorr, xh, xl, oh, ol, *, nd):
    """Both digit-matmul phases at the production schedule, recombination
    replaced by a running int32 add (1 VPU add per diagonal)."""
    from gpuntt_tpu.ops.pallas_mxu import _offset_digits
    from gpuntt_tpu.ops.limb import U64

    x = U64(xh[0], xl[0])
    digs = _offset_digits(x, nd)
    ndiag = 2 * nd - 1
    # phase 1: left dots T(nd, A, A') @ digs
    tot1 = None
    for d in range(ndiag):
        acc = jnp.broadcast_to(lcorr[d], (lh.shape[1], xh.shape[2]))
        for i in range(max(0, d - (nd - 1)), min(d, nd - 1) + 1):
            acc = acc + jax.lax.dot_general(
                lh[i], digs[d - i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        tot1 = acc if tot1 is None else tot1 + acc
    # phase 2: right dots on the same input digits (real kernel re-digits
    # the phase-1 result; the extraction cost is charged to `combine`)
    tot2 = None
    for d in range(ndiag):
        acc = jnp.broadcast_to(rcorr[d], (xh.shape[1], rh.shape[2]))
        for i in range(max(0, d - (nd - 1)), min(d, nd - 1) + 1):
            acc = acc + jax.lax.dot_general(
                digs[d - i], rh[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        tot2 = acc if tot2 is None else tot2 + acc
    oh[0] = tot1.astype(jnp.uint32)
    ol[0] = tot2.astype(jnp.uint32)


def _combine_kernel(wh, wl, wsh, wsl, xh, xl, oh, ol, *, consts, nd):
    """Both recombination phases (group build, Horner, W Shoup, canon,
    plus the phase-2 byte extraction) with each diagonal accumulator
    synthesised in ~2 VPU ops (shift + add) instead of arriving from the
    MXU."""
    from gpuntt_tpu.ops import barrett as bo
    from gpuntt_tpu.ops.limb import (U64, u64_add, u64_shl)
    from gpuntt_tpu.ops.pallas_mxu import _offset_digits, _w_mul_lazy, _canon

    qc = bo.u64_const(consts["q"])
    r40sc = bo.u64_const(consts["r40s"])
    group = consts["group"]
    shift = 8 * group
    ndiag = 2 * nd - 1
    x = U64(xh[0], xl[0])

    s = None
    for phase in range(2):
        src = x.lo if phase == 0 else s.lo
        digs = None
        if phase == 1:
            # the production kernel re-extracts int8 digit planes from
            # the phase-1 result here; charge that to the combine (the
            # planes feed the stand-in accs below so DCE keeps them)
            digs = _offset_digits(s, nd)
        groups = []
        g = None
        for d in range(ndiag):
            a = (src >> jnp.uint32(d % 7)) + jnp.uint32(d)  # stand-in acc
            if digs is not None:
                a = a + digs[d % nd].astype(jnp.uint32)
            k = d % group
            piece = u64_shl(U64(jnp.zeros_like(a), a), 8 * k)
            g = piece if k == 0 else u64_add(g, piece)
            if k == group - 1 or d == ndiag - 1:
                groups.append(g)
                g = None
        s = groups[-1]
        for gi in range(len(groups) - 2, -1, -1):
            m = bo.shoup_pow2_lazy(s, shift, r40sc, qc)
            s = u64_add(m, groups[gi])
        s = u64_add(s, bo.u64_const(consts["cadd"]))
        if phase == 0:
            s = _w_mul_lazy(s, (wh[...], wl[...], wsh[...], wsl[...]),
                            consts)
    z = _canon(s, consts)
    oh[0] = z.hi
    ol[0] = z.lo


def _call(kernel, tabs, x, batch, A, B, **kw):
    def fullspec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((1, A, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        functools.partial(kernel, **kw),
        out_shape=(jax.ShapeDtypeStruct((batch, A, B), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, A, B), jnp.uint32)),
        grid=(batch,),
        in_specs=[*[fullspec(t) for t in tabs], blk, blk],
        out_specs=(blk, blk),
    )(*tabs, x.hi.reshape(batch, A, B), x.lo.reshape(batch, A, B))
    from gpuntt_tpu.ops.limb import U64

    return U64(oh, ol)


def _device_ms(logdir):
    """Sum XLA-Op durations on the TPU pid from the newest trace."""
    path = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tot = 0
    for e in ev:
        if (e.get("ph") == "X" and e["pid"] in tpu_pids
                and tids.get((e["pid"], e["tid"])) == "XLA Modules"):
            tot += e.get("dur", 0)
    return tot / 1e3


def main():
    from gpuntt_tpu.ops.pallas_mxu import kernel_consts, ND
    from gpuntt_tpu.ops.pallas_mxu import pallas_mxu_u64
    from gpuntt_tpu.utils.profiling import trace

    print(f"device: {jax.devices()[0]}")
    plan, lanes = _build()
    batch, n = lanes.hi.shape
    A, B = plan.A, plan.B
    consts = kernel_consts(plan)
    k = 8

    full = jax.jit(lambda v, pl_: pallas_mxu_u64(v, pl_))
    dots_tabs = [plan.fwd_left, plan.fwd_left_corr,
                 plan.fwd_right, plan.fwd_right_corr]
    dots = jax.jit(lambda v: _call(_dots_kernel, dots_tabs, v, batch, A, B,
                                   nd=ND))
    comb = jax.jit(lambda v: _call(_combine_kernel, list(plan.w_fwd), v,
                                   batch, A, B, consts=consts, nd=ND))

    results = {}
    for name, fn, args in (("full", full, (lanes, plan)),
                           ("dots", dots, (lanes,)),
                           ("combine", comb, (lanes,))):
        o = fn(*args)
        np.asarray(o.hi[0, 0])  # warm compile
        logdir = f"/tmp/duty-trace-{name}"
        with trace(logdir):
            o = args[0]
            for _ in range(k):
                o = fn(o, *args[1:])
            np.asarray(o.hi[0, 0])
        ms = _device_ms(logdir) / k
        results[name] = ms
        print(f"{name:8s} {ms:7.3f} ms/batch (device timeline, k={k})")

    t_f, t_d, t_c = results["full"], results["dots"], results["combine"]
    macs = 64 * A * B * (A + B) * batch
    ideal = macs / (394.7e12 / 2) * 1e3
    print(f"additivity: dots+combine = {t_d + t_c:.3f} ms vs full "
          f"{t_f:.3f} ms ({(t_d + t_c) / t_f:.3f}x)")
    print(f"MXU: ideal {ideal:.3f} ms -> dots efficiency "
          f"{ideal / t_d:.2f}, duty cycle in full kernel {t_d / t_f:.3f}")


if __name__ == "__main__":
    main()
