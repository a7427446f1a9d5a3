"""Measurement utilities shared by bench.py and benchmarks/sweep.py.

The reference times GPU kernels with nvbench's stream-scoped exec
(bench_merge_ntt.cu:45-47), excluding launch overhead.  The TPU analog
is *marginal in-jit application time*: a jitted chain of k applications
is timed at two depths and the slope reported, which cancels dispatch
and transfer costs (on relayed devices those can exceed kernel time,
and block_until_ready has been observed under-synchronising).
"""

from __future__ import annotations

import time

import numpy as np


def fetch_one(out):
    """Force a tiny device->host read — a real completion barrier."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def _slope_stats(slopes):
    """Median + spread of per-repeat slopes.  A non-positive median
    means the signal has not emerged from the dispatch jitter at this
    averaging depth (k_hi chains timed FASTER than k_lo): report
    non-converged (9900% noise) so escalating callers deepen the
    measurement instead of returning a clean-looking clamped garbage
    cell (r3: u32 logn-19 inverse read 1e-9 ms at "0%" noise from
    all-clamped slopes)."""
    slopes = sorted(slopes)
    med = slopes[len(slopes) // 2]
    if med <= 0:
        return 1e-9, 99.0
    return med, (slopes[-1] - slopes[0]) / med


def time_chain(fn, x, k, iters=6, repeats=3, extra=()):
    """Best-of-repeats wall time of one jitted call applying fn k times.

    `extra` pytrees (e.g. a registered-pytree engine plan) thread
    through the jit boundary as ARGUMENTS — fn is called fn(v, *extra)
    — so large twiddle tables enter the chain as runtime buffers
    instead of closure constants (which inline into HLO, constant-fold
    per chain link, and trip the relay's compile-payload cap)."""
    import jax

    def g(v, *ex):
        for _ in range(k):
            v = fn(v, *ex)
        return v

    gj = jax.jit(g)
    o = gj(x, *extra)
    fetch_one(o)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = x
        for _ in range(iters):
            o = gj(o, *extra)
        fetch_one(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def time_marginal(fn, x, k_lo=1, k_hi=4, iters=6, extra=()):
    """Marginal per-application time: slope between k_lo and k_hi chains."""
    t_lo = time_chain(fn, x, k_lo, iters, extra=extra)
    t_hi = time_chain(fn, x, k_hi, iters, extra=extra)
    return max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)


def time_marginal_scan(fn, x, k_lo=32, k_hi=160, iters=4, repeats=4,
                       extra=(), target_noise=0.25, k_hi_max=10240):
    """Marginal per-application time via lax.scan chains, plus a noise
    bound — for sub-0.1 ms kernels (the reference's batch-1 nvbench
    scope) where the k=1/k=4 slope drowns in relay dispatch jitter.

    A scan of depth k compiles ONE loop body regardless of k (unlike
    the unrolled time_chain, whose compile cost made deep chains
    unusable at logn >= 19), so the measured window (k_hi - k_lo) * t
    can be pushed far above the ~1-5 ms dispatch variance.  When the
    spread still exceeds `target_noise` (microsecond kernels at
    logn 12-14 need the measured window pushed to tens of ms against
    the relay's ~1-5 ms dispatch/fetch jitter, VERDICT r2), the chain
    depth escalates 4x — compile cost is flat in k, runtime stays
    < ~500 ms/chain — until the bound is met or `k_hi_max` is reached.
    Returns
    (t_per_application, noise_frac) where noise_frac is the
    max-minus-min spread of the per-repeat slopes over their median.
    """
    import jax
    from jax import lax

    def chain(k):
        return jax.jit(lambda v, *ex: lax.scan(
            lambda c, _: (fn(c, *ex), None), v, None, length=k)[0])

    def once(cj):
        t0 = time.perf_counter()
        o = x
        for _ in range(iters):
            o = cj(o, *extra)
        fetch_one(o)
        return (time.perf_counter() - t0) / iters

    def measure(k_lo, k_hi):
        c_lo, c_hi = chain(k_lo), chain(k_hi)
        fetch_one(c_lo(x, *extra))
        fetch_one(c_hi(x, *extra))
        slopes = []
        for _ in range(repeats):
            slopes.append((once(c_hi) - once(c_lo)) / (k_hi - k_lo))
        return _slope_stats(slopes)

    med, noise = measure(k_lo, k_hi)
    while noise > target_noise and k_hi * 4 <= k_hi_max:
        k_lo, k_hi = k_lo * 4, k_hi * 4
        med, noise = measure(k_lo, k_hi)
    return med, noise


def time_marginal_spread(fn, x, k_lo=1, k_hi=4, iters=None, repeats=4,
                         extra=(), target_noise=0.25, iters_max=2048):
    """time_marginal with a noise bound: the k_lo/k_hi slope is taken
    per repeat (unrolled chains — for composed multi-kernel programs
    that crash the relay compile helper under lax.scan, CLAUDE.md) and
    the median + max-minus-min/median spread returned, matching
    time_marginal_scan's contract.

    iters=None auto-scales the per-measurement averaging depth from a
    quick probe so that each timed window covers >= ~25 ms of chained
    work, then — like time_marginal_scan — ESCALATES the depth 4x while
    the measured spread exceeds `target_noise`.  The window heuristic
    alone is not enough: the relay's per-call dispatch jitter
    (~1.5-5 ms, variance comparable to its mean) enters every one of
    the `iters` calls, so for sub-ms kernels the slope needs the
    jitter averaged down by hundreds of calls, not just a >= 25 ms
    window (r3 batch-1: logn 19-20 cells read 1e-9..0.026 ms at
    1200-2e7% noise under the window heuristic; the k=1/4 chain depth
    itself cannot grow — k=8 unrolled chains of the composed col+row
    program crash the relay compile helper)."""
    import jax

    def chain(k):
        def g(v, *ex):
            for _ in range(k):
                v = fn(v, *ex)
            return v

        return jax.jit(g)

    c_lo, c_hi = chain(k_lo), chain(k_hi)
    fetch_one(c_lo(x, *extra))
    fetch_one(c_hi(x, *extra))

    auto = iters is None
    if auto:
        t0 = time.perf_counter()
        fetch_one(c_hi(x, *extra))
        probe = max(time.perf_counter() - t0, 1e-6)
        iters = min(64, max(6, int(0.025 / probe) + 1))

    def once(cj, it):
        t0 = time.perf_counter()
        o = x
        for _ in range(it):
            o = cj(o, *extra)
        fetch_one(o)
        return (time.perf_counter() - t0) / it

    def measure(it):
        slopes = []
        for _ in range(repeats):
            slopes.append((once(c_hi, it) - once(c_lo, it)) / (k_hi - k_lo))
        return _slope_stats(slopes)

    med, noise = measure(iters)
    while auto and noise > target_noise and iters * 4 <= iters_max:
        iters *= 4
        med, noise = measure(iters)
    return med, noise


def time_marginal_eager(fn, x, k_lo=1, k_hi=4, iters=3, repeats=3,
                        target_noise=0.25, iters_max=48):
    """Marginal per-application time for an EAGER chainable fn(x)->x —
    multi-dispatch eager routes (e.g. the staged_* utility executors,
    or any path whose phases are separate cached jitted programs and so
    cannot ride inside one jitted chain; since r4 the production big-N
    route is ONE composed jitted program — use time_marginal/-_scan for
    it).  Applications are chained eagerly (device arrays
    stay resident; JAX's async dispatch keeps the device queue full, so
    per-call dispatch overlaps execution) and the k_lo/k_hi slope
    cancels the constant setup + sync cost.  Each application is 2+
    relay dispatches whose jitter is comparable to its mean, so — like
    the other marginal utilities — the averaging depth ESCALATES 4x
    until the spread meets `target_noise` (r3: the fourstep24 cell read
    44-139% noise at fixed iters=3).  Returns (t_per_application,
    noise_frac) like time_marginal_scan."""

    def chain_time(k, it):
        t0 = time.perf_counter()
        for _ in range(it):
            o = x
            for _ in range(k):
                o = fn(o)
            fetch_one(o)
        return (time.perf_counter() - t0) / it

    def measure(it):
        slopes = []
        for _ in range(repeats):
            slopes.append((chain_time(k_hi, it) - chain_time(k_lo, it))
                          / (k_hi - k_lo))
        return _slope_stats(slopes)

    # warm the phase-jit caches (first call compiles)
    fetch_one(fn(x))
    med, noise = measure(iters)
    while noise > target_noise and iters * 4 <= iters_max:
        iters *= 4
        med, noise = measure(iters)
    return med, noise


def time_wall(fn, iters=3, repeats=3):
    """Best-of-repeats wall time per call of an EAGER callable.

    For multi-dispatch eager paths (e.g. the staged_* utility
    executors), which cannot ride inside one jitted chain: includes the
    per-phase dispatch overhead (~1.5-5 ms on the relay), which is real
    cost for these paths and small next to their kernel times."""
    o = fn()
    fetch_one(o)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn()
        fetch_one(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
