"""Profiling and roofline analysis.

The reference's only observability is nvbench's built-in counters
(L1/L2 hit rates, declared global-memory traffic —
bench_merge_ntt.cu:34-40).  The TPU equivalents here:

- `trace(...)`: a context manager around jax.profiler emitting an
  xplane trace viewable in TensorBoard / Perfetto;
- `measure_vpu_modmul_peak(...)`: the measured speed-of-light for
  butterfly-based transforms (lane modmuls/sec) — bench.py divides
  achieved modmul throughput by this for the roofline fraction;
- `ntt_cost(...)`: the declared-work model (butterflies, HBM bytes),
  mirroring the reference's declared global-memory sizes.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass

import numpy as np

from .timing import time_marginal  # noqa: F401  (public re-export)


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block: `with trace('/tmp/ntt-trace'): run()`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass(frozen=True)
class NTTCost:
    """Declared work for one batched transform (reference analog:
    bench_merge_ntt.cu:34-38 declares (N + N/2)*batch reads etc.)."""

    butterflies: int
    modmuls: int
    hbm_read_bytes: int
    hbm_write_bytes: int


def ntt_cost(logn: int, batch: int, is64: bool) -> NTTCost:
    n = 1 << logn
    butterflies = (n // 2) * logn * batch
    itemsize = 8 if is64 else 4
    return NTTCost(
        butterflies=butterflies,
        modmuls=butterflies,  # one twiddle modmul per butterfly
        hbm_read_bytes=(n + n // 2) * batch * itemsize,
        hbm_write_bytes=n * batch * itemsize,
    )


def measure_vpu_modmul_peak(q: int, is64: bool = True, depth: int | None = None,
                            elems=None) -> float:
    """Measured peak Shoup-modmul rate on the vector lanes (ops/sec).

    The u32 modmul is ~6 lane-ops, so at the u64 probe's footprint one
    application is ~0.1 ms and the measured "peak" swung 3.6x between
    r4 bench runs; the 32-bit probe gets a 16x bigger window (depth 64
    over 4x the elements) so each chained application spans several ms
    of real VPU work."""
    import jax.numpy as jnp

    from ..ops import barrett as bo
    from ..ops.limb import U64

    if depth is None:
        depth = 16 if is64 else 64
    if elems is None:
        elems = (64, 65536) if is64 else (256, 65536)
    rng = np.random.default_rng(0)
    w = int(rng.integers(1, q))
    xp = rng.integers(0, q, size=elems, dtype=np.uint64)
    if is64:
        qc = bo.u64_const(q)
        wc = bo.u64_const(w)
        wsc = bo.u64_const((w << 64) // q)
        x = U64(
            jnp.asarray((xp >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((xp & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        )

        def k(v):
            for _ in range(depth):
                v = bo.shoup_mul64(v, wc, wsc, qc)
            return v
    else:
        ws = np.uint32((w << 32) // q)
        x = jnp.asarray(xp.astype(np.uint32))

        def k(v):
            for _ in range(depth):
                v = bo.shoup_mul32(v, jnp.uint32(w), jnp.uint32(ws), q)
            return v

    # escalating spread, not the bare k=1/4 marginal: the u32 probe
    # kernel is ~6 lane-ops deep and its plain marginal swung 2x
    # between r4 bench runs (2.24e11 vs 1.12e11) — the relay dispatch
    # jitter needs averaging down before a "peak" is trustworthy
    from .timing import time_marginal_spread

    dt, _noise = time_marginal_spread(k, x)
    return depth * int(np.prod(elems)) / dt
