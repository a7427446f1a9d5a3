"""Contract tests for the marginal-timing utilities (CPU).

These guard the measurement machinery every RESULTS table rests on:
slopes are positive, noise bounds are reported, and the escalation
loops terminate at their caps instead of spinning when a cell cannot
converge (relay jitter >> signal).  Methodology mirror of the
reference's nvbench stream-scoped exec (bench_merge_ntt.cu:45-47).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpuntt_tpu.utils.timing import (fetch_one, time_chain, time_marginal,
                                     time_marginal_eager, time_marginal_scan,
                                     time_marginal_spread)


def _step(v):
    return (v * 3 + 1) % jnp.uint32(2**31 - 1)


def _step_extra(v, inc):
    return (v * 3 + inc) % jnp.uint32(2**31 - 1)


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(np.arange(256, dtype=np.uint32))


def test_fetch_one_returns_scalar(x):
    assert fetch_one({"a": x}) == 0


def test_time_chain_positive(x):
    assert time_chain(_step, x, k=2, iters=2, repeats=2) > 0


def test_time_marginal_positive(x):
    assert time_marginal(_step, x, iters=2) > 0


def test_time_marginal_scan_contract(x):
    med, noise = time_marginal_scan(_step, x, k_lo=4, k_hi=16, iters=2,
                                    repeats=3, target_noise=0.5,
                                    k_hi_max=64)
    assert med > 0 and noise >= 0


def test_time_marginal_scan_escalation_terminates(x):
    # an unreachable noise target must stop at k_hi_max, not loop
    med, noise = time_marginal_scan(_step, x, k_lo=2, k_hi=4, iters=1,
                                    repeats=2, target_noise=0.0,
                                    k_hi_max=16)
    assert med > 0 and noise >= 0


def test_time_marginal_spread_extra_and_escalation(x):
    inc = jnp.uint32(1)
    med, noise = time_marginal_spread(_step_extra, x, repeats=2,
                                      extra=(inc,), target_noise=0.0,
                                      iters_max=8)
    assert med > 0 and noise >= 0


def test_time_marginal_spread_fixed_iters(x):
    med, noise = time_marginal_spread(_step, x, iters=2, repeats=2)
    assert med > 0 and noise >= 0


def test_time_marginal_eager_escalation_terminates(x):
    import jax

    stepj = jax.jit(_step)
    med, noise = time_marginal_eager(stepj, x, iters=1, repeats=2,
                                     target_noise=0.0, iters_max=4)
    assert med > 0 and noise >= 0


def test_slope_stats_nonpositive_median_reports_unconverged():
    from gpuntt_tpu.utils.timing import _slope_stats

    med, noise = _slope_stats([-1e-3, -1e-4, 2e-3])
    assert med == 1e-9 and noise == 99.0
    med, noise = _slope_stats([1e-3, 2e-3, 3e-3])
    assert med == 2e-3 and noise == 1.0
