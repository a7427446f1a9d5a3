"""Measurement, profiling, and roofline utilities."""

from .timing import fetch_one, time_chain, time_marginal
from .profiling import NTTCost, measure_vpu_modmul_peak, ntt_cost, trace

__all__ = [
    "fetch_one",
    "time_chain",
    "time_marginal",
    "NTTCost",
    "measure_vpu_modmul_peak",
    "ntt_cost",
    "trace",
]
