"""Kernel-path selection logic (no TPU needed — backend is stubbed).

The dispatch table is the TPU analog of the reference's launch-plan
tables (ntt.cuh:606-797); these tests pin the routing decisions."""

import numpy as np
import pytest

from gpuntt_tpu import NTTParameters, ReductionPolynomial
from gpuntt_tpu.ops import dispatch
from gpuntt_tpu.ops.merge_ntt import MergePlan
from gpuntt_tpu.params.merge import NTTLayout


def _path(monkeypatch, logn, dtype, backend="tpu",
          layout=NTTLayout.PerPolynomial):
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: backend)
    p = NTTParameters(logn, ReductionPolynomial.X_N_plus, dtype=dtype)
    plan = MergePlan.from_params(p)
    return dispatch._kernel_path(plan, (4, p.n), layout)


def test_u64_routes(monkeypatch):
    assert _path(monkeypatch, 12, np.uint64) == "mxu"
    assert _path(monkeypatch, 17, np.uint64) == "mxu"
    assert _path(monkeypatch, 18, np.uint64) == "mxu-large"
    assert _path(monkeypatch, 23, np.uint64) == "mxu-large"
    assert _path(monkeypatch, 24, np.uint64) is None  # XLA engine


def test_u32_routes(monkeypatch):
    assert _path(monkeypatch, 12, np.uint32) == "vpu"
    assert _path(monkeypatch, 18, np.uint32) == "vpu"
    assert _path(monkeypatch, 19, np.uint32) == "mxu32-large"
    assert _path(monkeypatch, 23, np.uint32) == "mxu32-large"
    assert _path(monkeypatch, 24, np.uint32) is None


def test_cpu_and_layout_fall_back(monkeypatch):
    assert _path(monkeypatch, 14, np.uint64, backend="cpu") is None
    assert _path(monkeypatch, 14, np.uint64,
                 layout=NTTLayout.PerCoefficient) is None
