"""Polynomial multiplication engines — the framework's flagship models.

The reference ships this pipeline only as example code
(test_cpu_merge_ntt.cu:69-101: NTT -> pointwise mult -> INTT ==
schoolbook); here it is a first-class, jittable model:

- `PolynomialMultiplier`: single-chip negacyclic/cyclic polynomial
  product over the merged NTT (any logn the merge pools support).
- `DistPolynomialMultiplier`: multi-chip product over the distributed
  4-step NTT — forward both operands (all_to_all over ICI), pointwise
  Barrett product in the spectrum layout, inverse back.  This is the
  "training step" analog the multi-chip dry-run compiles.
"""

from __future__ import annotations

import numpy as np
import jax

from ..params.merge import NTTParameters, ReductionPolynomial
from ..params.fourstep import NTTParameters4Step
from ..ops import barrett as bo
from ..ops.merge_ntt import MergePlan, from_lanes, to_lanes
from ..ops.fourstep import FourStepPlan
from ..parallel.fourstep_dist import (
    DistFourStepPlan,
    dist_fourstep_intt,
    dist_fourstep_ntt,
)


@jax.jit
def _polymul_jit(a, b, plan):
    from ..ops.dispatch import polymul_lanes

    return polymul_lanes(a, b, plan)


class PolynomialMultiplier:
    """c = a * b mod (q, X^N +/- 1) via merge NTT (single chip)."""

    def __init__(self, params: NTTParameters):
        self.params = params
        self.plan = MergePlan.from_params(params)
        self.bit = params.modulus.bit
        self.mu = params.modulus.mu

    def step_lanes(self, a, b):
        """Jittable lane-representation pipeline.

        Delegates to the dispatch-level fused polymul_lanes, so on TPU
        the MXU digit-matmul kernels carry the NTTs."""
        from ..ops.dispatch import polymul_lanes

        return polymul_lanes(a, b, self.plan)

    def __call__(self, a, b) -> np.ndarray:
        lanes_a = to_lanes(np.asarray(a), self.plan.is64)
        lanes_b = to_lanes(np.asarray(b), self.plan.is64)
        # plan rides as a jit ARGUMENT (MergePlan is a registered
        # pytree): tables stay runtime buffers, and the module-level
        # jit cache makes repeat calls hit the same executable
        out = _polymul_jit(lanes_a, lanes_b, self.plan)
        return from_lanes(out, self.plan.is64)


class RNSPolynomialMultiplier:
    """Residue-wise products over an RNS prime ladder — the HE
    evaluation workload the RNS engines exist for.

    Operands are (mod_count, N) residue stacks (row i modulo the i-th
    member's q_i) or (k, mod_count, N) batches of them; the cyclic
    modulus schedule of the RNS dispatch (ntt.cu RNS kernels,
    q_index = b % mod_count) matches that row order exactly, so the
    residue batches ride the single-kernel MXU RNS engines on TPU.
    `gpuntt_tpu.arith.host.crt_reconstruct` lifts results back to
    Z_{prod q_i} for host-side checks.
    """

    def __init__(self, members):
        from ..ops.rns import RNSMergePlan

        self.plan = RNSMergePlan.from_params(members)
        self.mod_count = self.plan.mod_count
        self.qs = self.plan.qs

    def __call__(self, a, b) -> np.ndarray:
        from ..ops.dispatch import rns_polymul

        a = np.asarray(a)
        b = np.asarray(b)
        if a.ndim < 2 or a.shape != b.shape or a.shape[-2] != self.mod_count:
            raise ValueError(
                f"operands must be (..., {self.mod_count}, N) residue "
                f"stacks, got {a.shape} and {b.shape}")
        n = a.shape[-1]
        out = rns_polymul(a.reshape(-1, n), b.reshape(-1, n), self.plan)
        return out.reshape(a.shape)


class DistPolynomialMultiplier:
    """c = a * b mod (q, X^N - 1) via distributed 4-step NTT.

    Operands live as (B, n1, n2) blocks sharded P('dp', None, 'sp');
    the product comes back in the same layout.  All cross-chip traffic
    is the two all_to_alls inside each transform.
    """

    def __init__(self, params: NTTParameters4Step, mesh,
                 pipeline_chunks: int = 1):
        if params.poly_reduction != ReductionPolynomial.X_N_minus:
            raise ValueError("4-step polymul diagonalises cyclic convolution "
                             "(X_N_minus) only")
        self.params = params
        self.dplan = DistFourStepPlan.from_params(params)
        self.mesh = mesh
        self.bit = params.modulus.bit
        self.mu = params.modulus.mu
        self.pipeline_chunks = pipeline_chunks

    def step_lanes(self, a, b):
        """Jittable full step: 2 forwards + pointwise + inverse."""
        from ..ops.dispatch import pointwise_mult_lanes

        d = self.dplan
        pc = self.pipeline_chunks
        fa = dist_fourstep_ntt(a, d, self.mesh, pipeline_chunks=pc)
        fb = dist_fourstep_ntt(b, d, self.mesh, pipeline_chunks=pc)
        fc = pointwise_mult_lanes(fa, fb, d.base)
        return dist_fourstep_intt(fc, d, self.mesh, pipeline_chunks=pc)


class DistRNSPolynomialMultiplier:
    """Residue-ladder products over a device mesh — the distributed
    rendition of RNSPolynomialMultiplier (no reference counterpart
    twice over: single-GPU reference, transforms-only RNS surface).

    Operands are (B, n1, n2) lane blocks sharded P('dp', None, 'sp')
    whose batch rows cycle through the prime ladder (row b modulo
    q_{b % mod_count}); all cross-chip traffic is the two all_to_alls
    inside each transform, and the per-row Barrett spectrum product is
    local to every shard.
    """

    def __init__(self, members, mesh):
        from ..parallel.fourstep_rns_dist import DistRNSFourStepPlan

        for p in members:
            if p.poly_reduction != ReductionPolynomial.X_N_minus:
                raise ValueError(
                    "4-step polymul diagonalises cyclic convolution "
                    "(X_N_minus) only")
        self.dplan = DistRNSFourStepPlan.from_members(members)
        self.mesh = mesh
        self.mod_count = self.dplan.base.mod_count

    def step_lanes(self, a, b, mod_idx):
        from ..ops.dispatch import rns_pointwise_mult_lanes
        from ..parallel.fourstep_rns_dist import (dist_rns_fourstep_intt,
                                                  dist_rns_fourstep_ntt)

        d = self.dplan
        fa = dist_rns_fourstep_ntt(a, d, self.mesh, mod_idx)
        fb = dist_rns_fourstep_ntt(b, d, self.mesh, mod_idx)
        fc = rns_pointwise_mult_lanes(fa, fb, d.base, mod_idx)
        return dist_rns_fourstep_intt(fc, d, self.mesh, mod_idx)
