"""Pallas TPU kernels for the hot solver stages (SURVEY.md section 7.2).

The per-example matrices are tiny (n_tau <= 16), so the MXU is useless;
throughput comes from the VPU with the BATCH on the lane axis: every scalar
entry of a small matrix is stored as an [8, 128] f32 tile (one full VPU
vreg) spanning 1024 examples, and the whole reverse-time recursion runs
inside one kernel with the cost-to-go state resident in VMEM -- no HBM
roundtrips between timesteps, which is what dominates the lax.scan version.
"""
from .riccati_fused import lqr_backward_pallas, pallas_supported

__all__ = ["lqr_backward_pallas", "pallas_supported"]
