"""Pallas TPU kernels for the hot solver stages (SURVEY.md section 7.2).

The per-example matrices are tiny (n_tau <= 16), so the MXU is useless;
throughput comes from the VPU with the BATCH on the lane axis: every scalar
entry of a small matrix is stored as an [8, 128] f32 tile (one full VPU
vreg) spanning 1024 examples (layout helpers in layout.py).

Three kernel families, coarsest (and fastest) first:

 * ilqr_fused.py   -- the WHOLE iLQR solve as one kernel per batch tile
                      (rollout, in-kernel Jacobians, Riccati, box-QP, line
                      search, best tracking); the default on TPU whenever
                      `fused_supported` holds.
 * riccati_fused.py -- the backward Riccati recursion alone (used by the
                      KKT/IFT backward's auxiliary solves, including the
                      u_zero_I frozen-active-set mode).

(A third family -- multi-launch time-blocked streaming kernels,
ops/pallas/lqr_stream.py in the git history -- was removed in round 3:
its motivating case, horizons past the VMEM budget, is served by the
megakernel's stream-K HBM staging, and it measured 2x SLOWER than the
XLA scan on this runtime's ~1 ms-per-launch floor.)
"""
from .ilqr_fused import fused_supported, ilqr_fused, lane_compatible
from .riccati_fused import lqr_backward_pallas, pallas_supported

__all__ = [
    "fused_supported",
    "ilqr_fused",
    "lane_compatible",
    "lqr_backward_pallas",
    "pallas_supported",
]
