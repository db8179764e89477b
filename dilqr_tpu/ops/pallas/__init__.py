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
 * lqr_stream.py   -- EXPERIMENTAL time-blocked variants for horizons past
                      the megakernel's VMEM budget (backend="stream").
"""
from .ilqr_fused import fused_supported, ilqr_fused, lane_compatible
from .lqr_stream import ilqr_stream, stream_supported
from .riccati_fused import lqr_backward_pallas, pallas_supported

__all__ = [
    "fused_supported",
    "ilqr_fused",
    "ilqr_stream",
    "lane_compatible",
    "lqr_backward_pallas",
    "pallas_supported",
    "stream_supported",
]
