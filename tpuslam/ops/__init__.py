"""Pallas TPU kernels for the hot paths."""

from tpuslam.ops.ekf_pallas import ekf_fused_rollout
from tpuslam.ops.pf_pallas import (pf_fused_predict_weight, pf_fused_step,
                                   pf_fused_rollout)

__all__ = ["ekf_fused_rollout", "pf_fused_predict_weight",
           "pf_fused_step", "pf_fused_rollout"]
