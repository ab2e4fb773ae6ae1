"""Pallas TPU kernels for the hot paths."""

from tpuslam.ops.ekf_pallas import ekf_fused_rollout

__all__ = ["ekf_fused_rollout"]
