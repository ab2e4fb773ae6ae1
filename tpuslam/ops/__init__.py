"""Pallas TPU kernels for the hot paths."""

from tpuslam.ops.ekf_pallas import ekf_fused_rollout, ekf_fused_sweeps
from tpuslam.ops.pf_pallas import (PfFusedState, pf_fused_init,
                                   pf_fused_predict_weight,
                                   pf_fused_predict_weight_stats,
                                   pf_fused_rollout, pf_fused_step,
                                   pf_fused_step_stats, pf_fused_to_state)
from tpuslam.ops.pf_batch_pallas import (PfBatchOut, PfBatchState,
                                         PfBatchWideState, pf_batch_init,
                                         pf_batch_refresh_stats,
                                         pf_batch_rollout, pf_batch_step,
                                         pf_batch_wide_init,
                                         pf_batch_wide_rollout,
                                         pf_batch_wide_step)
from tpuslam.ops.resample_pallas import merge_resample_rows

__all__ = ["ekf_fused_rollout", "ekf_fused_sweeps",
           "pf_fused_predict_weight",
           "pf_fused_predict_weight_stats", "PfFusedState",
           "pf_fused_init", "pf_fused_to_state", "pf_fused_step",
           "pf_fused_step_stats", "pf_fused_rollout",
           "merge_resample_rows", "PfBatchState", "PfBatchOut",
           "pf_batch_init", "pf_batch_refresh_stats", "pf_batch_step", "pf_batch_rollout",
           "PfBatchWideState", "pf_batch_wide_init",
           "pf_batch_wide_step", "pf_batch_wide_rollout"]
