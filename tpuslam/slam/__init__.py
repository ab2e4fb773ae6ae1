"""Graph-based SLAM: batched edge construction, information-matrix
assembly, Gauss-Newton solving, and the simulation frontend."""

from tpuslam.slam.frontend import (REF_SLAM_LANDMARKS, SlamSceneConfig,
                                   SlamTrajectory, simulate, slam_rollout,
                                   solve_once)
from tpuslam.slam.graph import (GraphConfig, GraphObservations,
                                GraphSolveResult, assemble, build_edges,
                                gn_iteration, graph_solve, kept_times,
                                preconditioned_solve, upper_pairs)

__all__ = [
    "REF_SLAM_LANDMARKS", "SlamSceneConfig", "SlamTrajectory", "simulate",
    "slam_rollout", "solve_once", "GraphConfig", "GraphObservations",
    "GraphSolveResult", "assemble", "build_edges", "gn_iteration",
    "graph_solve", "kept_times", "preconditioned_solve", "upper_pairs",
]
