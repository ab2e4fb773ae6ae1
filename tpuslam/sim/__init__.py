"""Scene configurations and lax.scan simulation drivers.

Scene configs live with their consumers (EkfConfig / PfConfig /
SlamSceneConfig hold the reference demo constants, SURVEY.md section 5
"config system"); this package re-exports them alongside the generic
drivers so scenario code has a single import point.
"""

from tpuslam.filters.ekf import EkfConfig
from tpuslam.filters.pf import PfConfig
from tpuslam.sim.driver import rollout, rollout_batch
from tpuslam.slam.frontend import SlamSceneConfig

__all__ = ["EkfConfig", "PfConfig", "SlamSceneConfig", "rollout",
           "rollout_batch"]
