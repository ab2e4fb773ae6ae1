"""Property-based invariants across the stack."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import robot_to_world, world_to_robot, wrap_angle
from tpuslam.filters import EkfConfig, ekf_rollout
from tpuslam.models.scan_sensor import ScanConfig
from tpuslam.slam import (GraphConfig, SlamSceneConfig, simulate,
                          upper_pairs)
from tpuslam.slam.graph import assemble, build_edges, kept_times


class TestSe2Properties:
    def test_transform_preserves_distances(self, rng):
        """SE(2) transforms are isometries."""
        for _ in range(5):
            pose = jnp.asarray(rng.normal(size=3))
            pts = jnp.asarray(rng.normal(size=(6, 2)) * 5)
            loc = np.asarray(world_to_robot(pose, pts))
            d_w = np.linalg.norm(np.asarray(pts)[None] -
                                 np.asarray(pts)[:, None], axis=-1)
            d_l = np.linalg.norm(loc[None] - loc[:, None], axis=-1)
            np.testing.assert_allclose(d_w, d_l, atol=1e-4)

    def test_wrap_idempotent(self, rng):
        a = jnp.asarray(rng.uniform(-50, 50, size=200))
        w1 = wrap_angle(a)
        w2 = wrap_angle(w1)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   atol=1e-5)
        assert float(jnp.max(jnp.abs(w1))) <= np.pi + 1e-5

    def test_round_trip_many_poses(self, rng):
        poses = jnp.asarray(rng.normal(size=(20, 3)) * 3)
        pts = jnp.asarray(rng.normal(size=(7, 2)) * 10)
        back = robot_to_world(poses, world_to_robot(poses, pts))
        want = jnp.broadcast_to(pts, (20, 7, 2))
        np.testing.assert_allclose(np.asarray(back), np.asarray(want),
                                   atol=1e-4)


class TestEkfInvariants:
    def test_covariance_symmetric_psd(self):
        """P stays symmetric and PSD over a long rollout."""
        _, outs = ekf_rollout(EkfConfig(), jax.random.key(0), 200)
        cov = np.asarray(outs.cov, np.float64)
        asym = np.abs(cov - np.transpose(cov, (0, 2, 1))).max()
        assert asym < 1e-5
        eigs = np.linalg.eigvalsh((cov + np.transpose(cov, (0, 2, 1))) / 2)
        assert eigs.min() > -1e-6


class TestGraphInvariants:
    def test_information_matrix_symmetric(self):
        cfg = GraphConfig(
            max_times=8, num_landmarks=9,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        traj = simulate(SlamSceneConfig(), cfg, jax.random.key(0), 7)
        pi, pj = upper_pairs(8)
        edges = build_edges(cfg, traj.poses_odom, traj.obs,
                            jnp.asarray(7), pi, pj)
        kept = kept_times(traj.obs, 7)
        h, b = assemble(cfg, edges, kept, pi, pj, 8)
        h = np.asarray(h, np.float64)
        # The premultiplied blocks make H symmetric by construction
        # (H_ab = H_ba^T for each edge).
        np.testing.assert_allclose(h, h.T, rtol=1e-4, atol=1e-3)
