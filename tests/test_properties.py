"""Property-based invariants across the stack."""

import math

import pytest

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
    @pytest.mark.slow
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


class TestResampleInvariants:
    """Systematic-resample structural properties (any weights)."""

    @pytest.mark.parametrize("seed,scale", [(0, 0.1), (1, 3.0), (2, 8.0)])
    def test_merge_output_counts_equal_slot_intervals(self, seed, scale):
        """Each particle appears in the merge-kernel output exactly
        t_j - t_{j-1} times (its slot-interval length), and the output
        is a permutation-free expansion totaling n."""
        from tpuslam.ops import merge_resample_rows
        from tpuslam.ops.resample_pallas import slot_boundaries

        rng = np.random.default_rng(seed)
        n = n_pad = 512
        lw = rng.normal(size=n) * scale
        w = np.exp(lw - lw.max())
        w /= w.sum()
        w_row = jnp.asarray(w, jnp.float32)[None, :]
        # Distinct particle values so counts are identifiable.
        p = jnp.asarray(
            np.stack([np.arange(n), np.arange(n) * 2.0,
                      np.zeros(n)]), jnp.float32)
        key = jax.random.key(seed)
        out = np.asarray(merge_resample_rows(
            key, p, w_row, n, t_in=128, t_k=128, t_out=128, w_b=6,
            interpret=True))
        offs = float(jax.random.uniform(key, dtype=jnp.float32))
        t = np.asarray(slot_boundaries(w_row, n, jnp.float32(offs)))[0]
        tprev = np.r_[0, t[:-1]]
        counts = np.bincount(out[0].astype(np.int64), minlength=n)
        np.testing.assert_array_equal(counts, t - tprev)
        assert counts.sum() == n

    @pytest.mark.parametrize("seed,scale", [(5, 4.0), (6, 9.0)])
    def test_batch_kernel_degenerate_weights_no_double_cover(self, seed,
                                                             scale):
        """Continuous degenerate log-weights (the regime that fires the
        gate): every output slot must be covered by EXACTLY one
        particle.  Guards the quantized-exact cumsum - an unquantized
        f32 split-matmul cumsum can invert an interval and silently SUM
        two particles into one slot."""
        from tpuslam.filters.pf import PfConfig
        from tpuslam.ops import pf_batch_init, pf_batch_step

        n, b = 256, 2
        cfg = PfConfig(num_particles=n, weight_mode="log",
                       ess_threshold_frac=2.0,  # always fire
                       q_std=(0.0, 0.0, 0.0))
        rng = np.random.default_rng(seed)
        lw = rng.normal(size=n) * scale
        st = pf_batch_init(cfg, b)
        P = st.particles.shape[1] // b
        p_rows = np.zeros((3, b * P), np.float32)
        lw_rows = np.full((1, b * P), -np.inf, np.float32)
        for f in range(b):
            p_rows[0, f * P:f * P + n] = np.arange(n)  # marker = index
            lw_rows[0, f * P:f * P + n] = lw
        from tpuslam.ops.pf_batch_pallas import pf_batch_refresh_stats
        st = pf_batch_refresh_stats(cfg, st._replace(
            particles=jnp.asarray(p_rows), log_w=jnp.asarray(lw_rows)))
        st2, out = pf_batch_step(cfg, st, jax.random.key(seed), 0,
                                 noise_on=False, interpret=True)
        assert bool(out.resampled.all())

        # Exact quantized-integer oracle (mirrors the kernel: integer
        # cumsum, f32 division/scale/ceil, offs = 0.5 noise-free).
        m = lw.max()
        w = np.exp((lw - m) - np.log(np.exp(lw - m).sum()))
        wq = np.round(np.float32(w * np.float32(1 << 20))).astype(
            np.int64)
        cum = np.cumsum(wq)
        q = cum[-1]
        t = np.clip(np.ceil(np.float32(n) * (
            cum.astype(np.float32) / np.float32(q))
            - np.float32(0.5)), 0, n).astype(np.int64)
        t[-1] = n
        tprev = np.r_[0, t[:-1]]
        expect = t - tprev
        for f in range(b):
            got = np.asarray(st2.particles[0, f * P:f * P + n])
            delta = got - np.round(got)
            marker = np.round(got - np.median(delta)).astype(int)
            # no double-covered slot: all markers are valid indices and
            # counts match the oracle intervals exactly
            assert ((marker >= 0) & (marker < n)).all()
            counts = np.bincount(marker, minlength=n)[:n]
            np.testing.assert_array_equal(counts, expect)
            assert counts.sum() == n

    def test_batch_kernel_resample_counts(self):
        """In-tile batched resample: with exact-binary weights the
        output counts equal the slot intervals per filter."""
        from tpuslam.filters.pf import PfConfig
        from tpuslam.ops import pf_batch_init, pf_batch_step

        n, b = 128, 2
        cfg = PfConfig(num_particles=n, weight_mode="log",
                       ess_threshold_frac=2.0,  # always fire
                       q_std=(0.0, 0.0, 0.0))   # keep markers intact
        heavy = {3: 1 / 4, 60: 1 / 4, 100: 1 / 2}
        lw = np.full(n, -np.inf)
        for h, wv in heavy.items():
            lw[h] = np.log(wv)
        st = pf_batch_init(cfg, b)
        P = st.particles.shape[1] // b
        p_rows = np.zeros((3, b * P), np.float32)
        lw_rows = np.full((1, b * P), -np.inf, np.float32)
        for f in range(b):
            p_rows[0, f * P:f * P + n] = np.arange(n)  # marker = index
            lw_rows[0, f * P:f * P + n] = lw
        from tpuslam.ops.pf_batch_pallas import pf_batch_refresh_stats
        st = pf_batch_refresh_stats(cfg, st._replace(
            particles=jnp.asarray(p_rows), log_w=jnp.asarray(lw_rows)))
        st2, out = pf_batch_step(cfg, st, jax.random.key(1), 0,
                                 noise_on=False, interpret=True)
        assert bool(out.resampled.all())
        # offs = 0.5 in noise-free mode; weights are exact binary
        # fractions -> deterministic slot counts.
        w = np.zeros(n)
        for h, wv in heavy.items():
            w[h] = wv
        t = np.clip(np.ceil(n * np.cumsum(w) - 0.5), 0, n)
        t[-1] = n
        tprev = np.r_[0, t[:-1]]
        expect = (t - tprev).astype(int)
        for f in range(b):
            # x moved by the deterministic circular step: undo via
            # rounding to the nearest marker (v*dt*cos(yaw) shift is
            # identical for all particles - yaw isn't a marker here).
            got = np.asarray(st2.particles[0, f * P:f * P + n])
            shift = got.min() - 0.0  # particle 0 never survives; use mod
            # recover marker by subtracting the common motion delta
            delta = got - np.round(got)
            # all deltas identical (same yaw=pi/2 step for all)
            marker = np.round(got - np.median(delta)).astype(int)
            counts = np.bincount(marker, minlength=n)[:n]
            np.testing.assert_array_equal(counts, expect)
