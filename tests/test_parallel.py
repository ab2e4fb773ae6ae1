"""Multi-device tests on the virtual 8-device CPU mesh
(SURVEY.md section 4, item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuslam.filters import EkfConfig, PfConfig, ekf_rollout_batch, pf_init
from tpuslam.parallel import (make_mesh, sharded_ekf_sweep, sharded_pf_step)


pytestmark = pytest.mark.slow  # interpret-mode Pallas / multi-device suites: run in the full tier only


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


class TestShardedEkfSweep:
    def test_matches_unsharded(self):
        cfg = EkfConfig()
        mesh = make_mesh()
        keys = jax.random.split(jax.random.key(0), 32)
        x_true, x_pre, rmse = jax.jit(
            lambda k: sharded_ekf_sweep(cfg, mesh, k, 20))(keys)
        assert x_true.shape == (32, 20, 3)
        # Unsharded reference: identical math, per-key determinism.
        _, outs = ekf_rollout_batch(cfg, keys, 20)
        np.testing.assert_allclose(np.asarray(x_true),
                                   np.asarray(outs.x_true), atol=1e-5)
        err = np.asarray(outs.x_pre[..., :2] - outs.x_true[..., :2])
        want_rmse = np.sqrt((err ** 2).sum(-1).mean())
        assert np.isclose(float(rmse), want_rmse, rtol=1e-4)

    def test_sharding_layout(self):
        cfg = EkfConfig()
        mesh = make_mesh()
        keys = jax.random.split(jax.random.key(1), 16)
        x_true, _, _ = jax.jit(
            lambda k: sharded_ekf_sweep(cfg, mesh, k, 5))(keys)
        # The output must actually be sharded over the rollout axis.
        shard_shapes = {s.data.shape for s in x_true.addressable_shards}
        assert shard_shapes == {(2, 5, 3)}


class TestShardedPf:
    def test_step_runs_and_normalizes(self):
        cfg = PfConfig(num_particles=800, weight_mode="log")
        mesh = make_mesh(n_rollout=1, n_particle=8)
        state = pf_init(cfg)
        state2, x_est = jax.jit(
            lambda s, k: sharded_pf_step(cfg, mesh, s, k))(
                state, jax.random.key(0))
        assert state2.particles.shape == (800, 3)
        assert x_est.shape == (3,)
        w = np.asarray(state2.weights)
        assert np.isclose(w.sum(), 1.0, atol=1e-4)
        assert np.isfinite(np.asarray(state2.particles)).all()

    def test_tracks_over_steps(self):
        cfg = PfConfig(num_particles=800, weight_mode="log")
        mesh = make_mesh(n_rollout=1, n_particle=8)
        state = pf_init(cfg)
        step = jax.jit(lambda s, k: sharded_pf_step(cfg, mesh, s, k))
        errs = []
        for i in range(30):
            state, x_est = step(state, jax.random.key(i))
            errs.append(np.linalg.norm(
                np.asarray(x_est[:2] - state.x_true[:2])))
        # After burn-in the sharded PF tracks the truth.
        assert np.mean(errs[10:]) < 1.0


class TestShardedFusedPf:
    """Particle-sharded fused-kernel PF (interpret-mode kernel)."""

    def test_stats_match_single_device(self):
        """Noise-free: global lse/lse2/MAP of the sharded step must match
        the single-device fused step on the same (replicated) cloud."""
        from tpuslam.ops.pf_pallas import (pf_fused_init,
                                           pf_fused_step_stats)
        from tpuslam.parallel import (make_mesh, sharded_pf_fused_init,
                                      sharded_pf_fused_step)
        from tpuslam.filters.pf import pf_init

        cfg = PfConfig(num_particles=512, weight_mode="log",
                       resample_method="hist")
        mesh = make_mesh(n_rollout=1, n_particle=8)
        fs_s = sharded_pf_fused_init(cfg, mesh, tile_n=64)
        fs_1 = pf_fused_init(cfg, pf_init(cfg), tile_n=64)
        key = jax.random.key(0)
        step_s = jax.jit(lambda f, k: sharded_pf_fused_step(
            cfg, mesh, f, k, 0, noise_on=False, interpret=True,
            tile_n=64))
        step_1 = jax.jit(lambda f, k: pf_fused_step_stats(
            cfg, f, k, 0, noise_on=False, interpret=True, tile_n=64))
        # k_obs derivation differs only via jax.random.split structure -
        # both paths split the same key the same way.
        fs_s2, ess_s = step_s(fs_s, key)
        fs_12, ess_1 = step_1(fs_1, key)
        assert np.isclose(float(ess_s), float(ess_1), rtol=1e-5)
        assert np.isclose(float(fs_s2.lse), float(fs_12.lse), atol=1e-4)
        assert np.isclose(float(fs_s2.lse2), float(fs_12.lse2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(fs_s2.x_est),
                                   np.asarray(fs_12.x_est), atol=1e-5)
        np.testing.assert_allclose(np.asarray(fs_s2.x_true),
                                   np.asarray(fs_12.x_true), atol=1e-6)

    def test_mean_estimate_matches_single_device(self):
        """estimate="mean" (weighted mean, circular yaw averaging) on the
        sharded path must match the single-device fused step."""
        from tpuslam.ops.pf_pallas import (pf_fused_init,
                                           pf_fused_step_stats)
        from tpuslam.parallel import (make_mesh, sharded_pf_fused_init,
                                      sharded_pf_fused_step)
        from tpuslam.filters.pf import pf_init

        cfg = PfConfig(num_particles=512, weight_mode="log",
                       resample_method="hist", estimate="mean")
        mesh = make_mesh(n_rollout=1, n_particle=8)
        fs_s = sharded_pf_fused_init(cfg, mesh, tile_n=64)
        fs_1 = pf_fused_init(cfg, pf_init(cfg), tile_n=64)
        key = jax.random.key(0)
        fs_s2, ess_s = jax.jit(lambda f, k: sharded_pf_fused_step(
            cfg, mesh, f, k, 0, noise_on=False, interpret=True,
            tile_n=64))(fs_s, key)
        fs_12, ess_1 = jax.jit(lambda f, k: pf_fused_step_stats(
            cfg, f, k, 0, noise_on=False, interpret=True,
            tile_n=64))(fs_1, key)
        assert np.isclose(float(ess_s), float(ess_1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fs_s2.x_est),
                                   np.asarray(fs_12.x_est), atol=1e-5)

    def test_packed_shards_match_flat(self):
        """Sublane-packed local shards (sub_rows=8): stats, estimate
        and the resample firing path must match the flat sharded step
        (same keys; the packed state is a per-device relayout of the
        same cloud)."""
        from tpuslam.ops.pf_pallas import _flat_rows, _pack_rows
        from tpuslam.parallel import (make_mesh, sharded_pf_fused_init,
                                      sharded_pf_fused_step)

        n, n_dev = 2048, 4
        cfg = PfConfig(num_particles=n, weight_mode="log",
                       resample_method="merge", ess_threshold_frac=0.9)
        mesh = make_mesh(n_rollout=1, n_particle=n_dev)
        fs_f = sharded_pf_fused_init(cfg, mesh, tile_n=32, sub_rows=1)
        fs_p = sharded_pf_fused_init(cfg, mesh, tile_n=32, sub_rows=8)
        n_local = n // n_dev
        rng = np.random.default_rng(11)
        parts = rng.normal(size=(3, n)).astype(np.float32) * 0.3 \
            + np.array([[10.0], [0.0], [np.pi / 2]], np.float32)
        lw = (rng.normal(size=n) * 3.0).astype(np.float32)
        lse = float(np.log(np.exp(lw).sum()))
        lse2 = float(np.log(np.exp(2 * lw).sum()))
        # Per-device flat blocks (no padding at this size).
        fs_f = fs_f._replace(particles=jnp.asarray(parts),
                             log_w=jnp.asarray(lw[None]),
                             lse=jnp.float32(lse), lse2=jnp.float32(lse2))
        # Same cloud, each device block packed into 8 planes.
        pp = np.concatenate(
            [np.asarray(_pack_rows(
                jnp.asarray(parts[:, d * n_local:(d + 1) * n_local]), 8))
             for d in range(n_dev)], axis=1)
        lwp = np.concatenate(
            [np.asarray(_pack_rows(
                jnp.asarray(lw[None, d * n_local:(d + 1) * n_local]), 8))
             for d in range(n_dev)], axis=1)
        fs_p = fs_p._replace(particles=jnp.asarray(pp),
                             log_w=jnp.asarray(lwp),
                             lse=jnp.float32(lse), lse2=jnp.float32(lse2))
        key = jax.random.key(2)
        ff2, ess_f = jax.jit(lambda f, k: sharded_pf_fused_step(
            cfg, mesh, f, k, 0, noise_on=False, interpret=True,
            tile_n=32))(fs_f, key)
        fp2, ess_p = jax.jit(lambda f, k: sharded_pf_fused_step(
            cfg, mesh, f, k, 0, noise_on=False, interpret=True,
            tile_n=32))(fs_p, key)
        assert float(ess_f) < n * 0.9  # the gate fired
        assert np.isclose(float(ess_p), float(ess_f), rtol=1e-5)
        assert np.isclose(float(fp2.lse), float(ff2.lse), atol=1e-4)
        np.testing.assert_allclose(np.asarray(fp2.x_est),
                                   np.asarray(ff2.x_est), atol=1e-5)
        # Per-device blocks must hold the same resampled particles.
        n8 = n_local // 8
        for d in range(n_dev):
            blk = fp2.particles[:, d * n8:(d + 1) * n8]
            np.testing.assert_array_equal(
                np.asarray(_flat_rows(blk, 8)),
                np.asarray(ff2.particles[:, d * n_local:(d + 1) * n_local]))

    def test_resample_branch_global_comb(self):
        """A skewed cloud trips the gate; resampled particles must come
        from the heavy support on EVERY shard (global comb)."""
        from tpuslam.parallel import (make_mesh, sharded_pf_fused_init,
                                      sharded_pf_fused_step)

        n = 256
        cfg = PfConfig(num_particles=n, weight_mode="log",
                       resample_method="hist", ess_threshold_frac=0.5)
        mesh = make_mesh(n_rollout=1, n_particle=8)
        fs = sharded_pf_fused_init(cfg, mesh, tile_n=32)
        # Make the LAST device's particles heavy and distinctive.
        p = np.asarray(fs.particles).copy()
        lw = np.full_like(np.asarray(fs.log_w), -30.0)
        n_local = n // 8
        p[0, -n_local:] = 99.0  # x = 99 marks the heavy shard
        lw[0, -n_local:] = 0.0
        lse = float(np.log(np.sum(np.exp(lw[np.isfinite(lw)]))))
        lse2 = float(np.log(np.sum(np.exp(2 * lw[np.isfinite(lw)]))))
        fs = fs._replace(particles=jnp.asarray(p), log_w=jnp.asarray(lw),
                         lse=jnp.float32(lse), lse2=jnp.float32(lse2))
        fs2, ess = jax.jit(lambda f, k: sharded_pf_fused_step(
            cfg, mesh, f, k, 0, noise_on=False, interpret=True,
            tile_n=32))(fs, jax.random.key(1))
        assert float(ess) < n * cfg.ess_threshold_frac
        out = np.asarray(fs2.particles)
        lw2 = np.asarray(fs2.log_w)
        # Every VALID lane descends from an x=99 particle (advanced one
        # noise-free step; x moves by < 2 per step).
        assert (out[0][np.isfinite(lw2[0])] > 90.0).all()

    def test_merge_survivor_exchange_matches_gather(self):
        """resample_method="merge" (survivor exchange: compacted blocks
        all-gathered, local pass-2 expansion) must be bit-identical to
        the gather-everything "hist" path - same key, same comb, same
        boundary tensor, exact kernel values."""
        from tpuslam.parallel import (make_mesh, sharded_pf_fused_init,
                                      sharded_pf_fused_step)

        n = 256
        mesh = make_mesh(n_rollout=1, n_particle=8)
        rng = np.random.default_rng(3)
        p = None
        outs = {}
        for method in ("hist", "merge"):
            cfg = PfConfig(num_particles=n, weight_mode="log",
                           resample_method=method,
                           ess_threshold_frac=0.5)
            fs = sharded_pf_fused_init(cfg, mesh, tile_n=32)
            if p is None:
                p = np.asarray(fs.particles).copy()
                p += rng.normal(size=p.shape) * 0.1
                lw = rng.normal(size=np.asarray(fs.log_w).shape) * 6.0
                lw[~np.isfinite(np.asarray(fs.log_w))] = -np.inf
                fin = lw[np.isfinite(lw)]
                lse = float(np.log(np.sum(np.exp(fin - fin.max())))
                            + fin.max())
                lse2 = float(np.log(np.sum(np.exp(2 * (fin - fin.max()))))
                             + 2 * fin.max())
            fs = fs._replace(particles=jnp.asarray(p, jnp.float32),
                             log_w=jnp.asarray(lw, jnp.float32),
                             lse=jnp.float32(lse), lse2=jnp.float32(lse2))
            fs2, ess = jax.jit(lambda f, k, c=cfg: sharded_pf_fused_step(
                c, mesh, f, k, 0, noise_on=False, interpret=True,
                tile_n=32))(fs, jax.random.key(7))
            assert float(ess) < n * cfg.ess_threshold_frac
            outs[method] = fs2
        np.testing.assert_array_equal(
            np.asarray(outs["hist"].particles),
            np.asarray(outs["merge"].particles))
        np.testing.assert_array_equal(
            np.asarray(outs["hist"].log_w), np.asarray(outs["merge"].log_w))

    def test_merge_cap_overflow_falls_back(self):
        """Near-uniform weights (survivors > t_k per tile) must trip the
        replicated overflow predicate and still produce the exact
        gather-path result."""
        from tpuslam.parallel import (make_mesh, sharded_pf_fused_init,
                                      sharded_pf_fused_step)

        n = 4096  # n_local=512 -> t_in=512, t_k=256 < t_in: overflowable
        mesh = make_mesh(n_rollout=1, n_particle=8)
        outs = {}
        for method in ("hist", "merge"):
            cfg = PfConfig(num_particles=n, weight_mode="log",
                           resample_method=method,
                           ess_threshold_frac=2.0)  # always fire
            fs = sharded_pf_fused_init(cfg, mesh, tile_n=512)
            fs2, _ = jax.jit(lambda f, k, c=cfg: sharded_pf_fused_step(
                c, mesh, f, k, 0, noise_on=False, interpret=True,
                tile_n=512))(fs, jax.random.key(9))
            outs[method] = fs2
        np.testing.assert_array_equal(
            np.asarray(outs["hist"].particles),
            np.asarray(outs["merge"].particles))

    def test_tracks_truth(self):
        """30 sharded fused steps (noise-free kernel): the MAP estimate
        follows the deterministic orbit."""
        from tpuslam.parallel import (make_mesh, sharded_pf_fused_init,
                                      sharded_pf_fused_step)

        cfg = PfConfig(num_particles=128, weight_mode="log",
                       resample_method="hist")
        mesh = make_mesh(n_rollout=1, n_particle=8)
        fs = sharded_pf_fused_init(cfg, mesh, tile_n=16)
        step = jax.jit(lambda f, k: sharded_pf_fused_step(
            cfg, mesh, f, k, 0, noise_on=False, interpret=True,
            tile_n=16))
        for i in range(30):
            fs, _ = step(fs, jax.random.key(i))
        err = np.linalg.norm(np.asarray(fs.x_est[:2] - fs.x_true[:2]))
        assert err < 0.5  # all particles ride the same noise-free orbit


class TestShardedGraphAssembly:
    def test_matches_unsharded_iteration(self):
        """Edge-sharded GN iteration == single-device banded iteration."""
        import math
        from tpuslam.models.scan_sensor import ScanConfig
        from tpuslam.slam import (GraphConfig, graph_solve_banded,
                                  make_large_scene, window_pairs)
        from tpuslam.slam.large import (assemble_banded, build_edge_blocks,
                                        cg_solve)
        from tpuslam.core.angles import wrap_angle
        from tpuslam.parallel import make_mesh, sharded_gn_iteration

        cfg = GraphConfig(
            max_times=60, num_landmarks=12, exact_jacobians=True,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        pt, po, obs = make_large_scene(cfg, jax.random.key(2), 60, 12,
                                       radius=20.0, odom_noise=0.1)
        el = window_pairs(np.asarray(obs.valid), window=15)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

        mesh = make_mesh()
        poses_s, dsum_s, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh, p, obs, el, 15,
                                           rel_odom=rel_odom))(po)

        # Unsharded single iteration.
        from tpuslam.slam.large import add_odometry_chain
        blocks = build_edge_blocks(cfg, po, obs, el)
        h_band, bvec, kept = assemble_banded(cfg, blocks, el, 60, 15)
        h_band, bvec = add_odometry_chain(h_band, bvec, po, rel_odom,
                                          (100.0, 100.0, 400.0))
        delta, _ = cg_solve(h_band, -bvec)
        want = po + delta
        want = want.at[:, 2].set(wrap_angle(want[:, 2]))

        np.testing.assert_allclose(np.asarray(poses_s), np.asarray(want),
                                   atol=5e-3)


class TestShardedBandedCg:
    """Pose-sharded banded CG (halo-exchange matvec) vs single device."""

    def _system(self, t1=80, band=10, seed=5):
        import math
        from tpuslam.core.angles import wrap_angle
        from tpuslam.models.scan_sensor import ScanConfig
        from tpuslam.slam import (GraphConfig, make_large_scene,
                                  window_pairs)
        from tpuslam.slam.large import (add_odometry_chain,
                                        assemble_banded, build_edge_blocks)

        cfg = GraphConfig(
            max_times=t1, num_landmarks=16, exact_jacobians=True,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        pt, po, obs = make_large_scene(cfg, jax.random.key(seed), t1, 16,
                                       radius=25.0, odom_noise=0.1)
        el = window_pairs(np.asarray(obs.valid), window=band)
        blocks = build_edge_blocks(cfg, po, obs, el)
        h_band, bvec, _ = assemble_banded(cfg, blocks, el, t1, band)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
        h_band, bvec = add_odometry_chain(h_band, bvec, po, rel_odom,
                                          (100.0, 100.0, 400.0))
        return h_band, bvec

    def test_matches_single_device_cg(self):
        from tpuslam.parallel import make_mesh, sharded_cg_solve
        from tpuslam.slam.large import cg_solve

        h_band, bvec = self._system()
        mesh = make_mesh()
        x_s, it_s = jax.jit(
            lambda h, b: sharded_cg_solve(mesh, h, b))(h_band, -bvec)
        x_1, _ = cg_solve(h_band, -bvec)
        np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_1),
                                   atol=1e-4)

    def test_matvec_residual_is_small(self):
        """H x_solved ~= b through the single-device banded matvec."""
        from tpuslam.parallel import make_mesh, sharded_cg_solve
        from tpuslam.slam.large import banded_matvec

        h_band, bvec = self._system(seed=6)
        mesh = make_mesh()
        x, _ = jax.jit(
            lambda h, b: sharded_cg_solve(mesh, h, b, tol=1e-12))(
                h_band, -bvec)
        r = np.asarray(banded_matvec(h_band, x) + bvec)
        assert np.abs(r).max() < 1e-2 * max(1.0, np.abs(bvec).max())

    def test_single_device_mesh(self):
        """n_dev = 1 degenerates to the local solver (zero halos)."""
        from tpuslam.parallel import make_mesh, sharded_cg_solve
        from tpuslam.slam.large import cg_solve

        h_band, bvec = self._system(seed=7)
        mesh = make_mesh(n_rollout=1)
        x_s, _ = jax.jit(
            lambda h, b: sharded_cg_solve(mesh, h, b))(h_band, -bvec)
        x_1, _ = cg_solve(h_band, -bvec)
        np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_1),
                                   atol=1e-4)

    def test_shard_narrower_than_band_raises(self):
        from tpuslam.parallel import make_mesh, sharded_cg_solve

        h_band, bvec = self._system(t1=16, band=4)  # ell=2 < band
        mesh = make_mesh()
        with pytest.raises(ValueError):
            sharded_cg_solve(mesh, h_band, -bvec)

    def test_gn_iteration_with_sharded_solver(self):
        """Edge-sharded assembly + pose-sharded CG == replicated CG."""
        import math
        from tpuslam.core.angles import wrap_angle
        from tpuslam.models.scan_sensor import ScanConfig
        from tpuslam.slam import (GraphConfig, make_large_scene,
                                  window_pairs)
        from tpuslam.parallel import make_mesh, sharded_gn_iteration

        cfg = GraphConfig(
            max_times=64, num_landmarks=12, exact_jacobians=True,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        pt, po, obs = make_large_scene(cfg, jax.random.key(8), 64, 12,
                                       radius=20.0, odom_noise=0.1)
        el = window_pairs(np.asarray(obs.valid), window=8)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
        mesh = make_mesh()
        kw = dict(rel_odom=rel_odom, cg_tol=1e-10)
        p_rep, d_rep, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh, p, obs, el, 8,
                                           solver="cg", **kw))(po)
        p_shd, d_shd, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh, p, obs, el, 8,
                                           solver="sharded_cg", **kw))(po)
        np.testing.assert_allclose(np.asarray(p_shd), np.asarray(p_rep),
                                   atol=1e-4)


class TestShardedGraphSolve:
    def test_full_solve_matches_single_device(self):
        """Multi-iteration edge-sharded solve == graph_solve_banded."""
        import math
        from tpuslam.models.scan_sensor import ScanConfig
        from tpuslam.slam import (GraphConfig, graph_solve_banded,
                                  make_large_scene, window_pairs)
        from tpuslam.core.angles import wrap_angle
        from tpuslam.parallel import make_mesh, sharded_graph_solve

        noise = 0.2
        cfg = GraphConfig(
            max_times=80, num_landmarks=16, exact_jacobians=True,
            max_gn_iters=8,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        pt, po, obs = make_large_scene(cfg, jax.random.key(4), 80, 16,
                                       radius=25.0, odom_noise=noise)
        el = window_pairs(np.asarray(obs.valid), window=20)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
        kw = dict(rel_odom=rel_odom, odom_info=(1 / noise ** 2,) * 3)

        mesh = make_mesh()
        poses_s, iters_s, _ = sharded_graph_solve(cfg, mesh, po, obs, el,
                                                  20, **kw)
        # NOTE: sharded_gn_iteration relinearizes Omega from the current
        # poses (reference behavior); match that on the reference path.
        res = graph_solve_banded(cfg, po, obs, el, band=20,
                                 relinearize_omega=True, **kw)
        np.testing.assert_allclose(np.asarray(poses_s),
                                   np.asarray(res.poses), atol=3e-2)


class TestShardedFusedEkf:
    """Rollout-sharded whole-rollout EKF kernel (interpret mode)."""

    def test_matches_single_device_noise_free(self):
        from tpuslam.filters import EkfConfig
        from tpuslam.ops import ekf_fused_rollout
        from tpuslam.parallel import make_mesh, sharded_ekf_fused_sweep

        cfg = EkfConfig()
        mesh = make_mesh(n_rollout=8, n_particle=1)
        final, err, rmse = jax.jit(lambda s: sharded_ekf_fused_sweep(
            cfg, mesh, s, batch=32, n_steps=12, tile_b=4,
            noise_on=False, interpret=True))(0)
        f1, e1 = ekf_fused_rollout(cfg, 0, batch=4, n_steps=12, tile_b=4,
                                   noise_on=False, interpret=True)
        # Noise-free rollouts are identical on every device/lane.
        np.testing.assert_allclose(np.asarray(final.x_hat[0]),
                                   np.asarray(f1.x_hat[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(final.x_hat[31]),
                                   np.asarray(f1.x_hat[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(err),
                                   np.tile(np.asarray(e1), 8), atol=1e-6)
        np.testing.assert_allclose(
            float(rmse),
            float(np.sqrt(np.asarray(e1).mean() / 12)), atol=1e-6)
        assert final.x_hat.shape == (32, 3)


class TestShardedTridiag:
    """Pose-sharded substructured block Thomas
    (parallel/tridiag_shard.py) vs the single-device flat solver."""

    @staticmethod
    def _flat_system(rng, t1, band):
        d1 = band + 1
        h_flat = np.zeros((d1 * 9, t1), np.float32)
        for d in range(d1):
            blkv = rng.normal(size=(t1, 3, 3)).astype(np.float32) * 0.3
            if d == 0:
                blkv = 0.5 * (blkv + blkv.transpose(0, 2, 1))
                blkv += np.eye(3, dtype=np.float32)[None] * (band + 4.0)
            for a in range(3):
                for b_ in range(3):
                    h_flat[d * 9 + 3 * a + b_, :] = blkv[:, a, b_]
            if d:
                h_flat[d * 9:(d + 1) * 9, t1 - d:] = 0.0
        b3 = rng.normal(size=(3, t1)).astype(np.float32)
        return jnp.asarray(h_flat), jnp.asarray(b3)

    @pytest.mark.parametrize("t1,band,s", [(128, 4, 8), (200, 3, 5),
                                           (97, 5, None)])
    def test_matches_single_device(self, rng, t1, band, s):
        from tpuslam.parallel import make_mesh
        from tpuslam.parallel.tridiag_shard import (
            sharded_banded_solve_tridiag_flat)
        from tpuslam.slam.tridiag import banded_solve_tridiag_flat

        h_flat, b3 = self._flat_system(rng, t1, band)
        mesh = make_mesh()
        x_s = jax.jit(lambda h, b: sharded_banded_solve_tridiag_flat(
            mesh, h, b, band, super_size=s))(h_flat, b3)
        x_1 = banded_solve_tridiag_flat(h_flat, b3, band, super_size=s)
        np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_1),
                                   rtol=2e-3, atol=2e-4)

    def test_single_device_mesh(self, rng):
        from tpuslam.parallel import make_mesh
        from tpuslam.parallel.tridiag_shard import (
            sharded_banded_solve_tridiag_flat)
        from tpuslam.slam.tridiag import banded_solve_tridiag_flat

        h_flat, b3 = self._flat_system(rng, 64, 4)
        mesh = make_mesh(n_rollout=1)
        x_s = jax.jit(lambda h, b: sharded_banded_solve_tridiag_flat(
            mesh, h, b, 4))(h_flat, b3)
        x_1 = banded_solve_tridiag_flat(h_flat, b3, 4)
        np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_1),
                                   rtol=2e-3, atol=2e-4)

    def test_residual_small(self, rng):
        """H x ~= b through a dense reconstruction."""
        from tpuslam.parallel import make_mesh
        from tpuslam.parallel.tridiag_shard import (
            sharded_banded_solve_tridiag_flat)

        t1, band = 96, 3
        h_flat, b3 = self._flat_system(rng, t1, band)
        mesh = make_mesh()
        x = np.asarray(jax.jit(
            lambda h, b: sharded_banded_solve_tridiag_flat(
                mesh, h, b, band))(h_flat, b3))
        hf = np.asarray(h_flat)
        a = np.zeros((3 * t1, 3 * t1))
        for d in range(band + 1):
            for aa in range(3):
                for bb in range(3):
                    row = hf[d * 9 + 3 * aa + bb]
                    for i in range(t1 - d):
                        a[3 * i + aa, 3 * (i + d) + bb] = row[i]
                        if d or bb > aa:
                            a[3 * (i + d) + bb, 3 * i + aa] = row[i]
        r = a @ x.ravel() - np.asarray(b3).T.ravel()
        assert np.abs(r).max() < 1e-2 * max(1.0, np.abs(b3).max())

    def test_gn_iteration_sharded_tridiag(self):
        """Edge-sharded flat assembly + pose-sharded direct Thomas ==
        the replicated-CG iteration (same system, tight CG tol)."""
        import math
        from tpuslam.core.angles import wrap_angle
        from tpuslam.models.scan_sensor import ScanConfig
        from tpuslam.slam import (GraphConfig, make_large_scene,
                                  window_pairs)
        from tpuslam.parallel import make_mesh, sharded_gn_iteration

        t1 = 128  # 8 devices x 2 super-blocks of 8
        cfg = GraphConfig(
            max_times=t1, num_landmarks=12, exact_jacobians=True,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        pt, po, obs = make_large_scene(cfg, jax.random.key(9), t1, 12,
                                       radius=25.0, odom_noise=0.1)
        el = window_pairs(np.asarray(obs.valid), window=8)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
        mesh = make_mesh()
        kw = dict(rel_odom=rel_odom)
        p_rep, d_rep, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh, p, obs, el, 8,
                                           solver="cg", cg_tol=1e-10,
                                           **kw))(po)
        p_shd, d_shd, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh, p, obs, el, 8,
                                           solver="sharded_tridiag",
                                           **kw))(po)
        np.testing.assert_allclose(np.asarray(p_shd), np.asarray(p_rep),
                                   rtol=2e-4, atol=5e-3)


class TestMultiSlice:
    """Multi-slice (DCN) tier on a (2, 4) CPU mesh emulating 2 slices x
    4 chips (SURVEY.md section 5, distributed row: psum over ICI within a
    slice, DCN across slices)."""

    def test_make_multislice_mesh(self):
        from tpuslam.parallel import SLICE_AXIS, make_multislice_mesh

        mesh = make_multislice_mesh(2, 4)
        assert mesh.shape[SLICE_AXIS] == 2
        assert mesh.shape["rollout"] == 4

    def test_init_distributed_noop_single_process(self):
        from tpuslam.parallel import init_distributed

        assert init_distributed() is False  # no coordinator configured

    def test_ekf_sweep_matches_flat_mesh(self):
        """2-slice hierarchical sweep == 1-D 8-device sweep (same keys:
        sharding layout must not change the math)."""
        from tpuslam.filters import EkfConfig
        from tpuslam.parallel import (SLICE_AXIS, make_mesh,
                                      make_multislice_mesh,
                                      sharded_ekf_sweep)

        cfg = EkfConfig()
        keys = jax.random.split(jax.random.key(11), 16)
        mesh1 = make_mesh()
        t1, p1, r1 = jax.jit(
            lambda k: sharded_ekf_sweep(cfg, mesh1, k, 10))(keys)
        mesh2 = make_multislice_mesh(2, 4)
        t2, p2, r2 = jax.jit(
            lambda k: sharded_ekf_sweep(cfg, mesh2, k, 10,
                                        slice_axis=SLICE_AXIS))(keys)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_allclose(float(r1), float(r2), rtol=1e-6)

    def test_fused_sweep_two_slices(self):
        from tpuslam.filters import EkfConfig
        from tpuslam.parallel import (SLICE_AXIS, make_multislice_mesh,
                                      sharded_ekf_fused_sweep)

        cfg = EkfConfig()
        mesh = make_multislice_mesh(2, 4)
        final, err, rmse = jax.jit(lambda s: sharded_ekf_fused_sweep(
            cfg, mesh, s, batch=16, n_steps=4, tile_b=2,
            noise_on=False, interpret=True,
            slice_axis=SLICE_AXIS))(0)
        assert final.x_hat.shape == (16, 3)
        assert np.isfinite(float(rmse))

    def test_gn_iteration_two_slices_matches_flat(self):
        """Edge-sharded assembly over slice x rollout with hierarchical
        psum == the 1-D mesh result (exact: integer scatter targets,
        f32 sums reassociated only across identical partials)."""
        import math
        from tpuslam.core.angles import wrap_angle
        from tpuslam.models.scan_sensor import ScanConfig
        from tpuslam.slam import (GraphConfig, make_large_scene,
                                  window_pairs)
        from tpuslam.parallel import (SLICE_AXIS, make_mesh,
                                      make_multislice_mesh,
                                      sharded_gn_iteration)

        t1 = 64
        cfg = GraphConfig(
            max_times=t1, num_landmarks=12, exact_jacobians=True,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        pt, po, obs = make_large_scene(cfg, jax.random.key(12), t1, 12,
                                       radius=20.0, odom_noise=0.1)
        el = window_pairs(np.asarray(obs.valid), window=8)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
        kw = dict(rel_odom=rel_odom, cg_tol=1e-10)
        mesh1 = make_mesh()
        p1, d1, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh1, p, obs, el, 8,
                                           solver="cg", **kw))(po)
        mesh2 = make_multislice_mesh(2, 4)
        p2, d2, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh2, p, obs, el, 8,
                                           solver="cg",
                                           slice_axis=SLICE_AXIS,
                                           **kw))(po)
        # Hierarchical psum reassociates the f32 partial sums (4+2 vs
        # flat 8): tiny last-ulp differences feed the solve.
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   rtol=1e-3, atol=1e-4)

    def test_gn_sharded_tridiag_two_slices(self):
        """Hierarchical assembly + within-slice pose-sharded Thomas."""
        import math
        from tpuslam.core.angles import wrap_angle
        from tpuslam.models.scan_sensor import ScanConfig
        from tpuslam.slam import (GraphConfig, make_large_scene,
                                  window_pairs)
        from tpuslam.parallel import (SLICE_AXIS, make_mesh,
                                      make_multislice_mesh,
                                      sharded_gn_iteration)

        t1 = 64  # 4 within-slice devices x 2 super-blocks of 8
        cfg = GraphConfig(
            max_times=t1, num_landmarks=12, exact_jacobians=True,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)))
        pt, po, obs = make_large_scene(cfg, jax.random.key(13), t1, 12,
                                       radius=20.0, odom_noise=0.1)
        el = window_pairs(np.asarray(obs.valid), window=8)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
        mesh2 = make_multislice_mesh(2, 4)
        p_td, _, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh2, p, obs, el, 8,
                                           solver="sharded_tridiag",
                                           slice_axis=SLICE_AXIS,
                                           rel_odom=rel_odom))(po)
        mesh1 = make_mesh()
        p_cg, _, _ = jax.jit(
            lambda p: sharded_gn_iteration(cfg, mesh1, p, obs, el, 8,
                                           solver="cg", cg_tol=1e-10,
                                           rel_odom=rel_odom))(po)
        np.testing.assert_allclose(np.asarray(p_td), np.asarray(p_cg),
                                   rtol=2e-4, atol=5e-3)


class TestShardedPfBatchSweep:
    """Filter-data-parallel batched PF kernels under the rollout mesh."""

    def test_single_device_matches_direct_rollout(self):
        """On a 1-device mesh the sweep must equal the direct local
        rollout bit-for-bit (same key fold, same seed range)."""
        from tpuslam.ops.pf_batch_pallas import pf_batch_rollout
        from tpuslam.parallel import sharded_pf_batch_sweep

        cfg = PfConfig(num_particles=128, weight_mode="log",
                       resample_method="hist")
        mesh = make_mesh(n_rollout=1)
        n_steps, batch, seed = 3, 4, 11
        x_est, ess, rmse = jax.jit(lambda: sharded_pf_batch_sweep(
            cfg, mesh, seed, batch=batch, n_steps=n_steps,
            noise_on=False, interpret=True))()
        key = jax.random.fold_in(jax.random.key(seed), 0)
        _, outs = pf_batch_rollout(cfg, key, batch, n_steps,
                                   noise_on=False, interpret=True, seed0=1)
        np.testing.assert_array_equal(np.asarray(x_est),
                                      np.asarray(outs.x_est))
        np.testing.assert_array_equal(np.asarray(ess), np.asarray(outs.ess))

    def test_eight_devices_one_tile_and_wide(self):
        from tpuslam.parallel import sharded_pf_batch_sweep

        mesh = make_mesh(n_rollout=8)
        cfg = PfConfig(num_particles=128, weight_mode="log",
                       resample_method="hist")
        x_est, ess, rmse = jax.jit(lambda: sharded_pf_batch_sweep(
            cfg, mesh, 3, batch=16, n_steps=3, noise_on=False,
            interpret=True))()
        assert x_est.shape == (3, 16, 3) and ess.shape == (3, 16)
        assert np.isfinite(np.asarray(x_est)).all()
        assert np.isfinite(float(rmse))

        wcfg = PfConfig(num_particles=256, weight_mode="log",
                        resample_method="merge")
        wx, wess, wrmse = jax.jit(lambda: sharded_pf_batch_sweep(
            wcfg, mesh, 4, batch=8, n_steps=2, wide=True, tile_n=128,
            noise_on=False, interpret=True))()
        assert wx.shape == (2, 8, 3)
        assert np.isfinite(np.asarray(wx)).all()


class TestShardedCheckpoint:
    """Sharded-state checkpoint round-trip (SURVEY.md section 5,
    checkpoint row): Orbax must save and restore NamedSharding-placed
    pytrees on the 8-device mesh with values AND shardings intact."""

    def _shard_shapes(self, arr):
        return {s.data.shape for s in arr.addressable_shards}

    def test_pf_particle_sharded_roundtrip(self, tmp_path):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpuslam.parallel.mesh import PARTICLE_AXIS
        from tpuslam.utils.checkpoint import restore_state, save_state
        from tpuslam.filters.pf import PfState

        cfg = PfConfig(num_particles=800)
        mesh = make_mesh(n_rollout=1, n_particle=8)
        k1, k2 = jax.random.split(jax.random.key(3))
        part_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
        rep = NamedSharding(mesh, P())
        state = PfState(
            x_true=jax.device_put(jnp.asarray(cfg.x0), rep),
            particles=jax.device_put(
                jax.random.normal(k1, (cfg.num_particles, 3)), part_sh),
            weights=jax.device_put(
                jax.nn.softmax(jax.random.normal(k2, (cfg.num_particles,))),
                part_sh))
        save_state(str(tmp_path / "pf"), state)
        restored = restore_state(str(tmp_path / "pf"), state)
        assert self._shard_shapes(restored.particles) == {(100, 3)}
        assert self._shard_shapes(restored.weights) == {(100,)}
        for got, want in zip(restored, state):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_ekf_rollout_sharded_roundtrip(self, tmp_path):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpuslam.filters import ekf_init
        from tpuslam.parallel.mesh import ROLLOUT_AXIS
        from tpuslam.utils.checkpoint import restore_state, save_state

        cfg = EkfConfig()
        mesh = make_mesh(n_rollout=8)
        sh = NamedSharding(mesh, P(ROLLOUT_AXIS))
        state = jax.tree.map(
            lambda x: jax.device_put(x, sh), ekf_init(cfg, (16,)))
        save_state(str(tmp_path / "ekf"), state)
        restored = restore_state(str(tmp_path / "ekf"), state)
        assert self._shard_shapes(restored.x_hat) == {(2, 3)}
        assert self._shard_shapes(restored.cov) == {(2, 3, 3)}
        for got, want in zip(restored, state):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
