"""EKF parity + fidelity tests (SURVEY.md section 4, items 1-2)."""

import numpy as np
import jax
import jax.numpy as jnp

import oracles
from tpuslam.filters import (EkfConfig, ekf_init, ekf_predict, ekf_rollout,
                             ekf_rollout_batch, ekf_step, ekf_update)
from tpuslam.filters.ekf import ekf_step_with_noise


CFG = EkfConfig()


def _oracle_mats():
    Q = np.diag(np.asarray(CFG.q_std)) ** 2
    R = np.diag(np.asarray(CFG.r_std)) ** 2
    return Q, R


class TestEkfStepParity:
    def test_single_step_matches_oracle(self, rng):
        """Deterministic-input exactness: same noise -> same trajectory."""
        Q, R = _oracle_mats()
        state = ekf_init(CFG)
        obs_noise = rng.normal(size=2)
        dr_noise = rng.normal(size=3) * 0.05
        nxt, out = ekf_step_with_noise(CFG, state,
                                       jnp.asarray(obs_noise),
                                       jnp.asarray(dr_noise))
        xt, xdr, z, xpre, xhat, P = oracles.ekf_step(
            np.asarray(CFG.x0), np.asarray(CFG.x0), np.asarray(CFG.x0),
            np.diag(np.asarray(CFG.p0_std)) ** 2, CFG.vel, CFG.yaw_rate,
            CFG.dt, Q, R, obs_noise, dr_noise)
        np.testing.assert_allclose(np.asarray(nxt.x_true), xt, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nxt.x_dr), xdr, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.z), z, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.x_pre), xpre, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nxt.x_hat), xhat, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nxt.cov), P, atol=1e-5)

    def test_multi_step_trajectory_matches_oracle(self, rng):
        """360-frame rollout with injected noise matches the NumPy oracle."""
        Q, R = _oracle_mats()
        n = 360
        obs_noise = rng.normal(size=(n, 2))
        dr_noise = rng.normal(size=(n, 3)) * np.asarray(CFG.q_act_std)
        state = ekf_init(CFG)
        xt = np.asarray(CFG.x0).copy()
        xdr = xt.copy()
        xhat = xt.copy()
        P = np.diag(np.asarray(CFG.p0_std)) ** 2
        for i in range(n):
            state, out = ekf_step_with_noise(CFG, state,
                                             jnp.asarray(obs_noise[i]),
                                             jnp.asarray(dr_noise[i]))
            xt, xdr, _, _, xhat, P = oracles.ekf_step(
                xt, xdr, xhat, P, CFG.vel, CFG.yaw_rate, CFG.dt, Q, R,
                obs_noise[i], dr_noise[i])
        np.testing.assert_allclose(np.asarray(state.x_true), xt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(state.x_hat), xhat, atol=1e-3)
        np.testing.assert_allclose(np.asarray(state.cov), P, atol=1e-5)

    def test_predict_update_decomposition(self):
        """Separated filter fns compose to the fused step's filter part."""
        state = ekf_init(CFG)
        x_pre, P_pre = ekf_predict(CFG, state.x_hat, state.cov)
        z = jnp.array([10.1, 0.2])
        x_post, P_post = ekf_update(CFG, x_pre, P_pre, z)
        assert x_post.shape == (3,)
        # Posterior covariance must shrink the position block.
        assert float(P_post[0, 0]) <= float(P_pre[0, 0])
        assert float(P_post[1, 1]) <= float(P_pre[1, 1])


class TestEkfRollout:
    def test_shapes_and_determinism(self):
        final, outs = jax.jit(
            lambda k: ekf_rollout(CFG, k, 50), )(jax.random.key(0))
        assert outs.x_true.shape == (50, 3)
        assert outs.cov.shape == (50, 3, 3)
        final2, outs2 = ekf_rollout(CFG, jax.random.key(0), 50)
        np.testing.assert_allclose(np.asarray(outs.x_hat if hasattr(outs, 'x_hat') else outs.x_pre),
                                   np.asarray(outs2.x_pre), atol=1e-6)

    def test_covariance_stabilizes(self):
        """P converges to a steady band (reference prints P per step)."""
        _, outs = ekf_rollout(CFG, jax.random.key(1), 360)
        p_trace = np.asarray(jnp.trace(outs.cov, axis1=-2, axis2=-1))
        # After convergence the trace stays within a narrow band.
        tail = p_trace[100:]
        assert tail.std() < 0.05 * tail.mean()

    def test_rmse_beats_dead_reckoning(self):
        """Filter fidelity: EKF tracks truth better than raw observations'
        noise floor over a batch of seeded rollouts."""
        keys = jax.random.split(jax.random.key(2), 64)
        _, outs = ekf_rollout_batch(CFG, keys, 360)
        err = np.asarray(outs.x_pre[..., :2] - outs.x_true[..., :2])
        rmse = np.sqrt((err ** 2).sum(-1).mean())
        # Observation noise std is 1.0 per axis -> raw-obs RMSE ~ 1.41.
        assert rmse < 1.0

    def test_nees_consistency(self):
        """Covariance consistency: mean NEES of the position error vs the
        2x2 position covariance stays within chi2 bands (2 dof)."""
        keys = jax.random.split(jax.random.key(3), 64)
        _, outs = ekf_rollout_batch(CFG, keys, 200)
        # Use posterior estimate = x_pre of NEXT step? Use x_pre vs truth
        # with prior covariance is non-trivial; instead use the posterior
        # cov against the posterior error reconstructed from outputs.
        err = np.asarray(outs.x_pre[..., :2] - outs.x_true[..., :2])
        P = np.asarray(outs.cov[..., :2, :2])
        Pinv = np.linalg.inv(P)
        nees = np.einsum("bti,btij,btj->bt", err, Pinv, err)
        mean_nees = nees[:, 50:].mean()
        # For a consistent filter mean NEES ~ dof = 2 (loose band: the
        # prior/posterior mismatch inflates it slightly).
        assert 0.5 < mean_nees < 8.0

    def test_batch_rollout_shapes(self):
        keys = jax.random.split(jax.random.key(4), 8)
        final, outs = ekf_rollout_batch(CFG, keys, 10)
        assert outs.x_true.shape == (8, 10, 3)
        assert final.cov.shape == (8, 3, 3)
