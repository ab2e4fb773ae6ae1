"""Device-side estimation metrics: RMSE, NEES, ESS, divergence masks.

The reference's only observability is ``print()`` + matplotlib panels
(SURVEY.md section 5): EKF prints covariance entries per step
(extended_kalman_filter.py:264-265), graph SLAM prints per-iteration
||dx||^2 / det / cond (graph_based_slam.py:709).  Here metrics are computed
on device from the stacked ``lax.scan`` outputs and reduced in one shot -
one host transfer per rollout batch, not one print per step.

All functions accept arbitrary leading batch/time axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def position_rmse(est, truth, axis=None):
    """Root-mean-square position error over the given axes.

    Args:
        est, truth: ``(..., 3)`` or ``(..., 2)`` pose/position arrays.
        axis: axes to reduce over (default: all but the last).
    """
    err = est[..., :2] - truth[..., :2]
    se = jnp.sum(err * err, axis=-1)
    return jnp.sqrt(jnp.mean(se, axis=axis))


def yaw_rmse(est, truth, axis=None):
    """RMSE of the wrapped yaw error."""
    d = est[..., 2] - truth[..., 2]
    d = jnp.arctan2(jnp.sin(d), jnp.cos(d))
    return jnp.sqrt(jnp.mean(d * d, axis=axis))


def nees(est, truth, cov, dims=2):
    """Normalized estimation error squared, per step.

    ``dims=2`` uses the position block (chi2 with 2 dof ~ mean 2 for a
    consistent filter); ``dims=3`` the full pose.

    Args:
        est, truth: ``(..., 3)``.
        cov: ``(..., 3, 3)``.

    Returns:
        ``(...)`` NEES values.
    """
    e = est[..., :dims] - truth[..., :dims]
    if dims == 3:
        d2 = e[..., 2]
        e = e.at[..., 2].set(jnp.arctan2(jnp.sin(d2), jnp.cos(d2)))
    c = cov[..., :dims, :dims]
    sol = jnp.linalg.solve(c, e[..., None])[..., 0]
    return jnp.sum(e * sol, axis=-1)


def nees_consistency(est, truth, cov, dims=2, axis=None):
    """Mean NEES over the given axes (filter consistency check)."""
    return jnp.mean(nees(est, truth, cov, dims), axis=axis)


def divergence_mask(est, truth, threshold):
    """Per-rollout validity mask: True where the estimate stayed within
    ``threshold`` of the truth for the whole rollout.

    This is the batched replacement for a process abort on divergence
    (SURVEY.md section 5, failure detection): diverged rollouts are masked
    out of aggregate statistics instead of killing the sweep.

    Args:
        est, truth: ``(B, T, 3)``.

    Returns:
        ``(B,)`` boolean mask.
    """
    err = jnp.linalg.norm(est[..., :2] - truth[..., :2], axis=-1)
    finite = jnp.all(jnp.isfinite(est), axis=(-2, -1))
    return finite & jnp.all(err < threshold, axis=-1)


def summarize_rollouts(est, truth, cov=None):
    """One-shot metric pytree for a batch of rollouts.

    Args:
        est, truth: ``(B, T, 3)``.
        cov: optional ``(B, T, 3, 3)``.

    Returns:
        dict of scalars/arrays (all still on device): overall RMSE, yaw
        RMSE, per-rollout RMSE, mean NEES (if cov given), divergence mask.
    """
    out = {
        "rmse_pos": position_rmse(est, truth),
        "rmse_yaw": yaw_rmse(est, truth),
        "rmse_pos_per_rollout": position_rmse(est, truth, axis=-1),
        "diverged": ~divergence_mask(est, truth, threshold=100.0),
    }
    if cov is not None:
        out["mean_nees"] = nees_consistency(est, truth, cov)
    return out
