"""NumPy float64 oracles re-deriving the reference algorithms.

These are independent re-implementations of the documented reference
behavior (SURVEY.md section 2), used as ground truth for parity tests.
They intentionally include the reference's quirks (sigma-squared noise
std, row-eigenvector ellipse angle, etc.).
"""

import numpy as np

BASE_ANG = np.pi / 2.0


def limit_angle(a):
    """Scalar while-loop wrap (mylib/limit.py:11-26 behavior)."""
    out = abs(a)
    while out > np.pi:
        out -= 2.0 * np.pi
    if a < 0:
        out = -out
    return out


def world2robot(pose, pts):
    """pose: (3,), pts: (N, 2) -> (N, 2)."""
    yaw = BASE_ANG - pose[2]
    rot = np.array([[np.cos(yaw), -np.sin(yaw)],
                    [np.sin(yaw), np.cos(yaw)]])
    return (rot @ (pts - pose[:2]).T).T


def robot2world(pose, pts):
    yaw = pose[2] - BASE_ANG
    rot = np.array([[np.cos(yaw), -np.sin(yaw)],
                    [np.sin(yaw), np.cos(yaw)]])
    return (rot @ pts.T).T + pose[:2]


def circular_step(x, v, w, dt):
    """EKF/PF process model (extended_kalman_filter.py:160-178 behavior)."""
    yaw = x[2]
    nxt = np.array([x[0] + v * dt * np.cos(yaw),
                    x[1] + v * dt * np.sin(yaw),
                    yaw + w * dt])
    nxt[2] = limit_angle(nxt[2])
    return nxt


def ekf_step(x_true, x_dr, x_hat, P, v, w, dt, Q, R, obs_noise, dr_noise):
    """Full fused EKF step (main_ekf behavior) with injected noise.

    obs_noise: (2,) robot-frame observation noise.
    dr_noise: (3,) additive dead-reckoning noise.
    Returns (x_true', x_dr', z, x_pre, x_hat', P').
    """
    x_true = circular_step(x_true, v, w, dt)
    z = robot2world(x_true, obs_noise[None, :])[0]
    x_dr = circular_step(x_dr, v, w, dt) + dr_noise

    # Predict.
    x_pre = circular_step(x_hat, v, w, dt)
    yaw = x_hat[2]
    jF = np.array([[1.0, 0.0, -dt * v * np.sin(yaw)],
                   [0.0, 1.0, dt * v * np.cos(yaw)],
                   [0.0, 0.0, 1.0]])
    P_m = jF @ P @ jF.T + Q

    # Update.
    C = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    e = z - C @ x_pre
    S = C @ P_m @ C.T + R
    G = P_m @ C.T @ np.linalg.inv(S)
    x_new = x_pre + G @ e
    x_new[2] = limit_angle(x_new[2])
    P_new = (np.eye(3) - G @ C) @ P_m
    return x_true, x_dr, z, x_pre, x_new, P_new


def motion_with_noise(pose, v, w, dt, a, noise3, sigma_squared=True):
    """Velocity motion model with injected unit noise (motion_model.py:31-62).

    noise3: (3,) standard-normal draws for (v, w, gamma).
    """
    v2, w2 = v * v, w * w
    sv = a[0] * v2 + a[1] * w2
    sw = a[2] * v2 + a[3] * w2
    sg = a[4] * v2 + a[5] * w2
    if sigma_squared:
        sv, sw, sg = sv ** 2, sw ** 2, sg ** 2
    v_hat = v + noise3[0] * sv
    w_hat = w + noise3[1] * sw
    g_hat = noise3[2] * sg
    r = v_hat / w_hat
    b = w_hat * dt
    yaw = pose[2]
    return np.array([
        pose[0] - r * np.sin(yaw) + r * np.sin(yaw + b),
        pose[1] + r * np.cos(yaw) - r * np.cos(yaw + b),
        limit_angle(yaw + (w_hat + g_hat) * dt),
    ])


def motion_without_noise(pose, v, w, dt):
    """motion_model.py:64-86 behavior."""
    r = v / w
    b = limit_angle(w * dt)
    yaw = pose[2]
    yaw_add = limit_angle(yaw + b)
    return np.array([
        pose[0] + r * (-np.sin(yaw) + np.sin(yaw_add)),
        pose[1] + r * (np.cos(yaw) - np.cos(yaw_add)),
        yaw_add,
    ])


def scan_true(pose, landmarks, range_m, angle_rad):
    """ScanSensor.scan geometry (graph_based_slam.py:128-172 behavior).

    Returns (dist, bearing, orient, valid) arrays over all landmarks.
    """
    lm_r = world2robot(pose, landmarks)
    dist = np.linalg.norm(lm_r, axis=1)
    bearing = np.arctan2(lm_r[:, 1], lm_r[:, 0])
    orient = np.full(len(landmarks), BASE_ANG - pose[2])
    scan_rad = BASE_ANG - angle_rad
    valid = (dist <= range_m) & (
        lm_r[:, 1] >= np.abs(lm_r[:, 0]) * np.tan(scan_rad))
    return dist, bearing, orient, valid


def measurement_cov(dist, gain, dir_sigma, orient_sigma):
    """graph_based_slam.py:175-194 behavior."""
    d = dist * gain
    return np.diag([d ** 2, (dist * np.sin(dir_sigma)) ** 2,
                    dir_sigma ** 2 + orient_sigma ** 2])


def rot_z_cov(cov, ang):
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return rot @ cov @ rot.T
