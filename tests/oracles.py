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


def _rot_z(ang):
    c, s = np.cos(ang), np.sin(ang)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def graph_gn_iteration(poses, dist, bearing, orient, valid, t_now,
                       gain, dir_sigma, orient_sigma, anchor=1e4,
                       det_min=0.1, cond_max=1e15):
    """One Gauss-Newton iteration of the reference graph-SLAM algorithm
    (setPairObs over all same-landmark sighting pairs + updateEstPose),
    float64, with the reference's compacted time indexing.

    poses: (T1, 3) float64, updated in place on a copy and returned.
    Returns (poses, is_calc, delta_sum, det, cond, kept_times).
    """
    poses = poses.copy()
    t1, num_l = valid.shape
    edges = []  # (tb, ta, Hbb, Hba, Hab, Haa, bb, ba)
    kept = set()
    for l in range(num_l):
        times = [t for t in range(t_now + 1) if valid[t, l]]
        for x in range(len(times)):
            for y in range(x + 1, len(times)):
                tb, ta = times[x], times[y]
                kept.add(tb)
                kept.add(ta)
                pb, pa = poses[tb], poses[ta]
                db, da = dist[tb, l], dist[ta, l]
                dirb, dira = bearing[tb, l], bearing[ta, l]
                orb, ora = orient[tb, l], orient[ta, l]

                rel_rbt = pa - pb
                rel_rbt = rel_rbt.copy()
                rel_rbt[2] = limit_angle(rel_rbt[2])

                dwb = limit_angle(np.pi + dirb - orb)
                dwa = limit_angle(np.pi + dira - ora)
                owb = limit_angle(BASE_ANG - orb)
                owa = limit_angle(BASE_ANG - ora)
                rel_obs = np.array([
                    da * np.cos(dwa) - db * np.cos(dwb),
                    da * np.sin(dwa) - db * np.sin(dwb),
                    limit_angle(owa - owb),
                ])
                err = rel_rbt - rel_obs
                err[2] = limit_angle(err[2])
                err = err[:, None]

                cov_b = rot_z_cov(
                    measurement_cov(db, gain, dir_sigma, orient_sigma),
                    dirb + pb[2] - BASE_ANG)
                cov_a = rot_z_cov(
                    measurement_cov(da, gain, dir_sigma, orient_sigma),
                    dira + pa[2] - BASE_ANG)
                omega = np.linalg.inv(cov_a + cov_b)

                thb = limit_angle(pb[2] + dirb)
                jb = np.array([[-1.0, 0.0, db * np.sin(thb)],
                               [0.0, -1.0, -db * np.cos(thb)],
                               [0.0, 0.0, -1.0]])
                tha = limit_angle(pa[2] + dira)
                ja = np.array([[1.0, 0.0, -da * np.sin(tha)],
                               [0.0, 1.0, da * np.cos(tha)],
                               [0.0, 0.0, 1.0]])
                edges.append((tb, ta, jb.T @ omega @ jb, jb.T @ omega @ ja,
                              ja.T @ omega @ jb, ja.T @ omega @ ja,
                              jb.T @ omega @ err, ja.T @ omega @ err))

    kept = sorted(kept)
    if len(kept) <= 1:
        return poses, False, 0.0, 0.0, 0.0, kept

    n = len(kept) * 3
    H = np.zeros((n, n))
    bvec = np.zeros((n, 1))
    H[0:3, 0:3] += np.eye(3) * anchor
    idx = {t: i * 3 for i, t in enumerate(kept)}
    for tb, ta, hbb, hba, hab, haa, bb, ba in edges:
        ib, ia = idx[tb], idx[ta]
        H[ib:ib + 3, ib:ib + 3] += hbb
        H[ib:ib + 3, ia:ia + 3] += hba
        H[ia:ia + 3, ib:ib + 3] += hab
        H[ia:ia + 3, ia:ia + 3] += haa
        bvec[ib:ib + 3] += bb
        bvec[ia:ia + 3] += ba

    det = np.linalg.det(H)
    cond = np.linalg.cond(H)
    if det > det_min and cond < cond_max:
        delta = -np.linalg.inv(H) @ bvec
        for i, t in enumerate(kept):
            poses[t, 0] += delta[i * 3, 0]
            poses[t, 1] += delta[i * 3 + 1, 0]
            poses[t, 2] = limit_angle(poses[t, 2] + delta[i * 3 + 2, 0])
        return poses, True, float((delta.T @ delta)[0, 0]), det, cond, kept
    return poses, False, 0.0, det, cond, kept


def graph_solve(poses, dist, bearing, orient, valid, t_now, gain,
                dir_sigma, orient_sigma, anchor=1e4, th=0.01,
                max_iters=50):
    """Reference Gauss-Newton outer loop (estimateOpticalTrajectory)."""
    delta_sum = th
    iters = 0
    is_calc = False
    trace = []  # per-iteration (delta_sum, det, cond), like Loop(n) prints
    while delta_sum >= th and iters < max_iters:
        poses, is_calc, delta_sum, det, cond, kept = graph_gn_iteration(
            poses, dist, bearing, orient, valid, t_now, gain, dir_sigma,
            orient_sigma, anchor)
        trace.append((delta_sum, det, cond))
        iters += 1
    return poses, is_calc, delta_sum, iters, trace
