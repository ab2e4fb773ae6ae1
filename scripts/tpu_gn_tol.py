#!/usr/bin/env python
"""GN convergence-criterion study at 10k poses.

The bench's delta_tol = 1e-6 * T1 (0.01 total) matches the REFERENCE's
absolute threshold (graph_based_slam.py:630) - but the reference runs an
18-pose course, so per pose that is 560x stricter than the reference
itself.  With exact_jacobians + frozen Omega the problem is linear: GN
should converge in ~2 iterations under the reference-equivalent per-pose
criterion (0.01/18 per pose).  Measure iterations / wall / RMSE per tol.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import math
import numpy as np
import jax


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    n_poses, n_lm, window = 10000, 1000, 40
    cfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_lm, max_gn_iters=10,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses, n_lm,
                                   radius=3000.0, odom_noise=0.1)
    el = window_pairs(np.asarray(obs.valid), window=window)
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
    pt_np = np.asarray(pt[:, :2])

    for tol in (1e-6 * n_poses, 0.01 / 18 * n_poses):
        @jax.jit
        def fn(p, obs, el, rel_odom, tol=tol):
            res = graph_solve_banded(cfg, p, obs, el, band=window,
                                     rel_odom=rel_odom,
                                     odom_info=(100.0, 100.0, 100.0),
                                     solver="cr", delta_tol=tol)
            return res.poses, res.gn_iters, res.delta_sum

        poses, it, ds = fn(po, obs, el, rel_odom)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(po, obs, el, rel_odom)[2])
            ts.append(time.perf_counter() - t0)
        p_est = np.asarray(poses)
        rmse = np.sqrt(((p_est[:, :2] - pt_np) ** 2).sum(-1).mean())
        log(f"tol={tol:.3g}: iters={int(it)} last|dx|^2={float(ds):.4f} "
            f"solve={min(ts):.3f}s RMSE={rmse:.4f}")

    log("ALL DONE")


if __name__ == "__main__":
    main()
