#!/usr/bin/env python
"""100k-pose / 5k-landmark graph solve on one chip (scaling headroom)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import functools
import math
import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    n_poses, n_lm, window = 100_000, 1_000, 40
    cfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_lm, max_gn_iters=10,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    t0 = time.time()
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses, n_lm,
                                   radius=0.3 * n_poses, odom_noise=0.1,
                                   scan_chunk=10_000)
    valid = np.asarray(obs.valid)
    log(f"scene in {time.time() - t0:.1f}s; sightings={valid.sum()}")
    t0 = time.time()
    el = window_pairs(valid, window=window)
    log(f"edges: {el.t_b.shape[0]} in {time.time() - t0:.1f}s (host)")
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    for solver in ("tridiag", "cr"):
        # NOTE: obs/el/rel_odom must be jit ARGUMENTS - closed-over
        # arrays become program constants shipped with the remote
        # compile POST (~1.6 GB at this scale -> broken pipe).
        @functools.partial(jax.jit, static_argnames=("sv",))
        def fn(p, obs, el, rel_odom, sv=solver):
            res = graph_solve_banded(cfg, p, obs, el, band=window,
                                     rel_odom=rel_odom,
                                     odom_info=(100.0, 100.0, 100.0),
                                     solver=sv,
                                     delta_tol=0.01 / 18 * n_poses)
            return (jnp.sum(res.poses) + res.delta_sum, res.gn_iters,
                    res.poses)

        t0 = time.time()
        s, it, poses = fn(po, obs, el, rel_odom)
        s = float(s)
        log(f"{solver}: compile+first {time.time() - t0:.1f}s "
            f"gn_iters={int(it)}")
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(po, obs, el, rel_odom)[0])
            ts.append(time.perf_counter() - t0)
        p_est = np.asarray(poses)
        rmse = np.sqrt(((p_est[:, :2] - np.asarray(pt[:, :2])) ** 2)
                       .sum(-1).mean())
        rmse_odo = np.sqrt(
            ((np.asarray(po[:, :2]) - np.asarray(pt[:, :2])) ** 2)
            .sum(-1).mean())
        log(f"{solver}: 100k-pose solve {min(ts):.3f}s  "
            f"RMSE {rmse:.3f} (odometry {rmse_odo:.3f})")

    log("ALL DONE")


if __name__ == "__main__":
    main()
