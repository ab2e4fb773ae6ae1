#!/usr/bin/env python
"""10k-pose graph solve: cyclic reduction vs block Thomas on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
    log(f"edges: {el.t_b.shape[0]}")
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    results = {}
    for solver in ("cr", "tridiag"):
        @jax.jit
        def fn(p):
            res = graph_solve_banded(cfg, p, obs, el, band=window,
                                     rel_odom=rel_odom,
                                     odom_info=(100.0, 100.0, 100.0),
                                     solver=solver,
                                     delta_tol=1e-6 * n_poses)
            return jnp.sum(res.poses) + res.delta_sum, res.gn_iters

        t0 = time.time()
        s, it = fn(po)
        s = float(s)
        log(f"{solver}: compile+first {time.time() - t0:.1f}s "
            f"gn_iters={int(it)} checksum={s:.4f}")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(po)[0])
            ts.append(time.perf_counter() - t0)
        results[solver] = min(ts)
        log(f"{solver}: 10k-pose solve {min(ts):.3f}s (target < 1 s)")

    # accuracy cross-check
    def poses(solver):
        return jax.jit(lambda p: graph_solve_banded(
            cfg, p, obs, el, band=window, rel_odom=rel_odom,
            odom_info=(100.0, 100.0, 100.0), solver=solver,
            delta_tol=1e-6 * n_poses).poses)

    p_cr = np.asarray(poses("cr")(po))
    p_td = np.asarray(poses("tridiag")(po))
    err_t = np.abs(p_cr - p_td)[:, :2].max()
    rmse_cr = np.sqrt(((p_cr[:, :2] - np.asarray(pt[:, :2])) ** 2)
                      .sum(-1).mean())
    rmse_td = np.sqrt(((p_td[:, :2] - np.asarray(pt[:, :2])) ** 2)
                      .sum(-1).mean())
    log(f"max |cr - tridiag| position: {err_t:.2e}; "
        f"RMSE vs truth: cr {rmse_cr:.3f} tridiag {rmse_td:.3f}")
    log(f"speedup: {results['tridiag'] / results['cr']:.2f}x")
    log("ALL DONE")


if __name__ == "__main__":
    main()
