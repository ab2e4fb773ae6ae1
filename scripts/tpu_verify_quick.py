#!/usr/bin/env python
"""Quick end-to-end TPU verify: wide batched PF + banded graph solve.

Drives the two paths touched by the current diff (wide-PF slot-keyed
boundaries, graph_solve_banded super_size plumbing) on the real chip.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops.pf_batch_pallas import (pf_batch_wide_init,
                                             pf_batch_wide_step)

    cfg = PfConfig(num_particles=10_000, weight_mode="log")
    b = 32
    st = pf_batch_wide_init(cfg, b)

    def run(st):
        def body(st, s):
            st, out = pf_batch_wide_step(
                cfg, st, jax.random.fold_in(jax.random.key(0), s), s)
            return st, out.resampled
        return jax.lax.scan(body, st, jnp.arange(100, dtype=jnp.int32))

    t0 = time.perf_counter()
    st2, fired = jax.jit(run)(st)
    est = np.asarray(st2.x_est)
    log(f"compile+run {time.perf_counter() - t0:.1f}s")
    err = est - np.asarray(st2.x_true)[None, :]
    rmse = float(np.sqrt((err[:, :2] ** 2).sum(-1).mean()))
    nf = float(np.asarray(fired, np.float32).sum() / b)
    log(f"wide PF {b}x10k, 100 steps: RMSE {rmse:.3f}, "
        f"avg fired steps/filter {nf:.1f}")
    assert rmse < 0.6, rmse

    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    n_poses, n_lm, window = 10_000, 1000, 40
    gcfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_lm, max_gn_iters=10,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    pt, po, obs = make_large_scene(gcfg, jax.random.key(0), n_poses,
                                   n_lm, radius=0.05 * n_poses,
                                   odom_noise=0.1, scan_chunk=10_000)
    el = window_pairs(np.asarray(obs.valid), window=window)
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    dr_err = np.asarray(po[:, :2]) - np.asarray(pt[:, :2])
    dr_rmse = float(np.sqrt((dr_err ** 2).sum(-1).mean()))
    log(f"odometry-only RMSE {dr_rmse:.4f}")
    for s_blk in (None, 128):
        def fn(p, obs, el, rel_odom):
            res = graph_solve_banded(
                gcfg, p, obs, el, band=window, rel_odom=rel_odom,
                odom_info=(100.0, 100.0, 100.0), solver="tridiag",
                delta_tol=1e-6 * n_poses, super_size=s_blk)
            return res.poses, res.delta_sum, res.gn_iters

        t0 = time.perf_counter()
        poses, dsum, iters = jax.jit(fn)(po, obs, el, rel_odom)
        float(dsum)
        dt = time.perf_counter() - t0
        err = np.asarray(poses[:, :2]) - np.asarray(pt[:, :2])
        rmse = float(np.sqrt((err ** 2).sum(-1).mean()))
        log(f"graph 10k tridiag S={s_blk}: {dt:.1f}s (incl compile), "
            f"{int(iters)} iters, RMSE {rmse:.4f}")
        assert rmse < 0.5 * dr_rmse, (rmse, dr_rmse)
    log("ALL OK")


if __name__ == "__main__":
    main()
