#!/usr/bin/env python
"""Sweep the tridiag solver's super-block size S at large pose counts.

The block-Thomas scan runs T1/S iterations of dense (3S, 3S) work
(Cholesky + triangular inverse + a few matmuls).  At the default
S = band = 40 the 1M-pose solve measures 0.81 s/GN iteration over
25k scan steps (~32 us/step) - plausibly dispatch-bound, not
flops-bound.  This sweep measures S in {band, 64, 96, 128, 192} to
find the knee; the stacked (N, 3S, 3S) carry costs ~72*S bytes/pose
(diag + saved inverses), so S is HBM-capped near ~192 at 1M poses.
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
    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    log(f"devices: {jax.devices()}")
    n_poses = int(os.environ.get("N_POSES", 1_000_000))
    n_lm, window = 100, 40
    cfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_lm, max_gn_iters=10,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    t0 = time.perf_counter()
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses,
                                   n_lm, radius=0.05 * n_poses,
                                   odom_noise=0.1, scan_chunk=10_000)
    el = window_pairs(np.asarray(obs.valid), window=window)
    log(f"scene + {el.t_b.shape[0]} edges in "
        f"{time.perf_counter() - t0:.1f}s")
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    base_rmse = None
    for s_blk in (None, 64, 96, 128, 192):
        label = s_blk if s_blk is not None else f"band={window} (default)"

        def fn(p, obs, el, rel_odom):
            res = graph_solve_banded(
                cfg, p, obs, el, band=window, rel_odom=rel_odom,
                odom_info=(100.0, 100.0, 100.0), solver="tridiag",
                delta_tol=1e-6 * n_poses, super_size=s_blk)
            return res.poses, res.delta_sum, res.gn_iters

        jfn = jax.jit(fn)
        try:
            t0 = time.perf_counter()
            poses, dsum, iters = jfn(po, obs, el, rel_odom)
            float(dsum)
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            poses, dsum, iters = jfn(po, obs, el, rel_odom)
            float(dsum)
            dt = time.perf_counter() - t0
            err = np.asarray(poses[:, :2]) - np.asarray(pt[:, :2])
            rmse = float(np.sqrt((err ** 2).sum(-1).mean()))
            it = max(int(iters), 1)
            if base_rmse is None:
                base_rmse = rmse
            log(f"S={label}: {dt:.2f} s ({dt / it:.3f} s/GN iter, "
                f"{it} iters), RMSE {rmse:.4f}, compile+run "
                f"{t_first:.1f}s")
            assert abs(rmse - base_rmse) < 0.05 * max(base_rmse, 1e-6), \
                f"S={label} RMSE drifted: {rmse} vs {base_rmse}"
        except Exception as e:
            log(f"S={label}: FAILED ({type(e).__name__}: {e})")
    log("ALL DONE")


if __name__ == "__main__":
    main()
