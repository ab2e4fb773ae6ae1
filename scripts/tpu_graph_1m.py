#!/usr/bin/env python
"""Stretch scale: 1M-pose / 100-landmark graph solve on one chip
(100x the BASELINE north-star scale; the reference's dense inverse
would be O((3e6)^3) ~ 2.7e19 flops)."""

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
    n_poses, n_lm, window = int(os.environ.get("N_POSES", 300_000)), 100, 40
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
    log(f"scene built in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    el = window_pairs(np.asarray(obs.valid), window=window)
    log(f"{el.t_b.shape[0]} edges in {time.perf_counter() - t0:.1f}s")
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    def make_fn(**kw):
        @jax.jit
        def fn(p, obs, el, rel_odom):
            res = graph_solve_banded(
                cfg, p, obs, el, band=window, rel_odom=rel_odom,
                odom_info=(100.0, 100.0, 100.0), solver="tridiag",
                delta_tol=1e-6 * n_poses, **kw)
            return res.poses, res.delta_sum, res.gn_iters
        return fn

    dr_err = np.asarray(po[:, :2]) - np.asarray(pt[:, :2])
    dr_rmse = float(np.sqrt((dr_err ** 2).sum(-1).mean()))
    variants = [
        ("reuse+stall", dict(stall_ratio=0.5)),  # production path
        ("reuse", dict()),
        ("one-shot", dict(reuse_factorization=False)),
        # Reference-semantics relinearization (Omega recomputed from the
        # current estimates, graph_based_slam.py:411-417): the full
        # per-iteration refactor vs the refactor-every-k fast path
        # (VERDICT r4 item 7: target <= 2x the frozen-Omega reuse path).
        ("relin full", dict(relinearize_omega=True,
                            reuse_factorization=False)),
        ("relin k=4", dict(relinearize_omega=True, refactor_every=4)),
    ]
    for name, kw in variants:
        fn = make_fn(**kw)
        t0 = time.perf_counter()
        poses, dsum, iters = fn(po, obs, el, rel_odom)
        float(dsum)
        log(f"[{name}] first call (compile+run): "
            f"{time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        poses, dsum, iters = fn(po, obs, el, rel_odom)
        float(dsum)
        dt = time.perf_counter() - t0
        err = np.asarray(poses[:, :2]) - np.asarray(pt[:, :2])
        rmse = float(np.sqrt((err ** 2).sum(-1).mean()))
        log(f"[{name}] {n_poses}-pose solve: {dt:.2f} s, GN iters="
            f"{int(iters)}, delta_sum {float(dsum):.3e}, RMSE {rmse:.3f} "
            f"(odometry-only {dr_rmse:.3f})")
    log("ALL DONE")


if __name__ == "__main__":
    main()
