#!/usr/bin/env python
"""Scaling sweep on one chip: prints a markdown table for STATUS.md."""

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


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def ekf_sweep():
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_rollout

    cfg = EkfConfig()
    rows = []
    for batch in (8192, 131072, 2097152):
        def fn(seed):
            _, err = ekf_fused_rollout(cfg, seed, batch=batch,
                                       n_steps=400,
                                       tile_b=min(8192, batch))
            return jnp.sum(err)

        dt = timed(fn, 1)
        rate = batch * 400 / dt
        rows.append((batch, rate))
        log(f"EKF fused batch={batch}: {rate:.3e} steps/s")
    return rows


def pf_sweep():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout

    rows = []
    for n in (10_000, 100_000, 1_000_000):
        cfg = PfConfig(num_particles=n, weight_mode="log",
                       resample_method="merge")

        @jax.jit
        def fn(k):
            final, _ = pf_fused_rollout(cfg, k, 100)
            return jnp.sum(final.particles) + jnp.sum(final.weights)

        dt = timed(fn, jax.random.key(0))
        rate = n * 100 / dt
        rows.append((n, rate))
        log(f"PF fused NP={n}: {rate:.3e} particle-steps/s")
    return rows


def pf_batch_sweep():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_rollout

    cfg = PfConfig(num_particles=1000, weight_mode="log")
    rows = []
    for b in (256, 1024, 4096):
        @jax.jit
        def fn(k):
            final, outs = pf_batch_rollout(cfg, k, batch=b, n_steps=100)
            return jnp.sum(final.particles) + jnp.sum(outs.x_est)

        dt = timed(fn, jax.random.key(0))
        rate = b * 1000 * 100 / dt
        rows.append((b, rate))
        log(f"PF batch B={b}x1000: {rate:.3e} particle-steps/s")
    return rows


def solve_sweep():
    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    rows = []
    for n_poses, n_lm in ((1000, 100), (10000, 1000), (100000, 1000)):
        window = 40
        cfg = GraphConfig(
            max_times=n_poses, num_landmarks=n_lm, max_gn_iters=10,
            scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                            dist_gain=0.05, dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)),
            exact_jacobians=True)
        chunk = 10_000 if n_poses >= 100_000 else None
        pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses,
                                       n_lm, radius=0.3 * n_poses,
                                       odom_noise=0.1, scan_chunk=chunk)
        el = window_pairs(np.asarray(obs.valid), window=window)
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

        for solver in ("cr", "tridiag"):
            @jax.jit
            def fn(p, obs, el, rel_odom, sv=solver):
                res = graph_solve_banded(
                    cfg, p, obs, el, band=window, rel_odom=rel_odom,
                    odom_info=(100.0, 100.0, 100.0), solver=sv,
                    delta_tol=0.01 / 18 * n_poses)
                return jnp.sum(res.poses) + res.delta_sum

            dt = timed(fn, po, obs, el, rel_odom, reps=2)
            rows.append((n_poses, solver, el.t_b.shape[0], dt))
            log(f"solve T1={n_poses} {solver}: {dt:.3f}s "
                f"({el.t_b.shape[0]} edges)")
    return rows


def main():
    log(f"devices: {jax.devices()}")
    e = ekf_sweep()
    p = pf_sweep()
    pb = pf_batch_sweep()
    s = solve_sweep()
    print("\n| Workload | Scale | Rate / latency |")
    print("|---|---|---|")
    for b, r in e:
        print(f"| EKF fused rollout (400 steps) | {b} rollouts | "
              f"{r:.2e} steps/s |")
    for n, r in p:
        print(f"| PF fused rollout (100 steps) | {n} particles | "
              f"{r:.2e} particle-steps/s |")
    for b, r in pb:
        print(f"| Batched fused PF (100 steps) | {b} x 1000 particles | "
              f"{r:.2e} particle-steps/s |")
    for n, sv, ne, dt in s:
        print(f"| graph solve ({sv}, GN to tol) | {n} poses, {ne} edges "
              f"| {dt:.3f} s |")
    log("ALL DONE")


if __name__ == "__main__":
    main()
