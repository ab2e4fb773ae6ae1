"""Round-2 solver-scale measurements (one v5e chip).

1. CR-flat vs tridiag-flat at 100k poses (VERDICT item-2 done criterion:
   100k CR time <= tridiag-flat).
2. CR-flat at 1M poses (no OOM).

Run separately from tpu_round2_measure.py to keep program sizes sane.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def solve_bench(n_poses, solver, window=40, n_lm=1000, gn_iters=3):
    import math

    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    cfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_lm, max_gn_iters=gn_iters,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses, n_lm,
                                   radius=0.3 * n_poses, odom_noise=0.1)
    el = window_pairs(np.asarray(obs.valid), window=window)
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    def fn(p, obs, el, rel_odom):
        res = graph_solve_banded(cfg, p, obs, el, band=window,
                                 rel_odom=rel_odom,
                                 odom_info=(100.0, 100.0, 100.0),
                                 solver=solver,
                                 delta_tol=1e-6 * n_poses)
        return jnp.sum(res.poses) + res.delta_sum

    jfn = jax.jit(fn)
    dt = timed(jfn, po, obs, el, rel_odom)
    return dt, el.t_b.shape[0]


def main():
    print("device:", jax.devices()[0], flush=True)
    for n, solver in ((10_000, "cr"), (10_000, "tridiag"),
                      (100_000, "cr"), (100_000, "tridiag")):
        dt, n_edges = solve_bench(n, solver)
        print(f"graph solve {n} poses ({n_edges} edges), {solver}: "
              f"{dt:.3f} s (3 GN iters)", flush=True)
    for n, solver in ((1_000_000, "cr"),):
        try:
            dt, n_edges = solve_bench(n, solver, gn_iters=2)
            print(f"graph solve {n} poses ({n_edges} edges), {solver}: "
                  f"{dt:.3f} s (2 GN iters)", flush=True)
        except Exception as e:
            print(f"graph solve {n} {solver} FAILED: {type(e).__name__} "
                  f"{e}", flush=True)


if __name__ == "__main__":
    main()
