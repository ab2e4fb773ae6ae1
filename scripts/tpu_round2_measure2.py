#!/usr/bin/env python
"""Round-2 follow-up measurements, one sequential process.

1. Wide batched PF at the fixed defaults (fire_cap=B, w_b=12): the
   round-1 regression configs 128x10k and 1024x10k.
2. Flat-solver scale: all four banded solvers at 100k poses, cr/tridiag
   at 1M (the round-2 flat-layout done-criterion).

The 64x100k wide-PF config is intentionally absent: its remote compile
wedged the tunnel twice (>28 min); profile it separately if needed.
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


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def wide_rate(batch, parts, steps=100):
    from tpuslam.filters import PfConfig
    from tpuslam.ops.pf_batch_pallas import pf_batch_wide_rollout

    cfg = PfConfig(num_particles=parts, weight_mode="log")

    @jax.jit
    def fn(k):
        final, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                            n_steps=steps)
        return (jnp.sum(final.particles) + jnp.sum(final.lse),
                jnp.sum(outs.resampled.any(axis=1)),
                jnp.sum(outs.resampled))

    dt = timed(lambda k: fn(k)[0], jax.random.key(0))
    _, fire_steps, fires = fn(jax.random.key(0))
    r = batch * parts * steps / dt
    log(f"wide {batch}x{parts}: {r:.3e} p-s/s ({dt*1e3/steps:.2f} "
        f"ms/step; {int(fire_steps)}/{steps} steps fire, "
        f"{int(fires)} filter-firings)")


def solver_scene(n_poses, n_lm=100, window=40):
    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import GraphConfig, make_large_scene, window_pairs

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
    log(f"{n_poses} poses: scene + {el.t_b.shape[0]} edges in "
        f"{time.perf_counter() - t0:.1f}s")
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))
    return cfg, pt, po, obs, el, rel_odom, window


def solver_run(solvers, n_poses, reps=3):
    from tpuslam.slam import graph_solve_banded

    cfg, pt, po, obs, el, rel_odom, window = solver_scene(n_poses)
    for solver in solvers:
        def fn(p, obs, el, rel_odom):
            res = graph_solve_banded(cfg, p, obs, el, band=window,
                                     rel_odom=rel_odom,
                                     odom_info=(100.0, 100.0, 100.0),
                                     solver=solver,
                                     delta_tol=1e-6 * n_poses)
            return (jnp.sum(res.poses) + res.delta_sum, res.gn_iters,
                    res.poses)

        jfn = jax.jit(fn)
        t0 = time.time()
        s, it, p_fin = jfn(po, obs, el, rel_odom)
        s = float(s)
        log(f"{solver} @ {n_poses}: compile+first {time.time()-t0:.1f}s "
            f"gn_iters={int(it)}")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jfn(po, obs, el, rel_odom)[0])
            ts.append(time.perf_counter() - t0)
        p_np = np.asarray(p_fin)
        rmse = np.sqrt(((p_np[:, :2] - np.asarray(pt[:, :2])) ** 2)
                       .sum(-1).mean())
        log(f"{solver} @ {n_poses}: {min(ts):.3f}s "
            f"({min(ts)/max(int(it),1):.3f}s/GN iter), RMSE {rmse:.3f}")


def main():
    log(f"devices: {jax.devices()}")
    wide_rate(128, 10_000)
    wide_rate(1024, 10_000)
    solver_run(("cr", "tridiag", "cholesky", "cg"), 100_000)
    solver_run(("cr", "tridiag"), 1_000_000, reps=1)
    log("ALL DONE")


if __name__ == "__main__":
    main()
