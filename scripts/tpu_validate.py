#!/usr/bin/env python
"""Serial TPU validation/benchmark script.

Runs every TPU-dependent check in one process (the tunneled TPU is
single-tenant and killed clients can wedge it for an hour+ - see
CLAUDE.md), logging progress line-by-line so an external watcher can
follow along.  Run detached:

    nohup python scripts/tpu_validate.py > /tmp/tpu_validate.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage(name):
    def deco(fn):
        def wrapped():
            log(f"--- {name} ---")
            t0 = time.time()
            try:
                fn()
                log(f"{name}: OK in {time.time() - t0:.1f}s")
            except Exception as e:
                log(f"{name}: FAILED: {type(e).__name__}: {e}")
                traceback.print_exc()
        return wrapped
    return deco


@stage("warmup")
def warmup():
    log(f"devices: {jax.devices()}")
    log(f"1+1 = {float(jnp.ones(()) + 1)}")


@stage("ekf_pallas")
def ekf_pallas():
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_rollout

    cfg = EkfConfig()

    def run(seed):
        _, err = ekf_fused_rollout(cfg, seed, batch=2097152,
                                   n_steps=400, tile_b=8192)
        return float(err.sum())

    run(0)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        run(1)
        ts.append(time.perf_counter() - t0)
    log(f"EKF pallas: {2097152 * 400 / min(ts):.3e} steps/s")


@stage("pf_fused")
def pf_fused():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout

    cfg = PfConfig(num_particles=100_000, weight_mode="log",
                   resample_method="merge")

    @jax.jit
    def fused(k):
        final, (xt, xe) = pf_fused_rollout(cfg, k, 100)
        return jnp.sum(jnp.square(xe[:, :2] - xt[:, :2])) / 100

    mse = float(fused(jax.random.key(0)))
    log(f"PF fused rmse: {mse ** 0.5:.3f}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fused(jax.random.key(1)))
        ts.append(time.perf_counter() - t0)
    log(f"PF fused: {100_000 * 100 / min(ts):.3e} particle-steps/s")


@stage("pf_merge_1m")
def pf_merge_1m():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout
    from tpuslam.ops.resample_pallas import (decode_indices,
                                             merge_resample_rows,
                                             slot_boundaries)

    # On-device bit-exactness of the merge kernel vs the XLA decode.
    n = 100_000
    n_pad = -(-n // 2048) * 2048
    key = jax.random.key(0)
    lw = jax.random.normal(jax.random.fold_in(key, 1), (n_pad,),
                           jnp.float32) * 8.0
    lw = jnp.where(jnp.arange(n_pad) < n, lw, -jnp.inf)
    w = jnp.exp(lw - jnp.max(lw))
    w_row = (w / jnp.sum(w))[None, :]
    p = jax.random.normal(jax.random.fold_in(key, 2), (3, n_pad),
                          jnp.float32)
    kr = jax.random.fold_in(key, 3)
    out = merge_resample_rows(kr, p, w_row, n)

    @jax.jit
    def oracle(kr, p, w_row):
        offs = jax.random.uniform(kr, dtype=jnp.float32)
        idx = decode_indices(slot_boundaries(w_row, n, offs), n)
        return jnp.zeros_like(p).at[:, :n].set(p[:, :n][:, idx])

    d = np.abs(np.asarray(out) - np.asarray(oracle(kr, p, w_row)))
    assert d.max() == 0.0, d.max()
    log("merge resample: bit-exact vs decode on device")

    cfg = PfConfig(num_particles=1_000_000, weight_mode="log",
                   resample_method="merge")

    @jax.jit
    def roll(k):
        final, _ = pf_fused_rollout(cfg, k, 100)
        return jnp.sum(final.particles)

    float(roll(jax.random.key(0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(roll(jax.random.key(1)))
        ts.append(time.perf_counter() - t0)
    log(f"PF fused 1M [merge]: {1e6 * 100 / min(ts):.3e} "
        f"particle-steps/s")


@stage("pf_batch")
def pf_batch():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_rollout

    cfg = PfConfig(num_particles=1000, weight_mode="log")
    final, outs = jax.jit(lambda k: pf_batch_rollout(
        cfg, k, batch=64, n_steps=100))(jax.random.key(0))
    err = (np.asarray(outs.x_est)[20:, :, :2]
           - np.asarray(outs.x_true)[20:, None, :2])
    rmse = float(np.sqrt((err ** 2).sum(-1).mean()))
    assert rmse < 0.5, rmse
    assert not np.asarray(outs.bad).any()
    log(f"PF batch 64x1000 RMSE {rmse:.3f}, "
        f"fire-rate {float(np.asarray(outs.resampled).mean()):.2f}")

    @jax.jit
    def roll(k):
        final, outs = pf_batch_rollout(cfg, k, batch=1024, n_steps=100)
        return jnp.sum(outs.x_est)

    float(roll(jax.random.key(0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(roll(jax.random.key(1)))
        ts.append(time.perf_counter() - t0)
    log(f"PF batch 1024x1000: {1024 * 1000 * 100 / min(ts):.3e} "
        f"particle-steps/s")


@stage("ekf_nees")
def ekf_nees():
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_rollout

    _, err, nees = ekf_fused_rollout(EkfConfig(), 3, batch=8192,
                                     n_steps=360, tile_b=2048,
                                     with_nees=True)
    m = float(jnp.mean(nees) / 360)
    rmse = float(jnp.sqrt(jnp.mean(err) / 360))
    assert 0.5 < m < 8.0, m
    assert 0.2 < rmse < 0.6, rmse
    log(f"EKF 8192x360: RMSE {rmse:.3f}, mean NEES {m:.2f} "
        f"(XLA-path reference ~1.1)")


@stage("pf_scan")
def pf_scan():
    from tpuslam.filters import PfConfig, pf_rollout

    cfg = PfConfig(num_particles=100_000, weight_mode="log")

    @jax.jit
    def fn(k):
        final, outs = pf_rollout(cfg, k, 100)
        return jnp.sum(jnp.square(outs.x_est[:, :2]
                                  - outs.x_true[:, :2])) / 100

    mse = float(fn(jax.random.key(0)))
    log(f"PF scan rmse: {mse ** 0.5:.3f}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(jax.random.key(1)))
        ts.append(time.perf_counter() - t0)
    log(f"PF scan: {100_000 * 100 / min(ts):.3e} particle-steps/s")


@stage("graph_10k")
def graph_10k():
    import math

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
    t0 = time.time()
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses, n_lm,
                                   radius=3000.0, odom_noise=0.1)
    valid = np.asarray(obs.valid)
    log(f"scene in {time.time() - t0:.1f}s; sightings={valid.sum()}")
    el = window_pairs(valid, window=window)
    log(f"edges: {el.t_b.shape[0]}")
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    for solver in ("cr", "tridiag", "cholesky", "cg"):
        @jax.jit
        def fn(p, obs, el, rel_odom, sv=solver):
            res = graph_solve_banded(cfg, p, obs, el, band=window,
                                     rel_odom=rel_odom,
                                     odom_info=(100.0, 100.0, 100.0),
                                     solver=sv,
                                     delta_tol=1e-6 * n_poses)
            return jnp.sum(res.poses) + res.delta_sum

        t0 = time.time()
        float(fn(po, obs, el, rel_odom))
        log(f"{solver}: compile+first solve {time.time() - t0:.1f}s")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(po, obs, el, rel_odom))
            ts.append(time.perf_counter() - t0)
        log(f"{solver}: 10k-pose solve {min(ts):.3f}s (target < 1 s)")


@stage("demo_course")
def demo_course():
    import bench

    dt = bench.bench_graph()
    log(f"reference demo course (18 frames): {dt*1e3:.1f} ms "
        f"(reference wall: 36000 ms)")


@stage("bench_json")
def bench_json():
    import subprocess
    import sys

    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, timeout=3000)
    log(f"bench stderr:\n{out.stderr[-2000:]}")
    log(f"bench stdout: {out.stdout.strip()}")


if __name__ == "__main__":
    warmup()
    ekf_pallas()
    ekf_nees()
    pf_fused()
    pf_merge_1m()
    pf_batch()
    pf_scan()
    graph_10k()
    demo_course()
    log("ALL DONE")
