#!/usr/bin/env python
"""Round-3 measurements on one TPU v5e chip.

1. PF fused-rollout scaling past 1M particles (2M / 4M).
2. EKF fused-rollout scaling past 2M rollouts (4M / 8M).
3. Batched PF at 8192 x 1000 filters.
4. The per-step-controls demo course (new API) end-to-end on TPU.

Timing: transfer-fenced (float() pulls a scalar; block_until_ready is a
no-op on the tunneled platform).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *a, reps=3):
    float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def pf_scale():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout

    for n in (1 << 21, 1 << 22):
        cfg = PfConfig(num_particles=n, weight_mode="log",
                       resample_method="merge")

        @jax.jit
        def fn(k):
            final, _ = pf_fused_rollout(cfg, k, 100)
            return jnp.sum(final.particles) + jnp.sum(final.weights)

        dt = timed(fn, jax.random.key(0))
        log(f"PF fused merge {n} particles x 100 steps: {dt:.3f} s "
            f"({n * 100 / dt:.3e} particle-steps/s)")


def ekf_scale():
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_rollout

    cfg = EkfConfig()
    for b in (1 << 22, 1 << 23):
        def fn(seed, b=b):
            final, err = ekf_fused_rollout(cfg, seed, batch=b,
                                           n_steps=400, tile_b=2048)
            return jnp.sum(err)

        dt = timed(fn, 1)
        log(f"EKF fused {b} rollouts x 400 steps: {dt:.3f} s "
            f"({b * 400 / dt:.3e} steps/s)")


def pf_batch_scale():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_rollout

    cfg = PfConfig(num_particles=1000, weight_mode="log")

    @jax.jit
    def fn(k):
        final, outs = pf_batch_rollout(cfg, k, batch=8192, n_steps=100)
        return jnp.sum(final.particles) + jnp.sum(outs.x_est)

    dt = timed(fn, jax.random.key(0))
    log(f"batched PF 8192 x 1000 x 100 steps: {dt:.3f} s "
        f"({8192 * 1000 * 100 / dt:.3e} particle-steps/s)")


def controls_course():
    import math

    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import GraphConfig, SlamSceneConfig, slam_rollout

    n = 18
    cfg = GraphConfig(
        max_times=n + 1, num_landmarks=9,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        guard="full")
    scene = SlamSceneConfig()
    w = scene.yaw_rate
    u = jnp.asarray([[scene.vel * (1.0 + 0.2 * (i % 3)),
                      w if i < 9 else -w] for i in range(n)], jnp.float32)

    @jax.jit
    def fn(k):
        traj, poses_est, frames = slam_rollout(scene, cfg, k, n,
                                               controls=u)
        return (jnp.sum(poses_est)
                + jnp.sum(frames.is_calc.astype(jnp.float32)))

    dt = timed(fn, jax.random.key(0))
    traj, poses_est, frames = jax.jit(
        lambda k: slam_rollout(scene, cfg, k, n, controls=u))(
            jax.random.key(0))
    ok = np.asarray(frames.is_calc)
    log(f"controls-course (18 frames, wavy, full guards): {dt*1e3:.1f} ms"
        f", frames converged {ok.sum()}/{n}")


def main():
    log(f"devices: {jax.devices()}")
    pf_scale()
    ekf_scale()
    pf_batch_scale()
    controls_course()
    log("ALL DONE")


if __name__ == "__main__":
    main()
