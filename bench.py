#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): batched EKF-SLAM sim steps/sec on one
chip, target >= 1e6.  ``vs_baseline`` is the ratio against that target.
Secondary numbers (PF particle-step throughput, graph-SLAM solve latency)
go to stderr so stdout stays a single JSON line for the driver.

Timing note: each benchmarked function returns a SCALAR which is pulled to
the host inside the timed region - on this image's remote-tunneled TPU
platform ``block_until_ready`` returns before execution completes, so a
device->host transfer is the only reliable completion fence.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _time_scalar(fn, *args, reps=5):
    """Median wall time of float(fn(*args)) - transfer-fenced."""
    float(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def bench_ekf(batch=8192, steps=400):
    from tpuslam.filters import EkfConfig, ekf_rollout_batch

    cfg = EkfConfig()
    keys = jax.random.split(jax.random.key(0), batch)

    @jax.jit
    def fn(k):
        final, _ = ekf_rollout_batch(cfg, k, steps)
        return jnp.sum(final.x_hat) + jnp.sum(final.cov)

    dt = _time_scalar(fn, keys)
    return batch * steps / dt


def bench_pf(particles=100_000, steps=100):
    from tpuslam.filters import PfConfig, pf_init, pf_rollout

    cfg = PfConfig(num_particles=particles, weight_mode="log")

    @jax.jit
    def fn(k):
        final, _ = pf_rollout(cfg, k, steps)
        return jnp.sum(final.particles) + jnp.sum(final.weights)

    dt = _time_scalar(fn, jax.random.key(0))
    return particles * steps / dt


def bench_graph(n_steps=60):
    import math

    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import GraphConfig, SlamSceneConfig, graph_solve, \
        simulate

    cfg = GraphConfig(
        max_times=n_steps + 1, num_landmarks=9,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        guard="cheap")
    scene = SlamSceneConfig()
    traj = simulate(scene, cfg, jax.random.key(0), n_steps)

    @jax.jit
    def fn(p, o):
        res = graph_solve(cfg, p, o)
        return jnp.sum(res.poses) + res.delta_sum

    dt = _time_scalar(fn, traj.poses_odom, traj.obs)
    return dt


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform})", file=sys.stderr)

    ekf_rate = bench_ekf()
    print(f"# EKF: {ekf_rate:.3e} steps/s/chip", file=sys.stderr)
    try:
        pf_rate = bench_pf()
        print(f"# PF: {pf_rate:.3e} particle-steps/s/chip", file=sys.stderr)
    except Exception as e:  # secondary: never break the headline line
        print(f"# PF bench failed: {e}", file=sys.stderr)
    try:
        graph_dt = bench_graph()
        print(f"# graph solve (61 poses, full GN): {graph_dt*1e3:.1f} ms",
              file=sys.stderr)
    except Exception as e:
        print(f"# graph bench failed: {e}", file=sys.stderr)

    target = 1.0e6
    print(json.dumps({
        "metric": "batched EKF-SLAM sim steps/sec/chip",
        "value": ekf_rate,
        "unit": "steps/s",
        "vs_baseline": ekf_rate / target,
    }))


if __name__ == "__main__":
    main()
