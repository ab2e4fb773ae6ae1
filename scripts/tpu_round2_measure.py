"""Round-2 TPU measurements (one v5e chip via the tunnel).

1. PF 1M fused rollout with the in-kernel boundary build (fused pass 1)
   vs the round-1 XLA boundary build - the VERDICT item-1 payoff.
2. Isolated merge-resample latency, fused vs unfused pass 1.
3. 10k-pose graph solve with relinearize_omega True/False (VERDICT 7).
4. Demo course with guard="full" vs "cheap" (VERDICT 8).

Timing by host-pulled scalars (block_until_ready is a no-op on the
tunneled platform).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def pf_rollout_bench(particles, steps, fused):
    """Fused PF rollout; `fused` switches the resample boundary build.

    Carried-state benchmark (the cond over scan state is free; a cond
    over closed-over constants costs ~26 ms/iter on this platform).
    """
    import tpuslam.ops.resample_pallas as rp
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout

    orig = rp.merge_resample_rows
    if not fused:
        import functools

        def unfused(key, p_rows, w_row, n, **kw):
            kw["fused"] = False
            return orig(key, p_rows, w_row, n, **kw)
        rp.merge_resample_rows = unfused
    try:
        cfg = PfConfig(num_particles=particles, weight_mode="log",
                       resample_method="merge")

        @jax.jit
        def fn(k):
            final, _ = pf_fused_rollout(cfg, k, steps)
            return jnp.sum(final.particles) + jnp.sum(final.weights)

        dt = timed(fn, jax.random.key(0))
    finally:
        rp.merge_resample_rows = orig
    return particles * steps / dt, dt


def resample_micro(n, n_pad, fused, reps=20):
    """Isolated resample latency on a gate-firing weight profile,
    inside a scan carrying the particle rows (avoids the cond-capture
    trap; see CLAUDE.md)."""
    from tpuslam.ops.resample_pallas import merge_resample_rows

    rng = np.random.default_rng(0)
    lw = rng.normal(size=n_pad) * 8.0
    lw[n:] = -np.inf
    w = np.exp(lw - lw[:n].max())
    w /= w.sum()
    w[n:] = 0.0
    w_row = jnp.asarray(w, jnp.float32)[None]
    p = jnp.asarray(rng.normal(size=(3, n_pad)), jnp.float32)

    @jax.jit
    def fn(p0, w0):
        def body(carry, k):
            pc = merge_resample_rows(k, carry, w0, n, fused=fused)
            return pc, ()
        keys = jax.random.split(jax.random.key(0), 10)
        out, _ = jax.lax.scan(body, p0, keys)
        return jnp.sum(out)

    dt = timed(fn, p, w_row, reps=reps)
    return dt / 10.0


def graph_10k(relin):
    import math

    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    n_poses, n_lm, window = 10_000, 1000, 40
    cfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_lm, max_gn_iters=10,
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
                                 solver="cr", delta_tol=1e-6 * n_poses,
                                 relinearize_omega=relin)
        return jnp.sum(res.poses) + res.delta_sum

    jfn = jax.jit(fn)
    dt = timed(jfn, po, obs, el, rel_odom, reps=3)

    def iters_fn(p, obs, el, rel_odom):
        res = graph_solve_banded(cfg, p, obs, el, band=window,
                                 rel_odom=rel_odom,
                                 odom_info=(100.0, 100.0, 100.0),
                                 solver="cr", delta_tol=1e-6 * n_poses,
                                 relinearize_omega=relin)
        return res.gn_iters.astype(jnp.float32)

    iters = float(jax.jit(iters_fn)(po, obs, el, rel_odom))
    return dt, iters


def demo_course(guard):
    import math

    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import GraphConfig, SlamSceneConfig, slam_rollout

    cfg = GraphConfig(
        max_times=19, num_landmarks=9,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        guard=guard)
    scene = SlamSceneConfig()

    @jax.jit
    def fn(k):
        traj, poses_est, frames = slam_rollout(scene, cfg, k, 18)
        return jnp.sum(poses_est) + jnp.sum(frames.delta_sum)

    return timed(fn, jax.random.key(0))


def fused_equality_smoke():
    from tpuslam.ops.resample_pallas import merge_resample_rows

    n, n_pad = 5000, 8192
    rng = np.random.default_rng(0)
    lw = rng.normal(size=n_pad) * 8.0
    lw[n:] = -np.inf
    w = np.exp(lw - lw[:n].max())
    w /= w.sum()
    w[n:] = 0
    w_row = jnp.asarray(w, jnp.float32)[None]
    p = jnp.asarray(rng.normal(size=(3, n_pad)), jnp.float32)
    key = jax.random.key(5)
    a = merge_resample_rows(key, p, w_row, n, fused=True)
    b = merge_resample_rows(key, p, w_row, n, fused=False)
    print("fused==unfused on TPU:", bool(jnp.all(a == b)))


def wide_batch_bench(batch, particles, steps):
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_wide_rollout

    cfg = PfConfig(num_particles=particles, weight_mode="log")

    @jax.jit
    def fn(k):
        final, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                            n_steps=steps)
        return jnp.sum(final.particles) + jnp.sum(outs.x_est)

    dt = timed(fn, jax.random.key(0), reps=3)
    return batch * particles * steps / dt


def main():
    # Section selection: `python tpu_round2_measure.py [pf wide micro
    # graph demo]` - default all.  Lets a hung section be excluded on
    # re-runs (the tunnel wedges ~1 h if a client is killed mid-flight).
    sections = set(sys.argv[1:]) or {"pf", "wide", "micro", "graph",
                                     "demo"}
    print("device:", jax.devices()[0], flush=True)

    if "graph" in sections:
        for relin in (False, True):
            dt, iters = graph_10k(relin)
            print(f"graph 10k CR solve, relinearize_omega={relin}: "
                  f"{dt:.3f} s, {iters:.0f} GN iters", flush=True)

    if "demo" in sections:
        for guard in ("cheap", "full"):
            dt = demo_course(guard)
            print(f"demo course 18 frames, guard={guard}: "
                  f"{dt*1e3:.1f} ms", flush=True)

    if "pf" not in sections and "wide" not in sections \
            and "micro" not in sections:
        return

    fused_equality_smoke()

    if "pf" in sections:
        for fused in (True, False):
            rate, dt = pf_rollout_bench(1_000_000, 100, fused)
            print(f"PF 1M fused rollout, boundary fused={fused}: "
                  f"{rate:.3e} particle-steps/s "
                  f"({dt*1e3/100:.2f} ms/step)", flush=True)

    if "wide" in sections:
        for batch, parts in ((128, 10_000), (1024, 10_000),
                             (64, 100_000)):
            try:
                rate = wide_batch_bench(batch, parts, 100)
                print(f"PF wide batch {batch}x{parts}: "
                      f"{rate:.3e} particle-steps/s", flush=True)
            except Exception as e:
                print(f"PF wide batch {batch}x{parts} failed: {e}",
                      flush=True)

    if "micro" in sections:
        for fused in (True, False):
            dt = resample_micro(1_000_000, 1 << 20, fused)
            print(f"merge resample 1M isolated, fused={fused}: "
                  f"{dt*1e3:.2f} ms/resample", flush=True)


if __name__ == "__main__":
    main()
