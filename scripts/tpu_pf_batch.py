#!/usr/bin/env python
"""Validate + bench the batched fused PF kernel on the real TPU.

Compares pf_batch_rollout (one filter per tile, in-tile resample) against
the vmapped XLA path (filters/pf.py::pf_rollout_batch) at the reference's
own scale: B x 1000-particle filters.  Checks tracking RMSE parity
(distributional - different RNG streams) and measures throughput.
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


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from tpuslam.filters import PfConfig, pf_rollout_batch
    from tpuslam.ops import pf_batch_rollout

    log(f"devices: {jax.devices()}")
    steps = 100

    # ---- tracking parity at small scale (full outputs pulled) ---------
    cfg = PfConfig(num_particles=1000, weight_mode="log")
    b = 64
    final, outs = jax.jit(lambda k: pf_batch_rollout(
        cfg, k, batch=b, n_steps=steps))(jax.random.key(0))
    x_est = np.asarray(outs.x_est)
    x_true = np.asarray(outs.x_true)
    err = x_est[20:, :, :2] - x_true[20:, None, :2]
    rmse_k = float(np.sqrt((err ** 2).sum(-1).mean()))
    fired = float(np.asarray(outs.resampled).mean())
    log(f"fused batch ({b}x1000): RMSE={rmse_k:.3f} "
        f"fire-rate={fired:.2f} bad={int(np.asarray(outs.bad).sum())}")

    keys = jax.random.split(jax.random.key(1), b)
    _, outs_x = jax.jit(lambda k: pf_rollout_batch(cfg, k, steps))(keys)
    err_x = (np.asarray(outs_x.x_est)[:, 20:, :2]
             - np.asarray(outs_x.x_true)[:, 20:, :2])
    rmse_x = float(np.sqrt((err_x ** 2).sum(-1).mean()))
    log(f"xla vmapped  ({b}x1000): RMSE={rmse_x:.3f}")
    assert rmse_k < max(2.0 * rmse_x, 0.5), (rmse_k, rmse_x)

    # ---- throughput at sweep scale ------------------------------------
    for b in (256, 1024, 4096):
        @jax.jit
        def roll_k(k):
            final, outs = pf_batch_rollout(cfg, k, batch=b,
                                           n_steps=steps)
            return jnp.sum(final.particles) + jnp.sum(outs.x_est)

        dt = timed(roll_k, jax.random.key(2))
        rate = b * cfg.num_particles * steps / dt
        log(f"fused batch B={b}: {rate:.3e} particle-steps/s "
            f"({dt / steps * 1e3:.3f} ms/step)")

    for b in (256, 1024):
        keys = jax.random.split(jax.random.key(3), b)

        @jax.jit
        def roll_x(keys):
            final, outs = pf_rollout_batch(cfg, keys, steps)
            return jnp.sum(final.particles) + jnp.sum(outs.x_est)

        dt = timed(roll_x, keys)
        rate = b * cfg.num_particles * steps / dt
        log(f"xla vmapped B={b}: {rate:.3e} particle-steps/s "
            f"({dt / steps * 1e3:.3f} ms/step)")

    log("ALL DONE")


if __name__ == "__main__":
    main()
