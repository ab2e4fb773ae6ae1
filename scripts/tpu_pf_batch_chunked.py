#!/usr/bin/env python
"""Validate + bench the CHUNKED batched-PF kernel on the real TPU.

Round-3 change: _pf_batch_kernel serves G filters per grid cell
(per-filter gate/resample via unrolled @pl.when, vectorized pass C,
per-sub-filter PRNG re-seeding) to amortize the ~0.5 us per-cell fixed
cost that floored the 8192-filter sweep at ~4 ms/step.

Checks: (a) NOISY g=8 rollout matches g=1 on particles/estimates
(same per-filter PRNG streams; normalizer to 1 ulp), (b) throughput
sweep at 1024/4096/8192 x 1000 for g=1 vs auto (target: 8192x1000
>= 1e9 particle-steps/s, VERDICT r2 item 7; round-2 floor 6.92e8).
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
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_rollout

    log(f"devices: {jax.devices()}")
    cfg = PfConfig(num_particles=1000, weight_mode="log")
    steps = 100

    # ---- noisy g-equivalence (the real chip runs the pltpu PRNG) ------
    b = 64
    f1, o1 = jax.jit(lambda k: pf_batch_rollout(
        cfg, k, batch=b, n_steps=steps, filters_per_cell=1))(
            jax.random.key(0))
    f8, o8 = jax.jit(lambda k: pf_batch_rollout(
        cfg, k, batch=b, n_steps=steps, filters_per_cell=8))(
            jax.random.key(0))
    p_eq = np.array_equal(np.asarray(f1.particles),
                          np.asarray(f8.particles))
    e_eq = np.array_equal(np.asarray(o1.x_est), np.asarray(o8.x_est))
    lw_close = np.allclose(np.asarray(f1.log_w), np.asarray(f8.log_w),
                           atol=1e-4)
    log(f"g=8 vs g=1 (noisy, {b}x1000x{steps}): particles_equal={p_eq} "
        f"x_est_equal={e_eq} log_w_close={lw_close}")
    err = (np.asarray(o8.x_est)[20:, :, :2]
           - np.asarray(o8.x_true)[20:, None, :2])
    log(f"g=8 RMSE={np.sqrt((err ** 2).sum(-1).mean()):.3f} "
        f"fire-rate={float(np.asarray(o8.resampled).mean()):.2f}")
    assert p_eq and e_eq and lw_close

    # ---- throughput sweep ---------------------------------------------
    for b in (1024, 4096, 8192):
        for g in (1, None):
            @jax.jit
            def roll(k, b=b, g=g):
                final, outs = pf_batch_rollout(cfg, k, batch=b,
                                               n_steps=steps,
                                               filters_per_cell=g)
                return jnp.sum(final.particles) + jnp.sum(outs.x_est)

            dt = timed(roll, jax.random.key(2))
            rate = b * cfg.num_particles * steps / dt
            log(f"B={b} g={'auto' if g is None else g}: {rate:.3e} "
                f"particle-steps/s ({dt / steps * 1e3:.3f} ms/step)")

    log("ALL DONE")


if __name__ == "__main__":
    main()
