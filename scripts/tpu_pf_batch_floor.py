#!/usr/bin/env python
"""Decompose the 8192x1000 chunked batched-PF step-time floor.

Round-3 residual: g=8 chunking lifted 6.92e8 -> 8.40e8 particle-steps/s
(VERDICT r2 item 7 target: 1e9).  This profiler splits the ~9.7 ms step
into (a) the never-fire base (predict + loglik + stats + grid), (b) the
per-firing-filter resample cost (mask build + one-hot dots), and (c)
PRNG cost, by sweeping the ESS gate and noise flags:

  - gate=never  (ess_threshold_frac=0):  base cost
  - gate=default (1/100):                production point + fire rate
  - gate=always (1.0):                   resample-saturated ceiling
  - noise_on=False at gate=never:        base minus on-core PRNG

per-fire-cost = (t_always - t_never) / B; the default point should obey
t_default ~= t_never + fire_rate * B * per_fire.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import dataclasses

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
    b, n, steps = 8192, 1000, 100
    base_cfg = PfConfig(num_particles=n, weight_mode="log")

    # fire rate at the default gate
    @jax.jit
    def fire_rate(k):
        _, outs = pf_batch_rollout(base_cfg, k, batch=256, n_steps=steps)
        return jnp.mean(outs.resampled.astype(jnp.float32))

    fr = float(fire_rate(jax.random.key(0)))
    log(f"default-gate fire rate (256x1000x{steps}): {fr:.3f}")

    results = {}
    for label, frac, noise, g in (
            ("never g=8", 0.0, True, None),
            ("never g=8 no-noise", 0.0, False, None),
            ("default g=8", None, True, None),
            ("always g=8", 1.0, True, None),
            ("always g=1", 1.0, True, 1),
            ("default g=4", None, True, 4),
            ("default g=16", None, True, 16),
    ):
        cfg = (base_cfg if frac is None else
               dataclasses.replace(base_cfg, ess_threshold_frac=frac))

        @jax.jit
        def roll(k, cfg=cfg, noise=noise, g=g):
            final, outs = pf_batch_rollout(
                cfg, k, batch=b, n_steps=steps, noise_on=noise,
                filters_per_cell=g)
            return jnp.sum(final.particles) + jnp.sum(outs.x_est)

        try:
            dt = timed(roll, jax.random.key(2))
        except Exception as e:  # g=16 may not lower
            log(f"{label:24s}: FAILED {type(e).__name__}: {e}")
            continue
        rate = b * n * steps / dt
        results[label] = dt / steps
        log(f"{label:24s}: {rate:.3e} p-steps/s "
            f"({dt / steps * 1e3:.3f} ms/step)")

    if "always g=8" in results and "never g=8" in results:
        per_fire = (results["always g=8"] - results["never g=8"]) / b
        log(f"per-firing-filter resample cost: {per_fire * 1e6:.3f} us")
        if "default g=8" in results:
            pred = results["never g=8"] + fr * b * per_fire
            log(f"default predicted {pred * 1e3:.3f} ms/step vs measured "
                f"{results['default g=8'] * 1e3:.3f}")
    if "never g=8" in results and "never g=8 no-noise" in results:
        log(f"PRNG cost: {(results['never g=8'] - results['never g=8 no-noise']) * 1e3:.3f} ms/step")
    log("ALL DONE")


if __name__ == "__main__":
    main()
