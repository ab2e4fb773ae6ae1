#!/usr/bin/env python
"""Validate + measure the compact-then-expand batched-PF firing path.

Round-3 floor profile (scripts/tpu_pf_batch_floor.py): 8192x1000 default
gate = 9.75 ms/step = never-fire 6.08 ms + 0.188 fire-rate x 8192
filters x 2.35 us/firing-filter.  The compact path shrinks both interval
masks P*P -> P*t_k and the value dot's contraction P -> t_k; target
>= 1e9 particle-steps/s (VERDICT r2 item 7).

Checks first that cap=128 bit-matches cap=0 on NOISY on-chip streams
(real pltpu PRNG, real firing bursts), then sweeps throughput.
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

    # ---- noisy bit-equivalence on-chip --------------------------------
    b = 256
    res = {}
    for cap in (0, 128):
        f, o = jax.jit(lambda k, cap=cap: pf_batch_rollout(
            cfg, k, batch=b, n_steps=steps, compact_cap=cap))(
                jax.random.key(0))
        res[cap] = (np.asarray(f.particles), np.asarray(f.log_w),
                    np.asarray(o.x_est), np.asarray(o.resampled))
    for cap in (128,):
        eq = [np.array_equal(res[0][i], res[cap][i]) for i in range(3)]
        log(f"cap={cap} vs cap=0 (noisy {b}x1000x{steps}): "
            f"particles={eq[0]} log_w={eq[1]} x_est={eq[2]}")
        assert all(eq), f"cap={cap} diverged"
    log(f"fire-rate: {res[0][3].mean():.3f}")

    # ---- throughput ----------------------------------------------------
    for b in (8192,):
        for cap in (128, 256):
            @jax.jit
            def roll(k, b=b, cap=cap):
                final, outs = pf_batch_rollout(cfg, k, batch=b,
                                               n_steps=steps,
                                               compact_cap=cap)
                return jnp.sum(final.particles) + jnp.sum(outs.x_est)

            dt = timed(roll, jax.random.key(2))
            rate = b * cfg.num_particles * steps / dt
            log(f"B={b} cap={cap}: {rate:.3e} particle-steps/s "
                f"({dt / steps * 1e3:.3f} ms/step)")

    # ---- always-fire ceiling (per-firing-filter cost) ------------------
    import dataclasses
    acfg = dataclasses.replace(cfg, ess_threshold_frac=1.0)
    for cap in (0, 128):
        @jax.jit
        def roll(k, cap=cap):
            final, outs = pf_batch_rollout(acfg, k, batch=8192,
                                           n_steps=steps,
                                           compact_cap=cap)
            return jnp.sum(final.particles) + jnp.sum(outs.x_est)

        dt = timed(roll, jax.random.key(2))
        log(f"always-fire B=8192 cap={cap}: {dt / steps * 1e3:.3f} ms/step")

    log("ALL DONE")


if __name__ == "__main__":
    main()
