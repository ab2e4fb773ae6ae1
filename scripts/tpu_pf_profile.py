#!/usr/bin/env python
"""Isolate PF step costs on TPU: resample frequency + component floors."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
    return min(ts)


def main():
    log(f"devices: {jax.devices()}")
    from tpuslam.filters import PfConfig
    from tpuslam.ops.pf_pallas import (pf_fused_init, pf_fused_step_stats,
                                       _pf_stats_call, _padded)

    n, steps = int(os.environ.get("PF_N", 1_000_000)), 100

    # --- how often does the gate fire? ---------------------------------
    cfg = PfConfig(num_particles=n, weight_mode="log",
                   resample_method="hist")

    @jax.jit
    def count_rs(key):
        fs0 = pf_fused_init(cfg)
        keys = jax.random.split(key, steps)

        def body(carry, k):
            fs, seed = carry
            fs, ess = pf_fused_step_stats(cfg, fs, k, seed)
            return (fs, seed + 7919), ess

        (_, _), ess = jax.lax.scan(body, (fs0, jnp.asarray(1, jnp.int32)),
                                   keys)
        return jnp.sum(ess < n * cfg.ess_threshold_frac)

    cnt = int(count_rs(jax.random.key(0)))
    log(f"resamples in {steps} steps at NP={n}: {cnt}")

    # --- never-resample rollout (gate disabled) ------------------------
    cfg0 = PfConfig(num_particles=n, weight_mode="log",
                    resample_method="hist", ess_threshold_frac=0.0)

    @jax.jit
    def no_rs(key):
        fs0 = pf_fused_init(cfg0)
        keys = jax.random.split(key, steps)

        def body(carry, k):
            fs, seed = carry
            fs, _ = pf_fused_step_stats(cfg0, fs, k, seed)
            return (fs, seed + 7919), None

        (fs, _), _ = jax.lax.scan(body, (fs0, jnp.asarray(1, jnp.int32)),
                                  keys)
        return fs.lse

    dt = timed(no_rs, jax.random.key(0))
    log(f"no-resample rollout: {n*steps/dt:.3e} p-steps/s "
        f"({dt/steps*1e3:.3f} ms/step)")

    # --- bare kernel scan (no cond, no truth/obs) -----------------------
    tile_n, n_pad = _padded(cfg0, 2048)

    @jax.jit
    def bare(key):
        p = jnp.zeros((3, n_pad), jnp.float32)
        lw = jnp.zeros((1, n_pad), jnp.float32)
        z = jnp.zeros((5, 2), jnp.float32)

        def body(carry, _):
            p, lw, seed = carry
            p, lw, stats = _pf_stats_call(cfg0, seed, 0.0, p, lw, z,
                                          tile_n, True, False)
            return (p, lw, seed + 7919), stats[0]

        (p, lw, _), s = jax.lax.scan(body,
                                     (p, lw, jnp.asarray(1, jnp.int32)),
                                     jnp.arange(steps))
        return jnp.sum(s)

    dt = timed(bare, jax.random.key(0))
    log(f"bare kernel scan: {n*steps/dt:.3e} p-steps/s "
        f"({dt/steps*1e3:.3f} ms/step)")

    # --- bare kernel scan without RNG (noise_on=False) ------------------
    @jax.jit
    def bare_nonoise(key):
        p = jnp.zeros((3, n_pad), jnp.float32)
        lw = jnp.zeros((1, n_pad), jnp.float32)
        z = jnp.zeros((5, 2), jnp.float32)

        def body(carry, _):
            p, lw, seed = carry
            p, lw, stats = _pf_stats_call(cfg0, seed, 0.0, p, lw, z,
                                          tile_n, False, False)
            return (p, lw, seed + 7919), stats[0]

        (p, lw, _), s = jax.lax.scan(body,
                                     (p, lw, jnp.asarray(1, jnp.int32)),
                                     jnp.arange(steps))
        return jnp.sum(s)

    dt = timed(bare_nonoise, jax.random.key(0))
    log(f"bare kernel scan (no RNG): {n*steps/dt:.3e} p-steps/s "
        f"({dt/steps*1e3:.3f} ms/step)")

    # --- resample-only scan (exp + cumsum + hist + gather) --------------
    from tpuslam.filters.pf import resample_indices

    @jax.jit
    def rs_only(key):
        p = jnp.zeros((3, n), jnp.float32)
        lw = jnp.full((n,), -13.8, jnp.float32)
        keys = jax.random.split(key, steps)

        def body(p, k):
            w = jnp.exp(lw)
            idx = resample_indices(k, w, method="hist")
            p2 = p[:, idx]
            return p2, None

        p, _ = jax.lax.scan(body, p, keys)
        return jnp.sum(p)

    dt = timed(rs_only, jax.random.key(0))
    log(f"resample-only scan: {dt/steps*1e3:.3f} ms/step")

    log("ALL DONE")


if __name__ == "__main__":
    main()
