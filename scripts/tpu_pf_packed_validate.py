#!/usr/bin/env python
"""Validate + measure the production fused PF rollout with the
sublane-packed carry (sub_rows=8) vs the flat carry on the real chip.

Covers 1M and 2M particles x 100 steps (noisy, merge resample) - the
BENCH headline shape - plus a small-N sanity (auto threshold keeps it
flat).  Prints particle-steps/s for each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run(n, steps, sub_rows, label):
    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops import pf_fused_rollout

    cfg = PfConfig(num_particles=n, weight_mode="log",
                   resample_method="merge")

    def roll(k):
        final, (xt, xe) = pf_fused_rollout(cfg, k, steps,
                                           sub_rows=sub_rows)
        err = jnp.sqrt(jnp.mean(jnp.sum((xt - xe)[:, :2] ** 2, -1)))
        return err

    fn = jax.jit(roll)
    k = jax.random.key(0)
    err = float(fn(k))  # compile + sanity
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(k))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    log(f"{label:28s}: {dt/steps*1e3:.3f} ms/step "
        f"({n*steps/dt:.3e} p-steps/s)  rmse={err:.3f}")
    if not (err < 5.0):
        log(f"  !! RMSE {err} out of range")
    return n * steps / dt


def main():
    log(f"devices: {jax.devices()}")
    run(1 << 20, 100, 1, "1M flat (old default)")
    run(1 << 20, 100, 8, "1M packed R=8")
    run(1 << 21, 100, 1, "2M flat (old default)")
    run(1 << 21, 100, 8, "2M packed R=8")
    run(1 << 22, 100, 8, "4M packed R=8")
    run(1 << 23, 100, 8, "8M packed R=8")
    run(10_000, 100, None, "10k auto (stays flat)")
    log("ALL DONE")


if __name__ == "__main__":
    main()
