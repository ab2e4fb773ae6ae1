#!/usr/bin/env python
"""Validate + measure the batched fused PF (one filter per tile) with
the sublane-packed per-filter layout (sub_rows=8) vs the flat layout on
the real chip, at the bench shapes (1024/4096/8192 x 1000 particles).
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


def run(batch, n, steps, sub_rows, label):
    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops import pf_batch_rollout

    cfg = PfConfig(num_particles=n, weight_mode="log")

    def roll(k):
        final, outs = pf_batch_rollout(cfg, k, batch=batch,
                                       n_steps=steps,
                                       sub_rows=sub_rows)
        err = (outs.x_est[:, :, :2]
               - outs.x_true[:, None, :2])
        return jnp.sqrt(jnp.mean(jnp.sum(err ** 2, -1)))

    fn = jax.jit(roll)
    k = jax.random.key(0)
    err = float(fn(k))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(k))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    log(f"{label:30s}: {dt*1e3:8.1f} ms "
        f"({batch*n*steps/dt:.3e} p-steps/s)  rmse={err:.3f}")
    if not (0.02 < err < 2.0):
        log(f"  !! RMSE {err} out of range")
    return batch * n * steps / dt


def main():
    log(f"devices: {jax.devices()}")
    run(1024, 1000, 100, 1, "1024 x 1000 flat")
    run(1024, 1000, 100, 8, "1024 x 1000 packed R=8")
    run(4096, 1000, 100, 8, "4096 x 1000 packed R=8")
    run(8192, 1000, 100, 1, "8192 x 1000 flat")
    run(8192, 1000, 100, 8, "8192 x 1000 packed R=8")


if __name__ == "__main__":
    main()
