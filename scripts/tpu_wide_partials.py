#!/usr/bin/env python
"""Measure the wide batched PF after the pass-C partials change
(per-tile partials + XLA combine instead of the serialized SMEM
accumulator chain), incl. the no-fire floor.
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


def run(batch, n, steps, label, ess_frac=None):
    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops import pf_batch_wide_rollout

    kw = {} if ess_frac is None else dict(ess_threshold_frac=ess_frac)
    cfg = PfConfig(num_particles=n, weight_mode="log", **kw)

    def roll(k):
        final, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                            n_steps=steps)
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
    log(f"{label:34s}: {dt*1e3:8.1f} ms "
        f"({batch*n*steps/dt:.3e} p-steps/s)  rmse={err:.3f}")
    return batch * n * steps / dt


def main():
    log(f"devices: {jax.devices()}")
    run(1024, 10_000, 100, "1024 x 10k no-fire floor", ess_frac=1e-9)
    run(128, 10_000, 100, "128 x 10k (default gate)")
    run(1024, 10_000, 100, "1024 x 10k (default gate)")


if __name__ == "__main__":
    main()
