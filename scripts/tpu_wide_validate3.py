#!/usr/bin/env python
"""Validate + time the chunked wide-PF firing path on the TPU.

Round-3 change under test (ops/pf_batch_pallas.py + resample_pallas.py):
pass A chunked to <=8192-lane cells with an XLA-precomputed exact
prefix, pass B's window axis unrolled into one grid step per output
tile, and the skip-table searchsorted pair replaced by closed-form
ranks on the regular query grid.  Targets the ~14 ms/firing-step floor
measured by scripts/tpu_wide_profile4.py (VERDICT r2 item 2: default
gate 1024x10k >= 1.2e9 particle-steps/s).
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


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def wide_rate(batch, parts, steps=100, ess_frac=None):
    from tpuslam.filters import PfConfig
    from tpuslam.ops.pf_batch_pallas import pf_batch_wide_rollout

    kw = {} if ess_frac is None else {"ess_threshold_frac": ess_frac}
    cfg = PfConfig(num_particles=parts, weight_mode="log", **kw)

    @jax.jit
    def fn(k):
        final, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                            n_steps=steps)
        return (jnp.sum(final.particles) + jnp.sum(final.lse),
                jnp.sum(outs.resampled.any(axis=1)),
                jnp.sum(outs.resampled),
                jnp.sum(final.x_est))

    dt = timed(lambda k: fn(k)[0], jax.random.key(0))
    _, fire_steps, fires, xsum = fn(jax.random.key(0))
    r = batch * parts * steps / dt
    tag = "default" if ess_frac is None else f"ess={ess_frac}"
    log(f"wide {batch}x{parts} ({tag}): {r:.3e} p-s/s "
        f"({dt*1e3/steps:.2f} ms/step; {int(fire_steps)}/{steps} steps "
        f"fire, {int(fires)} filter-firings, x_est sum {float(xsum):.4f})")


def main():
    log(f"devices: {jax.devices()}")
    wide_rate(128, 10_000)
    wide_rate(1024, 10_000)
    wide_rate(1024, 10_000, ess_frac=0.0)  # no-fire floor
    burst_hist()
    log("ALL DONE")




def burst_hist(batch=1024, parts=10_000, steps=100):
    import numpy as np

    from tpuslam.filters import PfConfig
    from tpuslam.ops.pf_batch_pallas import pf_batch_wide_rollout

    cfg = PfConfig(num_particles=parts, weight_mode="log")

    @jax.jit
    def fn(k):
        _, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                        n_steps=steps)
        return outs.resampled.sum(axis=1)

    per_step = np.asarray(fn(jax.random.key(0)))
    per_step = per_step[per_step > 0]
    qs = np.percentile(per_step, [50, 75, 90, 95, 100])
    log(f"burst sizes ({len(per_step)} firing steps): p50={qs[0]:.0f} "
        f"p75={qs[1]:.0f} p90={qs[2]:.0f} p95={qs[3]:.0f} max={qs[4]:.0f}; "
        f">256: {(per_step > 256).sum()}, >512: {(per_step > 512).sum()}")


if __name__ == "__main__":
    main()
