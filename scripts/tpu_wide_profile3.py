#!/usr/bin/env python
"""Decompose the wide-PF firing-step cost after the chunked pass C
(~14 ms/firing step at 1024x10k): always-fire rollouts isolate the
resample path; tier knobs separate pass A/B work from the dispatch
glue.
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


def run(batch, n, steps, label, ess_frac=None, **kw):
    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops import pf_batch_wide_rollout

    ckw = {} if ess_frac is None else dict(ess_threshold_frac=ess_frac)
    cfg = PfConfig(num_particles=n, weight_mode="log", **ckw)

    def roll(k):
        final, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                            n_steps=steps, **kw)
        err = (outs.x_est[:, :, :2]
               - outs.x_true[:, None, :2])
        return (jnp.sqrt(jnp.mean(jnp.sum(err ** 2, -1)))
                + 0.0 * jnp.sum(outs.resampled))

    fn = jax.jit(roll)
    k = jax.random.key(0)
    err = float(fn(k))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(k))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    log(f"{label:44s}: {dt*1e3:8.1f} ms "
        f"({batch*n*steps/dt:.3e} p-steps/s)  rmse={err:.3f}")
    return dt


def main():
    log(f"devices: {jax.devices()}")
    b, n, steps = 1024, 10_000, 50
    floor = run(b, n, steps, "no-fire floor", ess_frac=1e-9)
    allfire = run(b, n, steps, "always-fire, two-tier default",
                  ess_frac=2.0)
    log(f"  -> firing-step cost {1e3*(allfire-floor)/steps:.2f} ms")
    t = run(b, n, steps, "always-fire, untiered (cap_small=B)",
            ess_frac=2.0, fire_cap_small=b)
    log(f"  -> firing-step cost {1e3*(t-floor)/steps:.2f} ms")
    t = run(b, n, steps, "always-fire, cap_small=B/8", ess_frac=2.0,
            fire_cap_small=b // 8)
    log(f"  -> firing-step cost {1e3*(t-floor)/steps:.2f} ms "
        "(bursts above B/8 take the full tier)")
    # Default gate, tier sweep (the production regime).
    for cs in (b // 8, b // 4, b // 2):
        run(b, n, steps, f"default gate, cap_small={cs}",
            fire_cap_small=cs)


if __name__ == "__main__":
    main()
