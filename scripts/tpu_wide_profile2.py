"""Wide-PF follow-up: why does the fire path cost ~280 ms at 1024x10k?

tpu_wide_profile.py showed fire_cap=B and fire_cap=1 (forced XLA
fallback) cost the SAME - i.e. the kernel path's `ok` guard fails (cnt
or w_b overflow) and every firing step runs the all-filter XLA decode.
This script (a) counts firing bursts (n_fire per step) at the default
gate, (b) sweeps fire_cap / w_b to see when the kernel path engages.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.filters import PfConfig
from tpuslam.ops.pf_batch_pallas import pf_batch_wide_rollout

STEPS = 20


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def fire_stats(cfg, batch):
    @jax.jit
    def fn(k):
        _, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                        n_steps=STEPS)
        return outs.resampled.sum(axis=1)

    nf = np.asarray(fn(jax.random.key(0)))
    print(f"n_fire per step (B={batch}): {nf.tolist()}", flush=True)


def rate(cfg, batch, label, **kw):
    @jax.jit
    def fn(k):
        final, _ = pf_batch_wide_rollout(cfg, k, batch=batch,
                                         n_steps=STEPS, **kw)
        return jnp.sum(final.particles) + jnp.sum(final.lse)

    dt = timed(fn, jax.random.key(0))
    r = batch * cfg.num_particles * STEPS / dt
    print(f"{label}: {r:.3e} p-s/s ({dt*1e3/STEPS:.2f} ms/step)",
          flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    for batch in (128, 1024):
        cfg = PfConfig(num_particles=10_000, weight_mode="log")
        print(f"--- {batch} x 10000, default gate", flush=True)
        fire_stats(cfg, batch)
        rate(cfg, batch, "fire_cap=B, w_b=4", fire_cap=batch, w_b=4)
        rate(cfg, batch, "fire_cap=B, w_b=12", fire_cap=batch, w_b=12)
        rate(cfg, batch, f"fire_cap={max(8, batch//4)}, w_b=12",
             fire_cap=max(8, batch // 4), w_b=12)


if __name__ == "__main__":
    main()
