"""Wide batched PF rates with the fixed slot-keyed kernel defaults."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpuslam.filters import PfConfig
from tpuslam.ops.pf_batch_pallas import pf_batch_wide_rollout


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def rate(batch, parts, steps=100, **kw):
    cfg = PfConfig(num_particles=parts, weight_mode="log")

    @jax.jit
    def fn(k):
        final, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                            n_steps=steps, **kw)
        return (jnp.sum(final.particles) + jnp.sum(final.lse),
                jnp.sum(outs.resampled.any(axis=1)),
                jnp.sum(outs.resampled))

    def scalar(k):
        return fn(k)[0]

    dt = timed(scalar, jax.random.key(0))
    _, fire_steps, fires = fn(jax.random.key(0))
    r = batch * parts * steps / dt
    print(f"wide {batch}x{parts}: {r:.3e} p-s/s "
          f"({dt*1e3/steps:.2f} ms/step; {int(fire_steps)}/{steps} "
          f"steps fire, {int(fires)} filter-firings)", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rate(128, 10_000)
    rate(1024, 10_000)
    rate(64, 100_000, steps=50)


if __name__ == "__main__":
    main()
