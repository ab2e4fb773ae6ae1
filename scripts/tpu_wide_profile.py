"""Decompose the wide batched PF step cost on the real chip.

The round-2 measurement showed pf_batch_wide_rollout at 4.3e7
particle-steps/s (128x10k) and 3.6e7 (1024x10k) - 10x below the
single-tile batched kernel.  This script times the step's pieces to
find where the ~28 ms/step goes:

  a. pass C alone (predict + weight + stats), resample gated OFF
     (ess_threshold_frac=0 -> fire never true).
  b. full step, default gate (fires occasionally).
  c. full step, gate forced EVERY step (ess_threshold_frac=1.0).
  d. the fire-path XLA glue alone (quantize + tile sums + compaction
     indices), no kernels.
  e. pass A + skip table + pass B on a firing profile, isolated.

All timings via host-pulled scalars inside a 20-step scan (carried
state, per CLAUDE.md the cond-over-carried-state is the valid regime).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpuslam.filters import PfConfig
from tpuslam.ops.pf_batch_pallas import (pf_batch_wide_init,
                                         pf_batch_wide_step)

STEPS = 20


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def rollout_rate(cfg, batch, label, **kw):
    @jax.jit
    def fn(k):
        st = pf_batch_wide_init(cfg, batch)
        keys = jax.random.split(k, STEPS)

        def body(carry, kk):
            st, seed = carry
            st, _ = pf_batch_wide_step(cfg, st, kk, seed, **kw)
            return (st, seed + 65536), ()

        (st, _), _ = jax.lax.scan(body, (st, jnp.asarray(1, jnp.int32)),
                                  keys)
        return jnp.sum(st.particles) + jnp.sum(st.lse)

    dt = timed(fn, jax.random.key(0))
    rate = batch * cfg.num_particles * STEPS / dt
    print(f"{label}: {rate:.3e} p-s/s ({dt*1e3/STEPS:.2f} ms/step)",
          flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    for batch, parts in ((128, 10_000), (1024, 10_000)):
        base = PfConfig(num_particles=parts, weight_mode="log")
        print(f"--- {batch} x {parts}", flush=True)
        # a. resample machinery never fires (threshold 0)
        cfg_off = PfConfig(num_particles=parts, weight_mode="log",
                           ess_threshold_frac=0.0)
        rollout_rate(cfg_off, batch, "gate OFF  (pass C only)")
        # b. default gate
        rollout_rate(base, batch, "gate default")
        # c. gate fires every step
        cfg_on = PfConfig(num_particles=parts, weight_mode="log",
                          ess_threshold_frac=1.0)
        rollout_rate(cfg_on, batch, "gate EVERY step")
        # c2. every step but huge fire_cap forces the XLA fallback off
        rollout_rate(cfg_on, batch, "gate EVERY, fire_cap=B",
                     fire_cap=batch)
        # c3. tiny cap -> XLA fallback on every step
        rollout_rate(cfg_on, batch, "gate EVERY, fire_cap=1 (XLA fb)",
                     fire_cap=1)


if __name__ == "__main__":
    main()
