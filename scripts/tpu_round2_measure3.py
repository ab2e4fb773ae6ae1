#!/usr/bin/env python
"""Round-2 follow-up #2: 1M tridiag (CR OOM'd first in measure2), the
CR flat-layout memory ceiling, and the wide-PF no-fire floor (pass-C
cost, to see how much a tiered fire path could still win)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tpu_round2_measure2 import log, solver_run, timed  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def wide_floor(batch, parts, steps=100):
    """ess_threshold_frac=0: no filter ever fires; measures pass C +
    per-step glue only."""
    from tpuslam.filters import PfConfig
    from tpuslam.ops.pf_batch_pallas import pf_batch_wide_rollout

    cfg = PfConfig(num_particles=parts, weight_mode="log",
                   ess_threshold_frac=0.0)

    @jax.jit
    def fn(k):
        final, _ = pf_batch_wide_rollout(cfg, k, batch=batch,
                                         n_steps=steps)
        return jnp.sum(final.particles) + jnp.sum(final.lse)

    dt = timed(fn, jax.random.key(0))
    log(f"wide {batch}x{parts} NO-FIRE floor: {dt*1e3/steps:.2f} ms/step "
        f"({batch*parts*steps/dt:.3e} p-s/s)")


def main():
    log(f"devices: {jax.devices()}")
    wide_floor(1024, 10_000)
    solver_run(("tridiag",), 1_000_000, reps=1)
    solver_run(("cr",), 300_000, reps=1)
    log("ALL DONE")


if __name__ == "__main__":
    main()
