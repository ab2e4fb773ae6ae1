#!/usr/bin/env python
"""Round-5 batched-PF attribution ladder at 8192x1000 (VERDICT r4 item 2).

The 8192x1000 config has been flat across two rounds (1.008e9 -> 1.009e9
particle-steps/s) with a "per-tile grid overhead floor" claim that
predates the round-4b measurement-offset correction.  This ladder re-runs
the r4 methodology at exactly this shape: xla-touch control (no kernel),
copy-only kernel twin (same blocks/grid), production, and compile-time
block knockouts (gate stats, resample, likelihood, per-filter stats) via
``pf_batch_step(_ablate=...)``, plus filters_per_cell and compact_cap
sweeps.

All variants run the REAL rollout scan harness (K steps in one program);
with K=400 the ~25 ms/call tunnel dispatch is 0.0625 ms/step (<1% at the
~8 ms/step production rate) - quoted numbers subtract it anyway.

Usage: python scripts/tpu_pf_batch_ablate_r5.py [variants...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("PF_B", 8192))
NP = int(os.environ.get("PF_NP", 1000))
STEPS = int(os.environ.get("PF_STEPS", 400))
CALL_MS = 25.0  # measured per-jit-call tunnel dispatch (CLAUDE.md)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *a, reps=3):
    float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, dt):
    ms = dt * 1e3 / STEPS
    true_ms = (dt * 1e3 - CALL_MS) / STEPS
    rate = B * NP * STEPS / dt
    log(f"{name:28s}: {ms:7.3f} ms/step ({true_ms:7.3f} true) "
        f"= {rate:.3e} p-steps/s")
    return true_ms


def main():
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_rollout

    log(f"devices: {jax.devices()}  B={B} NP={NP} steps={STEPS}")
    cfg = PfConfig(num_particles=NP, weight_mode="log")
    args = sys.argv[1:] or ["xla", "copy", "prod", "no_resample",
                            "no_gate", "no_like", "no_stats", "no_noise",
                            "g16", "g32", "g64", "cap0", "cap256"]

    def run(name, **kw):
        @jax.jit
        def fn(k):
            final, outs = pf_batch_rollout(cfg, k, batch=B,
                                           n_steps=STEPS, **kw)
            return jnp.sum(final.particles) + jnp.sum(outs.x_est)
        return report(name, timed(fn, jax.random.key(0)))

    if "xla" in args:
        # No kernel at all: the scan's XLA glue alone (truth step, z
        # build/broadcast, carry plumbing).
        from tpuslam.models.process import circular_step
        from tpuslam.core.se2 import world_to_robot
        from tpuslam.ops.pf_batch_pallas import pf_batch_init

        lm = jnp.asarray(cfg.landmarks, jnp.float32)

        @jax.jit
        def xla_touch(key):
            st = pf_batch_init(cfg, B, sub_rows=8)

            def body(c, k):
                xt, acc = c
                xt = circular_step(xt, cfg.vel, cfg.yaw_rate, cfg.dt)
                z0 = world_to_robot(xt, lm)
                noise = jax.random.normal(k, (B,) + z0.shape, jnp.float32)
                z = z0[None] + noise * jnp.asarray(cfg.r_std, jnp.float32)
                return (xt, acc + jnp.sum(z) * 1e-20), None

            (xt, acc), _ = jax.lax.scan(
                body, (st.x_true, jnp.float32(0)),
                jax.random.split(key, STEPS))
            return acc + jnp.sum(st.particles) * 1e-20

        report("xla-touch (no kernel)", timed(xla_touch, jax.random.key(0)))
    if "copy" in args:
        run("copy-only kernel twin", _ablate=("copy_only",))
    if "prod" in args:
        run("production (g=8, cap=128)")
    if "no_resample" in args:
        run("no resample (gate on)", _ablate=("no_resample",))
    if "no_gate" in args:
        run("no gate+resample", _ablate=("no_gate",))
    if "no_like" in args:
        run("no likelihood", _ablate=("no_like",))
    if "no_stats" in args:
        run("no stats block", _ablate=("no_stats",))
    if "no_noise" in args:
        run("noise off", noise_on=False)
    if "g16" in args:
        run("g=16 filters/cell", filters_per_cell=16)
    if "g32" in args:
        run("g=32 filters/cell", filters_per_cell=32)
    if "g64" in args:
        run("g=64 filters/cell", filters_per_cell=64)
    if "cap0" in args:
        run("compact_cap=0 (full PxP)", compact_cap=0)
    if "cap256" in args:
        run("compact_cap=256", compact_cap=256)


if __name__ == "__main__":
    main()
