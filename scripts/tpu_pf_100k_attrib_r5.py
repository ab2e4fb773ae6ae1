#!/usr/bin/env python
"""Fused-PF small-N regime attribution (VERDICT r4 item 6).

BASELINE config 2 names 100k particles; BENCH_r04 measured 8.24e8
particle-steps/s there - 36% of the same kernel's 2M rate - with no
floor table.  This script separates the per-STEP fixed cost (scan
dispatch + kernel launch + per-step XLA glue, independent of N) from
the per-PARTICLE cost by measuring the production rollout across N and
fitting t_step = a + b*N; it also measures the no-fire floor at 100k
(resample share) and an empty-scan control (pure scan dispatch).

All timings are 400-step single-program scans; quoted per-step numbers
subtract the ~25 ms/call tunnel dispatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

STEPS = int(os.environ.get("PF_STEPS", 400))
CALL_MS = 25.0


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


def roll_ms(n, **cfg_kw):
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout

    cfg = PfConfig(num_particles=n, weight_mode="log",
                   resample_method="merge", **cfg_kw)

    @jax.jit
    def fn(k):
        final, _ = pf_fused_rollout(cfg, k, STEPS)
        return jnp.sum(final.particles) + jnp.sum(final.weights)

    dt = timed(fn, jax.random.key(0))
    return (dt * 1e3 - CALL_MS) / STEPS, n * STEPS / dt


def main():
    log(f"devices: {jax.devices()}  steps={STEPS}")

    # Pure scan-dispatch control: same-length scan, trivial body.
    @jax.jit
    def empty(k):
        def body(c, _):
            return c * 1.0000001 + 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return c

    dt = timed(empty, jax.random.key(0))
    log(f"empty-scan control: {(dt*1e3-CALL_MS)/STEPS:7.4f} ms/step")

    rows = []
    for n in (100_000, 200_000, 400_000, 1_000_000, 2_097_152):
        ms, rate = roll_ms(n)
        rows.append((n, ms))
        log(f"production N={n:>9,}: {ms:7.4f} ms/step = {rate:.3e} "
            "p-steps/s")
    ns = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    b, a = np.polyfit(ns, ts, 1)
    log(f"fit t_step = {a:.4f} ms + {b*1e6:.4f} ms/M-particles "
        f"(fixed floor {a:.4f} ms = {100*a/ts[0]:.0f}% of the 100k "
        "step)")

    ms_nf, rate_nf = roll_ms(100_000, ess_threshold_frac=1e-9)
    log(f"no-fire 100k: {ms_nf:7.4f} ms/step = {rate_nf:.3e} p-steps/s "
        f"(resample share at 100k = {ts[0]-ms_nf:.4f} ms/step)")


if __name__ == "__main__":
    main()
