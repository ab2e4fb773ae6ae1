#!/usr/bin/env python
"""Round-4 PF ablation, part B: attribute the production-vs-kernel gap.

tpu_pf_ablate_r4.py measured: kernel-only scan 0.456 ms/step, production
rollout 1.332 ms/step at 2M particles, with the ESS gate firing 20/100
steps.  Hypothesis: the gap is mostly the (rare but expensive) resample
firings amortized into the mean, not per-step glue.  This part measures:

  1. production rollout with the gate never firing (threshold 0) -> the
     per-step glue floor (truth/obs + cond-no-fire + combine + estimate);
  2. production rollout with the gate always firing (threshold 1) -> the
     per-firing cost directly;
  3. merge_resample_rows standalone at 2M (scan of 20 calls);
  4. hist-method XLA resample standalone for comparison;
  5. production with resample_method='hist' (gate at reference default).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpuslam.filters.pf import PfConfig

N = int(os.environ.get("PF_N", 2 * 1024 * 1024))
STEPS = 100


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


def bench_rollout(name, **cfg_kw):
    from tpuslam.ops.pf_pallas import pf_fused_rollout

    cfg = PfConfig(num_particles=N, weight_mode="log",
                   resample_method=cfg_kw.pop("resample_method", "merge"),
                   **cfg_kw)

    @jax.jit
    def roll(key):
        final, outs = pf_fused_rollout(cfg, key, STEPS)
        return jnp.sum(outs[1])

    dt = timed(roll, jax.random.key(0))
    log(f"{name:42s}: {dt / STEPS * 1e3:.3f} ms/step "
        f"({N * STEPS / dt:.3e} p-steps/s)")
    return dt / STEPS


def bench_resample_standalone():
    from tpuslam.ops.resample_pallas import merge_resample_rows
    from tpuslam.filters.pf import resample_indices

    n_pad = N  # multiple of 2048 already
    reps_in = 20

    @jax.jit
    def roll_merge(key, p_rows, w_row):
        def body(p, k):
            p2 = merge_resample_rows(k, p, w_row, N)
            return p2, jnp.float32(0)

        keys = jax.random.split(key, reps_in)
        p, _ = jax.lax.scan(body, p_rows, keys)
        return jnp.sum(p)

    @jax.jit
    def roll_hist(key, p_rows, w):
        def body(p, k):
            idx = resample_indices(k, w, method="hist")
            return p[:, idx], jnp.float32(0)

        keys = jax.random.split(key, reps_in)
        p, _ = jax.lax.scan(body, p_rows, keys)
        return jnp.sum(p)

    k0 = jax.random.key(7)
    p_rows = jax.random.normal(k0, (3, n_pad), jnp.float32)
    w = jax.random.uniform(jax.random.key(8), (N,), jnp.float32)
    w = w / jnp.sum(w)
    w_row = w[None, :]

    dt = timed(roll_merge, k0, p_rows, w_row)
    log(f"{'merge_resample_rows standalone 2M':42s}: "
        f"{dt / reps_in * 1e3:.3f} ms/call")
    dt = timed(roll_hist, k0, p_rows, w)
    log(f"{'hist resample (XLA index+gather) 2M':42s}: "
        f"{dt / reps_in * 1e3:.3f} ms/call")


def main():
    log(f"devices: {jax.devices()}  N={N} steps={STEPS}")
    bench_rollout("prod merge, default gate (20 firings)")
    bench_rollout("prod merge, gate never fires",
                  ess_threshold_frac=0.0)
    bench_rollout("prod merge, gate fires EVERY step",
                  ess_threshold_frac=1.0)
    bench_rollout("prod hist, default gate",
                  resample_method="hist")
    bench_resample_standalone()
    log("ALL DONE")


if __name__ == "__main__":
    main()
