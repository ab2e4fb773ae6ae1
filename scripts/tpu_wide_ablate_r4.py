#!/usr/bin/env python
"""Round-4 wide-PF ablation (VERDICT r3 item 2): split the 1024x10k
step into no-fire floor vs firing cost, then sweep the pass-A survivor
cap t_k (one-hot dot FLOPs scale with it; selection is cap-invariant)
and the pass-B window cap w_b (ref fetches per output tile).

Round-3 shipped 1.181e9 particle-steps/s at the default gate (8.67
ms/step at 10.24M particles/step); the floor analysis blamed the
M=15->128-sublane-padded compact/expand dots (STATUS.md round 3,
scripts/tpu_passa_ablate.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpuslam.filters.pf import PfConfig

B = int(os.environ.get("PF_B", 1024))
N = int(os.environ.get("PF_N", 10_000))
STEPS = int(os.environ.get("PF_STEPS", 100))


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


def bench(name, ess_frac=None, steps=None, **kw):
    from tpuslam.ops import pf_batch_wide_rollout

    steps = STEPS if steps is None else steps
    cfg_kw = {}
    if ess_frac is not None:
        cfg_kw["ess_threshold_frac"] = ess_frac
    cfg = PfConfig(num_particles=N, weight_mode="log", **cfg_kw)

    @jax.jit
    def roll(key):
        final, outs = pf_batch_wide_rollout(cfg, key, batch=B,
                                            n_steps=steps, **kw)
        return jnp.sum(outs.x_est) + jnp.sum(
            outs.resampled.astype(jnp.float32))

    dt = timed(roll, jax.random.key(0))
    log(f"{name:40s}: {dt / steps * 1e3:.3f} ms/step "
        f"({B * N * steps / dt:.3e} p-steps/s)")
    return dt / steps


def count_fires():
    from tpuslam.ops import pf_batch_wide_rollout

    cfg = PfConfig(num_particles=N, weight_mode="log")

    @jax.jit
    def fires(key):
        final, outs = pf_batch_wide_rollout(cfg, key, batch=B,
                                            n_steps=STEPS)
        per_step = outs.resampled.sum(axis=-1)
        return (jnp.sum(per_step > 0), jnp.max(per_step),
                jnp.sum(per_step))

    steps_fired, max_burst, total = fires(jax.random.key(0))
    log(f"firing: {int(steps_fired)}/{STEPS} steps fire >=1 filter, "
        f"max burst {int(max_burst)}, total {int(total)} "
        f"filter-firings")


def main():
    log(f"devices: {jax.devices()}  B={B} N={N} steps={STEPS}")
    bench("default (t_k=256, w_b=12, tiered)")
    count_fires()
    bench("gate never fires (floor)", ess_frac=0.0)
    # t_k=64 is not lowerable on hardware (wb2 must be a 128 multiple);
    # per-variant guards so one failure doesn't kill the sweep.
    for name, kw in (
        ("w_b=8", dict(w_b=8)),
        ("pass_a=seg", dict(pass_a="seg")),
        ("default, 400 steps (amortized)", dict(steps=400)),
    ):
        try:
            bench(name, **kw)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")
    log("ALL DONE")


if __name__ == "__main__":
    main()
