#!/usr/bin/env python
"""Measure survivor statistics of the real PF rollout at gate firings.

For each step of a fused 1M-particle rollout, computes what a
systematic resample of the current weights WOULD select: total
survivors S (particles with slot count > 0) and the max survivors per
input tile for candidate pass-1 tilings.  Informs the merge-resample
kernel's static caps (t_k / t_in).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    from tpuslam.filters import PfConfig
    from tpuslam.ops.pf_pallas import pf_fused_init, pf_fused_step_stats

    n, steps = int(os.environ.get("PF_N", 1_000_000)), 100
    cfg = PfConfig(num_particles=n, weight_mode="log",
                   resample_method="hist")

    @jax.jit
    def run(key):
        fs0 = pf_fused_init(cfg)
        keys = jax.random.split(key, steps)

        def body(carry, k):
            fs, seed = carry
            # Diagnostics on the CURRENT weights (what a resample at
            # this step would see).
            w = jnp.exp(fs.log_w - fs.lse)  # (1, n_pad)
            cum = jnp.cumsum(w, axis=-1)
            t = jnp.clip(jnp.ceil(n * cum - 0.5).astype(jnp.int32), 0, n)
            tprev = jnp.concatenate(
                [jnp.zeros((1, 1), jnp.int32), t[:, :-1]], axis=-1)
            f = (t > tprev).astype(jnp.int32)
            s_total = jnp.sum(f)
            n_pad = fs.log_w.shape[1]
            m1024 = jnp.max(f[0].reshape(n_pad // 1024, 1024).sum(-1))
            m2048 = jnp.max(f[0].reshape(n_pad // 2048, 2048).sum(-1))
            bad = ~(jnp.isfinite(fs.lse) & jnp.isfinite(fs.lse2))
            ess = jnp.where(bad, float(n),
                            jnp.exp(2.0 * fs.lse - fs.lse2))
            fs, _ = pf_fused_step_stats(cfg, fs, k, seed)
            return (fs, seed + 7919), (ess, s_total, m1024, m2048)

        (_, _), outs = jax.lax.scan(
            body, (fs0, jnp.asarray(1, jnp.int32)), keys)
        return outs

    ess, s, m1, m2 = (np.asarray(x) for x in run(jax.random.key(0)))
    th = n * cfg.ess_threshold_frac
    fired = ess < th
    log(f"gate fired {fired.sum()}/{steps} steps")
    for i in np.nonzero(fired)[0]:
        log(f"  step {i:3d}: ESS={ess[i]:11.1f} S={s[i]:8d} "
            f"({s[i]/n*100:5.2f}%) max/1024={m1[i]:4d} "
            f"max/2048={m2[i]:4d}")
    nf = ~fired
    log(f"non-fired steps: S% median={np.median(s[nf]/n*100):.2f} "
        f"max={np.max(s[nf]/n*100):.2f}")
    log("ALL DONE")


if __name__ == "__main__":
    main()
