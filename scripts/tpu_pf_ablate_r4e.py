#!/usr/bin/env python
"""Round-4 PF ablation, part E: measure the restructured merge passes.

r4d split the 2M merge (t2048/512, 14% survivors) into pass 1 = 2.81 ms
(boundary build 1.73 + compact dot 1.08) and pass 2 = 3.69 ms (w_b=12
window refs; blk_ids index-map lookups are free), with an XLA
block-compress costing 1.18 ms.  This measures the three restructures
now in ops/resample_pallas.py:

  - chunked pass-1 cells (g_p1 tiles per grid cell; was 1),
  - tiered pass-2 window cap (w_b_small refs when every span fits),
  - compressed pass 2 (XLA take + two wide super-refs per tile),

at two weight regimes (sigma=2.15 ~ 14% survivors = r4c/r4d's, and
sigma=3.2 ~ the production ~5% regime), plus the full production
rollout at the merge_caps_kw the sweep favors.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("PF_N", 2 * 1024 * 1024))
REPS_IN = 20


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


def make_weights(key, sigma):
    z = jax.random.normal(key, (N,), jnp.float32) * sigma
    return jnp.exp(z - jax.scipy.special.logsumexp(z))


def scan20(body, *args):
    @jax.jit
    def roll(key, *a):
        def step(c, k):
            return body(k, *a), 0.0

        keys = jax.random.split(key, REPS_IN)
        c, _ = jax.lax.scan(step, 0.0, keys)
        return c

    return timed(roll, jax.random.key(7), *args) / REPS_IN


def main():
    from tpuslam.ops.resample_pallas import (boundary_compact_particles,
                                             merge_resample_rows)

    log(f"devices: {jax.devices()}  N={N}")
    k0 = jax.random.key(7)
    p_rows = jax.random.normal(k0, (3, N), jnp.float32)

    for sigma, tag in ((2.15, "14%-survivors"), (3.2, "~5%-survivors")):
        w_row = make_weights(jax.random.key(8), sigma)[None, :]
        frac = None

        def p1_body(k, p, wr, t_in=2048, t_k=512):
            offs = jax.random.uniform(k, dtype=jnp.float32)
            bc, cnt = boundary_compact_particles(p, wr, N, offs, t_in,
                                                 t_k, False)
            return jnp.float32(jnp.max(cnt)) + bc[0, 0].astype(
                jnp.float32)

        dt = scan20(p1_body, p_rows, w_row)
        log(f"[{tag}] p1 chunked t2048/512    : {dt * 1e3:.3f} ms/call")

        def merge_body(k, p, wr, **kw):
            out = merge_resample_rows(k, p, wr, N, **kw)
            return out[0, 0]

        for name, kw in (
            ("merge t1024/256 windowed", dict(t_in=1024, t_k=256)),
            ("merge t2048/512 windowed", dict(t_in=2048, t_k=512)),
            ("merge t2048/512 tier4   ", dict(t_in=2048, t_k=512,
                                              w_b_small=4)),
            ("merge t2048/512 compress", dict(t_in=2048, t_k=512,
                                              pass2="compressed")),
            ("merge t2048/256 windowed", dict(t_in=2048, t_k=256)),
            ("merge t2048/256 tier4   ", dict(t_in=2048, t_k=256,
                                              w_b_small=4)),
        ):
            def body(k, p, wr, kw=kw):
                return merge_body(k, p, wr, **kw)

            dt = scan20(body, p_rows, w_row)
            log(f"[{tag}] {name}: {dt * 1e3:.3f} ms/call")

    # --- production rollouts (default gate, 100 steps) ----------------
    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops.pf_pallas import pf_fused_rollout

    steps = 100

    def roll(key, caps_kw):
        cfg = PfConfig(num_particles=N, resample_method="merge",
                       weight_mode="log")

        @jax.jit
        def fn(k):
            final, outs = pf_fused_rollout(cfg, k, steps,
                                           merge_caps_kw=caps_kw)
            return jnp.sum(outs[1])

        dt = timed(fn, key)
        return dt / steps

    for name, caps in (
        ("rollout default caps     ", ()),
        ("rollout t2048/512 tier4  ", (("t_in", 2048), ("t_k", 512),
                                       ("w_b_small", 4))),
        ("rollout t2048/512 compres", (("t_in", 2048), ("t_k", 512),
                                       ("pass2", "compressed"))),
    ):
        dt = roll(jax.random.key(0), caps)
        log(f"{name}: {dt * 1e3:.3f} ms/step "
            f"({N * steps / (dt * steps):.3e} p-steps/s)")
    log("ALL DONE")


if __name__ == "__main__":
    main()
