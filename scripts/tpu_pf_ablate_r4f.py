#!/usr/bin/env python
"""Round-4 PF ablation, part F: segment-packed pass 1 on hardware.

r4d/r4e pinned pass 1's cost to the boundary build's flat (1, t_in)
rows: ~0.2 us per in-kernel (1, t_in)<->(S, 128) relayout (two
_hprefix_exact calls each pay ~4) plus 1/8 f32 sublane occupancy on
every elementwise op.  tile_boundary_compact_seg runs the whole tile
body in (S, 128) segment space with inputs bitcast in XLA (free) and
the one-hot dot segmented (bit-identical selection - CPU interpret
tests pin it).  This measures flat vs packed pass 1 and the production
rollout at the winning config.
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

    for sigma, tag in ((2.15, "14%"), (3.2, "5%")):
        w_row = make_weights(jax.random.key(8), sigma)[None, :]

        for name, t_in, t_k, packed in (
            ("p1 flat  t2048/512", 2048, 512, False),
            ("p1 packed t2048/512", 2048, 512, True),
            ("p1 packed t2048/256", 2048, 256, True),
            ("p1 packed t4096/512", 4096, 512, True),
        ):
            def body(k, p, wr, t_in=t_in, t_k=t_k, packed=packed):
                offs = jax.random.uniform(k, dtype=jnp.float32)
                bc, cnt = boundary_compact_particles(
                    p, wr, N, offs, t_in, t_k, False, packed=packed)
                return jnp.float32(jnp.max(cnt)) + bc[0, 0].astype(
                    jnp.float32)

            dt = scan20(body, p_rows, w_row)
            log(f"[{tag}] {name}: {dt * 1e3:.3f} ms/call")

        for name, kw in (
            ("merge packed t2048/512 windowed",
             dict(t_in=2048, t_k=512)),
            ("merge packed t2048/512 tier4",
             dict(t_in=2048, t_k=512, w_b_small=4)),
        ):
            def body(k, p, wr, kw=kw):
                return merge_resample_rows(k, p, wr, N, **kw)[0, 0]

            dt = scan20(body, p_rows, w_row)
            log(f"[{tag}] {name}: {dt * 1e3:.3f} ms/call")

    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops.pf_pallas import pf_fused_rollout

    steps = 100
    for name, caps in (
        ("rollout packed-p1 default caps", ()),
        ("rollout packed-p1 t2048/512", (("t_in", 2048), ("t_k", 512))),
        ("rollout packed-p1 t2048/256", (("t_in", 2048), ("t_k", 256))),
        ("rollout packed-p1 t4096/512", (("t_in", 4096), ("t_k", 512))),
    ):
        cfg = PfConfig(num_particles=N, resample_method="merge",
                       weight_mode="log")

        @jax.jit
        def fn(k, caps=caps):
            final, outs = pf_fused_rollout(cfg, k, steps,
                                           merge_caps_kw=caps)
            return jnp.sum(outs[1])

        dt = timed(fn, jax.random.key(0))
        log(f"{name}: {dt / steps * 1e3:.3f} ms/step "
            f"({N * steps / dt:.3e} p-steps/s)")
    log("ALL DONE")


if __name__ == "__main__":
    main()
