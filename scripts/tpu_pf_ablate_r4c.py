#!/usr/bin/env python
"""Round-4 PF ablation, part C: merge-resample cap/tile sweep at 2M.

r4b isolated the fused-PF throughput gap to the resample firings
(~4.3 ms each at 2M; per-step glue is ~0.01 ms).  Cost model of
merge_resample_rows (ops/resample_pallas.py): pass 1 one-hot compaction
(dot FLOPs ~ n * 128_Mpad * t_k), pass 2 expansion (w_b WINDOW-REF
FETCHES per output tile regardless of span + (128_Mpad, wb2, t_out)
dots).  Suspects: the 12 x (n/t_out) small pass-2 DMAs and the t_k
factor in pass-1 FLOPs.  This sweeps the static caps under REALISTIC
fired-gate weights (lognormal, ESS ~ 1% of N, survivors ~5% - the
regime the gate actually fires in; uniform weights overflow the caps
and measure the XLA fallback instead).

Selection is cap-invariant (bit-identical boundaries), so the fastest
safe config can be wired into pf_fused_step_stats without touching
goldens.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
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


def make_weights(key, sigma=2.15):
    z = jax.random.normal(key, (N,), jnp.float32) * sigma
    w = jnp.exp(z - jax.scipy.special.logsumexp(z))
    return w


def main():
    from tpuslam.ops.resample_pallas import (boundary_compact_particles,
                                             boundary_decode,
                                             merge_resample_rows)

    log(f"devices: {jax.devices()}  N={N}")
    k0 = jax.random.key(7)
    p_rows = jax.random.normal(k0, (3, N), jnp.float32)
    w = make_weights(jax.random.key(8))
    w_row = w[None, :]
    ess = float(1.0 / jnp.sum(w * w))
    # Survivor stats under the default caps (XLA decode).
    _, _, f_row, _, cnt, okc = boundary_decode(w_row, N, jnp.float32(0.37),
                                               1024, 256)
    surv = int(jnp.sum(f_row))
    log(f"ESS {ess:.0f} ({ess / N * 100:.2f}% of N), survivors {surv} "
        f"({surv / N * 100:.2f}%), max cnt/1024-tile "
        f"{int(jnp.max(cnt))}, ok_compact(t_k=256)={bool(okc)}")

    def bench_cfg(name, **kw):
        @jax.jit
        def roll(key, p, wr):
            def body(p, k):
                return merge_resample_rows(k, p, wr, N, **kw), 0.0

            keys = jax.random.split(key, REPS_IN)
            p, _ = jax.lax.scan(body, p, keys)
            return jnp.sum(p)

        dt = timed(roll, k0, p_rows, w_row)
        log(f"{name:34s}: {dt / REPS_IN * 1e3:.3f} ms/call")

    # Pass-1 alone (fused boundary build + compaction).
    @jax.jit
    def pass1(key, p, wr):
        def body(c, k):
            offs = jax.random.uniform(k, dtype=jnp.float32)
            bc, cnt = boundary_compact_particles(p, wr, N, offs, 1024,
                                                 256, False)
            return c + jnp.float32(jnp.max(cnt)), 0.0

        keys = jax.random.split(key, REPS_IN)
        c, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return c

    dt = timed(pass1, k0, p_rows, w_row)
    log(f"{'pass 1 alone (1024/256)':34s}: {dt / REPS_IN * 1e3:.3f} "
        f"ms/call")

    bench_cfg("baseline 1024/256/2048/12")
    bench_cfg("t_out=4096 w_b=12", t_out=4096)
    bench_cfg("t_out=8192 w_b=12", t_out=8192)
    bench_cfg("t_out=8192 w_b=8", t_out=8192, w_b=8)
    bench_cfg("t_out=16384 w_b=12", t_out=16384)
    bench_cfg("t_in=512 t_k=128", t_in=512, t_k=128)
    bench_cfg("t_in=512 t_k=128 t_out=8192", t_in=512, t_k=128,
              t_out=8192)
    bench_cfg("t_in=2048 t_k=512", t_in=2048, t_k=512)
    bench_cfg("t_in=1024 t_k=128 (cap risk)", t_k=128)
    bench_cfg("t_out=8192 w_b=6 (span risk)", t_out=8192, w_b=6)
    log("ALL DONE")


if __name__ == "__main__":
    main()
