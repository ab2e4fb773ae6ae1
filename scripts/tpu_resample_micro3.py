#!/usr/bin/env python
"""Micro-bench #3: compaction-scatter and chunk-start costs at 1M.

Companion to tpu_resample_micro.py (component timings).  Conclusions
that shaped filters/pf.py::resample_indices (measured on v5e):
  * any 1M-index scatter costs ~5 ms regardless of unique/sorted flags
    (scatter-add with duplicates ~9 ms - duplicate handling serializes);
    cost scales with ROW count (a (4, N) row-scatter is ~4x a (1, N));
  * gathers are ~4.6 ms per 1M indices, also ~independent of flags;
  * searchsorted is ~linear in QUERY count (free for few queries,
    158 ms for 1M);
  * a merge-rank construction (two 2N scatters, benchmarked in a since-
    deleted micro-bench #2) loses to one unique scatter-set + cummax.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


N = 1 << 20
ITERS = 50
_BASE = None


def call_time(jfn, *args, reps=3):
    float(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed_op(fn, *args):
    @jax.jit
    def looped(*a):
        def body(c, _):
            out = fn(c, *a)
            return jnp.sum(out).astype(jnp.float32) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c
    dt = call_time(looped, *args)
    return max(dt - _BASE, 0.0) / ITERS


def main():
    global _BASE
    log(f"devices: {jax.devices()}  N={N} ITERS={ITERS}")
    key = jax.random.key(0)
    vals = jax.random.normal(key, (4, N), jnp.float32)
    # ~half the slots kept, unique sorted targets
    keep = jax.random.uniform(key, (N,)) < 0.5
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep, rank, N)  # kept -> unique sorted rank; else OOB
    t_sorted = jnp.sort(jax.random.randint(key, (N,), 0, N)) \
        .astype(jnp.float32)

    @jax.jit
    def empty(x):
        def body(c, _):
            return c + 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c + jnp.sum(x) * 0

    _BASE = call_time(empty, vals)
    log(f"empty-scan call: {_BASE*1e3:.3f} ms")

    def compact_rows(c, v, tg):
        out = jnp.zeros((4, N), jnp.float32)
        return out.at[:, tg + c.astype(jnp.int32)].set(
            v, mode="drop", unique_indices=True)

    log(f"row-scatter (4,N) unique:        "
        f"{timed_op(compact_rows, vals, tgt)*1e3:.3f} ms")

    def compact_1row(c, v, tg):
        out = jnp.zeros((N,), jnp.float32)
        return out.at[tg + c.astype(jnp.int32)].set(
            v[0], mode="drop", unique_indices=True)

    log(f"row-scatter (1,N) unique:        "
        f"{timed_op(compact_1row, vals, tgt)*1e3:.3f} ms")

    def compact_rows_sorted(c, v, tg):
        out = jnp.zeros((4, N), jnp.float32)
        return out.at[:, tg + c.astype(jnp.int32)].set(
            v, mode="drop", unique_indices=True, indices_are_sorted=True)

    log(f"row-scatter (4,N) unique+sorted: "
        f"{timed_op(compact_rows_sorted, vals, tgt)*1e3:.3f} ms")

    for g in (513, 2049):
        q = jnp.arange(g, dtype=jnp.float32) * (N / (g - 1))

        def ss(c, ts, qq):
            return jnp.searchsorted(ts + c, qq, side="right")

        log(f"searchsorted {g} queries:        "
            f"{timed_op(ss, t_sorted, q)*1e3:.3f} ms")

    # gather-based compaction alternative: indices known sorted
    idxg = jnp.sort(jax.random.randint(key, (N // 2,), 0, N))

    def gat(c, v, i):
        return jnp.take(v, i + c.astype(jnp.int32), axis=1,
                        indices_are_sorted=True)

    log(f"gather (4, N/2) sorted:          "
        f"{timed_op(gat, vals, idxg)*1e3:.3f} ms")

    log("ALL DONE")


if __name__ == "__main__":
    main()
