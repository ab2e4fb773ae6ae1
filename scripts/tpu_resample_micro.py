#!/usr/bin/env python
"""Micro-bench the systematic-resample components at ~1M particles.

The tunneled TPU has ~20-25 ms of per-jit-call overhead, so each op is
looped ITERS times inside ONE jit program via lax.scan (with a carried
scalar perturbation to defeat CSE/hoisting); the reported number is
(call_time - empty_scan_time) / ITERS.
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


N = 1 << 20  # 1048576
ITERS = 50


def call_time(jfn, *args, reps=3):
    float(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


_BASE = None


def timed_op(fn, *args):
    """fn(c, *args) -> array; looped ITERS times, c is a carried scalar."""
    @jax.jit
    def looped(*a):
        def body(c, _):
            out = fn(c, *a)
            return jnp.sum(out).astype(jnp.float32) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c

    dt = call_time(looped, *args)
    return max(dt - _BASE, 0.0) / ITERS


def mm_cumsum(x, b=2048):
    xb = x.reshape(-1, b)
    tri = jnp.tril(jnp.ones((b, b), jnp.float32))
    within = jax.lax.dot_general(
        xb, tri, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    tots = within[:, -1]
    offs = jnp.cumsum(tots) - tots
    return (within + offs[:, None]).reshape(-1)


def main():
    global _BASE
    log(f"devices: {jax.devices()}  N={N} ITERS={ITERS}")
    key = jax.random.key(0)
    w = jax.random.uniform(key, (N,), jnp.float32)
    w = w / jnp.sum(w)
    p = jax.random.normal(key, (3, N), jnp.float32)
    pn3 = jnp.asarray(p.T)
    idx_sorted = jnp.sort(jax.random.randint(key, (N,), 0, N))
    cum = jnp.cumsum(w)
    u = (jnp.arange(N, dtype=jnp.float32) + 0.5) / N
    t = jnp.clip(jnp.ceil(N * cum).astype(jnp.int32), 0, N)
    t_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), t[:-1]])
    jv = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def empty(x):
        def body(c, _):
            return c + 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c + jnp.sum(x) * 0

    _BASE = call_time(empty, w)
    log(f"empty-scan call:    {_BASE*1e3:.3f} ms (per-call overhead)")

    log(f"exp:                "
        f"{timed_op(lambda c, x: jnp.exp(x + c), w)*1e3:.3f} ms")
    log(f"cumsum:             "
        f"{timed_op(lambda c, x: jnp.cumsum(x + c), w)*1e3:.3f} ms")
    log(f"assoc_scan add:     "
        f"{timed_op(lambda c, x: jax.lax.associative_scan(jnp.add, x + c), w)*1e3:.3f} ms")
    log(f"matmul cumsum:      "
        f"{timed_op(lambda c, x: mm_cumsum(x + c), w)*1e3:.3f} ms")
    err = float(jax.jit(
        lambda x: jnp.max(jnp.abs(mm_cumsum(x) - jnp.cumsum(x))))(w))
    log(f"  matmul cumsum max err vs cumsum: {err:.2e}")
    log(f"scatter-hist:       "
        f"{timed_op(lambda c, tt: jnp.zeros((N + 1,), jnp.int32).at[tt + c.astype(jnp.int32)].add(1), t)*1e3:.3f} ms")
    log(f"searchsorted:       "
        f"{timed_op(lambda c, cc, uu: jnp.searchsorted(cc + c, uu, side='left'), cum, u)*1e3:.3f} ms")
    log(f"gather (3,N) lanes: "
        f"{timed_op(lambda c, pp, i: pp[:, i + c.astype(jnp.int32)], p, idx_sorted)*1e3:.3f} ms")
    log(f"gather (N,3) rows:  "
        f"{timed_op(lambda c, pp, i: pp[i + c.astype(jnp.int32), :], pn3, idx_sorted)*1e3:.3f} ms")
    log(f"gather (N,) flat:   "
        f"{timed_op(lambda c, x, i: x[i + c.astype(jnp.int32)], w, idx_sorted)*1e3:.3f} ms")

    def maxscan_idx(c, t_prev, jvals):
        m = (jnp.full((N,), -1, jnp.int32)
             .at[t_prev + c.astype(jnp.int32)].max(jvals, mode="drop"))
        return jax.lax.associative_scan(jnp.maximum, m)

    log(f"scatter+maxscan:    "
        f"{timed_op(maxscan_idx, t_prev, jv)*1e3:.3f} ms")

    def full_hist_resample(c, w, p):
        cc = jnp.cumsum(w + c)
        tt = jnp.clip(jnp.ceil(N * cc).astype(jnp.int32), 0, N)
        hist = jnp.zeros((N + 1,), jnp.int32).at[tt].add(1)
        idx = jnp.clip(jnp.cumsum(hist[:-1]), 0, N - 1)
        return p[:, idx]

    log(f"full hist resample: "
        f"{timed_op(full_hist_resample, w, p)*1e3:.3f} ms")

    def full_mm_resample(c, w, p):
        cc = mm_cumsum(w + c)
        tt = jnp.clip(jnp.ceil(N * cc).astype(jnp.int32), 0, N)
        hist = jnp.zeros((N + 1,), jnp.int32).at[tt].add(1)
        idx = jnp.clip(mm_cumsum(hist[:-1].astype(jnp.float32))
                       .astype(jnp.int32), 0, N - 1)
        return p[:, idx]

    log(f"full mm resample:   "
        f"{timed_op(full_mm_resample, w, p)*1e3:.3f} ms")

    log("ALL DONE")


if __name__ == "__main__":
    main()
