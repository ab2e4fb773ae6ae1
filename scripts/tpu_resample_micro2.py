#!/usr/bin/env python
"""Micro-bench #2: sorted/unique scatter + gather fast paths for the
systematic resample, and a scatter-light merge-rank pipeline."""

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


def merge_rank_indices(w, offs):
    """Systematic-resample gather indices via merge ranks - scatter-SET
    with unique+sorted indices only (no scatter-add histogram).

    t_j = ceil(N w_cum_j - offs) clipped to [0, N]; the comb index map is
    idx[i] = #{j : t_j <= i}.  Merged positions p_j = t_j + j are
    strictly increasing; grid slot i sits at merged position i + idx[i],
    i.e. at the (i+1)-th zero of the occupancy mask.
    """
    n = w.shape[0]
    cum = jnp.cumsum(w)
    t = jnp.clip(jnp.ceil(n * cum - offs), 0, n).astype(jnp.int32)
    pj = t + jnp.arange(n, dtype=jnp.int32)  # strictly increasing
    o = jnp.zeros((2 * n,), jnp.int32).at[pj].set(
        1, unique_indices=True, indices_are_sorted=True)
    cnt = jnp.cumsum(o)  # cnt[p] = #{j: p_j <= p}
    pos = jnp.arange(2 * n, dtype=jnp.int32)
    # Zero positions map to grid slots (unique, in [0, n)); occupied
    # positions get unique OOB targets n + j so the whole target set is
    # genuinely unique (the OOB ones are dropped).
    tgt = jnp.where(o == 0, pos - cnt, n + cnt - 1)
    idx = jnp.zeros((n,), jnp.int32).at[tgt].set(
        cnt, mode="drop", unique_indices=True)
    return jnp.clip(idx, 0, n - 1)


def main():
    global _BASE
    log(f"devices: {jax.devices()}  N={N} ITERS={ITERS}")
    key = jax.random.key(0)
    w = jax.random.uniform(key, (N,), jnp.float32)
    w = w / jnp.sum(w)
    p = jax.random.normal(key, (3, N), jnp.float32)
    idx_sorted = jnp.sort(jax.random.randint(key, (N,), 0, N))
    cum = jnp.cumsum(w)
    t = jnp.clip(jnp.ceil(N * cum).astype(jnp.int32), 0, N)
    pj = jnp.clip(t + jnp.arange(N, dtype=jnp.int32), 0, 2 * N - 1)

    @jax.jit
    def empty(x):
        def body(c, _):
            return c + 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c + jnp.sum(x) * 0

    _BASE = call_time(empty, w)
    log(f"empty-scan call:       {_BASE*1e3:.3f} ms")

    log(f"scatter-add hist (sorted flag): "
        f"{timed_op(lambda c, tt: jnp.zeros((N + 1,), jnp.int32).at[tt + c.astype(jnp.int32)].add(1, indices_are_sorted=True), t)*1e3:.3f} ms")
    log(f"scatter-set unique+sorted (2N): "
        f"{timed_op(lambda c, pp: jnp.zeros((2 * N,), jnp.int32).at[pp + c.astype(jnp.int32)].set(1, unique_indices=True, indices_are_sorted=True), pj)*1e3:.3f} ms")
    log(f"scatter-set unique only (2N):   "
        f"{timed_op(lambda c, pp: jnp.zeros((2 * N,), jnp.int32).at[pp + c.astype(jnp.int32)].set(1, unique_indices=True), pj)*1e3:.3f} ms")
    log(f"gather sorted flag (3,N):       "
        f"{timed_op(lambda c, pp, i: jnp.take(pp, i + c.astype(jnp.int32), axis=1, indices_are_sorted=True), p, idx_sorted)*1e3:.3f} ms")
    log(f"gather sorted+unique-ish (N,):  "
        f"{timed_op(lambda c, x, i: jnp.take(x, i + c.astype(jnp.int32), indices_are_sorted=True), w, idx_sorted)*1e3:.3f} ms")

    def full_merge_resample(c, w, p):
        idx = merge_rank_indices(w + c, 0.5)
        return jnp.take(p, idx, axis=1, indices_are_sorted=True)

    log(f"merge-rank idx only:            "
        f"{timed_op(lambda c, ww: merge_rank_indices(ww + c, 0.5), w)*1e3:.3f} ms")
    log(f"full merge-rank resample:       "
        f"{timed_op(full_merge_resample, w, p)*1e3:.3f} ms")

    # correctness vs the hist formulation
    def hist_idx(w, offs):
        n = w.shape[0]
        cum = jnp.cumsum(w)
        tt = jnp.clip(jnp.ceil(n * cum - offs), 0, n).astype(jnp.int32)
        hist = jnp.zeros((n + 1,), jnp.int32).at[tt].add(1)
        return jnp.clip(jnp.cumsum(hist[:-1]), 0, n - 1)

    for offs in (0.0, 0.3, 0.999):
        a = np.asarray(jax.jit(hist_idx)(w, offs))
        b = np.asarray(jax.jit(merge_rank_indices)(w, offs))
        log(f"idx match (offs={offs}): {bool((a == b).all())}")

    log("ALL DONE")


if __name__ == "__main__":
    main()
