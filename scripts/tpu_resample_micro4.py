#!/usr/bin/env python
"""Micro-bench #4: where the merge-resample glue time actually goes.

Times each XLA component of the resample paths at 1M lanes: cumsum
(f32 and int32), associative cummax, exp, concat, searchsorted at the
merge path's query count, and the blocked matmul fast_cumsum
alternative.
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
ITERS = 30
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
        def body(c, i):
            out = fn(c, i, *a)
            return jnp.sum(out).astype(jnp.float32) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c
    dt = call_time(looped, *args)
    return max(dt - _BASE, 0.0) / ITERS


def main():
    global _BASE
    log(f"devices: {jax.devices()}  N={N} ITERS={ITERS}")
    key = jax.random.key(0)
    w = jax.random.uniform(key, (1, N), jnp.float32)
    lw = jax.random.normal(key, (1, N), jnp.float32)
    fi = (jax.random.uniform(key, (1, N)) < 0.02).astype(jnp.int32)
    p3 = jax.random.normal(key, (3, N), jnp.float32)
    tq = jnp.sort(jax.random.uniform(key, (N + 1024,))) * N

    @jax.jit
    def empty(x):
        def body(c, _):
            return c + 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c + jnp.sum(x) * 0
    _BASE = call_time(empty, w)
    log(f"empty-scan call: {_BASE*1e3:.3f} ms")

    log(f"cumsum f32 (1,N):    "
        f"{timed_op(lambda c, i, x: jnp.cumsum(x + c, -1), w)*1e3:.3f} ms")
    log(f"cumsum i32 (1,N):    "
        f"{timed_op(lambda c, i, x: jnp.cumsum(x + c.astype(jnp.int32), -1).astype(jnp.float32), fi)*1e3:.3f} ms")
    log(f"assoc cummax i32:    "
        f"{timed_op(lambda c, i, x: jax.lax.associative_scan(jnp.maximum, x + c.astype(jnp.int32), axis=-1).astype(jnp.float32), fi)*1e3:.3f} ms")
    log(f"exp (1,N):           "
        f"{timed_op(lambda c, i, x: jnp.exp(x - c), lw)*1e3:.3f} ms")
    log(f"concat (3,N)+(1,N):  "
        f"{timed_op(lambda c, i, a, b: jnp.concatenate([a + c, b], 0), p3, w)*1e3:.3f} ms")
    log(f"searchsorted 1k q:   "
        f"{timed_op(lambda c, i, x: jnp.searchsorted(x, jnp.arange(978.0) * 1024.0 + c, side='right').astype(jnp.float32), tq)*1e3:.3f} ms")

    # blocked matmul cumsum: local cumsum on the MXU + tiny tile-offset
    def fast_cumsum(x, tile):
        nt = x.shape[-1] // tile
        x2 = x.reshape(nt, tile)
        tri = jnp.triu(jnp.ones((tile, tile), jnp.float32))
        loc = jax.lax.dot_general(
            x2, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        sums = loc[:, -1]
        offs = jnp.cumsum(sums) - sums
        return (loc + offs[:, None]).reshape(x.shape)

    for tile in (512, 1024, 2048):
        dt = timed_op(lambda c, i, x, t=tile: fast_cumsum(x + c, t), w)
        log(f"fast_cumsum tile={tile}: {dt*1e3:.3f} ms")

    # sanity: fast vs jnp cumsum
    a = jnp.cumsum(w, -1)
    b = fast_cumsum(w, 1024)
    import numpy as np
    log(f"fast_cumsum max rel err: "
        f"{float(jnp.max(jnp.abs(a - b) / jnp.maximum(a, 1e-9))):.2e}")
    log("ALL DONE")


if __name__ == "__main__":
    main()
