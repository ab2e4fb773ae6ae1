#!/usr/bin/env python
"""Probe Mosaic tpu.dynamic_gather (jnp.take_along_axis) on v5e.

What lowers, for which shapes/axes/dtypes, and how fast - decides
whether the wide-PF compact/expand one-hot matmuls (M/N-padded to 128
on the MXU - the measured pass A/B floor, scripts/tpu_wide_profile4.py)
can become per-lane gathers instead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe(shape, axis, dtype=jnp.float32, reps=200):
    def kernel(x_ref, i_ref, o_ref):
        x = x_ref[:, :]
        idx = i_ref[:, :]
        o = x
        for _ in range(reps):
            o = jnp.take_along_axis(o, idx, axis=axis)
        o_ref[:, :] = o

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(x, idx)

    key = jax.random.key(0)
    x = jax.random.normal(key, shape).astype(dtype)
    perm = jax.random.permutation(
        key, jnp.arange(shape[axis], dtype=jnp.int32))
    if axis == 1:
        idx = jnp.tile(perm[None, :], (shape[0], 1))
    else:
        idx = jnp.tile(perm[:, None], (1, shape[1]))
    try:
        r = run(x, idx)
        float(jnp.sum(r.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(3):
            float(jnp.sum(run(x, idx).astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 3
        n = shape[0] * shape[1] * reps
        log(f"OK  shape={shape} axis={axis} {dtype.__name__}: "
            f"{dt*1e9/n:.3f} ns/elem ({n/dt/1e9:.2f} G elems/s)")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        log(f"NO  shape={shape} axis={axis} {dtype.__name__}: "
            f"{type(e).__name__}: {msg}")
        return False


def main():
    log(f"devices: {jax.devices()}")
    probe((8, 128), 1)
    probe((8, 256), 1)
    probe((8, 1024), 1)
    probe((1, 1024), 1)
    probe((64, 1024), 1)
    probe((8, 128), 0)
    probe((64, 128), 0)
    probe((8, 128), 1, jnp.bfloat16)
    probe((8, 128), 1, jnp.int32)
    log("ALL DONE")


if __name__ == "__main__":
    main()
