#!/usr/bin/env python
"""Micro-bench #7: isolate merge-resample sub-paths with calibrated
production-like weights (~5% survivors, matching the fused-rollout
gate-firing profile from tpu_pf_survivors.py).

Separately times: hist decode+gather; the kernel path's xla fallback
branch alone; pass-1 compaction alone; window build; pass-2; and the
full merge under forced kernel path — so the 30 ms fallback anomaly
seen in micro6 and the true kernel cost both get explained.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("N", 1 << 20))
STEPS = 20


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def call_time(jfn, *args, reps=3):
    float(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def loop20(fn):
    @jax.jit
    def run(*args):
        def body(c, _):
            return c + fn(*args, salt=c), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(STEPS))
        return c
    return run


def calibrated_weights(target=0.055):
    """Bisect the lognormal scale so systematic-resample survivors hit
    ~target fraction (the measured production gate-firing profile)."""
    import tpuslam.ops.resample_pallas as rp
    key = jax.random.key(7)
    z = jax.random.normal(key, (1, N), jnp.float32)

    @jax.jit
    def survivors(scale):
        lw = z * scale
        w = jnp.exp(lw - jnp.max(lw))
        w = w / jnp.sum(w)
        t = rp.slot_boundaries(w, N, jnp.float32(0.37))
        tp = jnp.concatenate(
            [jnp.zeros((1, 1), jnp.int32), t[:, :-1]], axis=-1)
        return jnp.sum(t > tp), w

    lo, hi = 1.0, 12.0
    for _ in range(18):
        mid = 0.5 * (lo + hi)
        s, w = survivors(jnp.float32(mid))
        if float(s) / N > target:
            lo = mid
        else:
            hi = mid
    s, w = survivors(jnp.float32(0.5 * (lo + hi)))
    return w, float(s) / N


def main():
    import tpuslam.ops.resample_pallas as rp

    log(f"devices: {jax.devices()}  N={N}")
    w_row, frac = calibrated_weights()
    t_row0 = rp.slot_boundaries(w_row, N, jnp.float32(0.37))
    tp0 = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), t_row0[:, :-1]], axis=-1)
    f0 = np.asarray((t_row0 > tp0).astype(jnp.int32))[0]
    log(f"survivors={f0.sum()} ({frac*100:.2f}%) "
        f"max/1024={f0.reshape(-1, 1024).sum(-1).max()} "
        f"max/2048={f0.reshape(-1, 2048).sum(-1).max()}")
    p = jax.random.normal(jax.random.key(2), (3, N), jnp.float32)
    key = jax.random.key(5)

    # (a) decode + 1-row gather vs 3-row gather (row-count scaling)
    def decode_only(k0, w, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        idx = rp.decode_indices(rp.slot_boundaries(w, N, offs), N)
        return jnp.sum(idx[::4096].astype(jnp.float32))
    log(f"decode only        : {call_time(loop20(decode_only), key, w_row)/STEPS*1e3:.3f} ms")

    def decode_g1(k0, w, p, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        idx = rp.decode_indices(rp.slot_boundaries(w, N, offs), N)
        return jnp.sum(p[0, idx][::4096])
    log(f"decode+1row gather : {call_time(loop20(decode_g1), key, w_row, p)/STEPS*1e3:.3f} ms")

    def decode_g3(k0, w, p, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        idx = rp.decode_indices(rp.slot_boundaries(w, N, offs), N)
        return jnp.sum(p[:, idx][:, ::4096])
    log(f"decode+3row gather : {call_time(loop20(decode_g3), key, w_row, p)/STEPS*1e3:.3f} ms")

    def decode_g3t(k0, w, p, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        idx = rp.decode_indices(rp.slot_boundaries(w, N, offs), N)
        return jnp.sum(p.T[idx, :][::4096, :])
    log(f"decode+row-major g : {call_time(loop20(decode_g3t), key, w_row, p)/STEPS*1e3:.3f} ms")

    # (b) pass 1 alone (glue + compaction kernel, consume bc)
    t_in, t_k = 1024, 256
    nt_in = N // t_in

    def pass1_only(k0, w, p, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        t = rp.slot_boundaries(w, N, offs)
        tp = jnp.concatenate(
            [jnp.zeros((1, 1), jnp.int32), t[:, :-1]], axis=-1)
        fr = (t > tp).astype(jnp.int32)
        gr = jnp.cumsum(fr, axis=-1) - fr
        hml = rp.split3(jnp.concatenate(
            [p.astype(jnp.float32), t.astype(jnp.float32)], axis=0))
        v12 = jnp.concatenate(hml, axis=0)
        row_in = lambda b: (0, b)  # noqa: E731
        bc = pl.pallas_call(
            functools.partial(rp._compact_kernel, t_k=t_k),
            grid=(nt_in,),
            in_specs=[pl.BlockSpec((12, t_in), row_in,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, t_in), row_in,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, t_in), row_in,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((12, t_k), row_in,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12, nt_in * t_k),
                                           jnp.bfloat16),
        )(v12, gr, fr)
        return jnp.sum(bc[:, ::4096].astype(jnp.float32))
    log(f"glue+pass1         : {call_time(loop20(pass1_only), key, w_row, p)/STEPS*1e3:.3f} ms")

    # (c) full merge, forced kernel path (patch conds away)
    orig_cond = jax.lax.cond
    real_merge = rp.merge_resample_rows

    def merge_forced(k0, p, w, salt, **kw):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        out = real_merge(k, p, w, N, **kw)
        return jnp.sum(out[:, ::4096])

    for kw in (dict(t_in=1024, t_k=256, t_out=2048, w_b=4),
               dict(t_in=2048, t_k=512, t_out=2048, w_b=4),
               dict(t_in=2048, t_k=512, t_out=4096, w_b=4),
               dict(t_in=1024, t_k=256, t_out=2048, w_b=8)):
        fn = functools.partial(merge_forced, **kw)
        dt = call_time(loop20(fn), key, p, w_row) / STEPS
        log(f"merge {kw}: {dt*1e3:.3f} ms")

    log("ALL DONE")


if __name__ == "__main__":
    main()
