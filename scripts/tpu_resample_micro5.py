#!/usr/bin/env python
"""Micro-bench #5: isolate the merge-resample kernel passes on TPU.

Times pass 1 (block compaction) and pass 2 (expansion) separately, and
sweeps matmul precision (DEFAULT / HIGH / HIGHEST) to see what the
one-hot dot_generals actually cost, plus tile-size variants.
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

import tpuslam.ops.resample_pallas as rp


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


N = 1 << 20
STEPS = 20


def weights(ess_frac=0.015):
    key = jax.random.key(1)
    lw = jax.random.normal(key, (1, N), jnp.float32) * 3.2
    w = jnp.exp(lw - jnp.max(lw))
    w = w / jnp.sum(w)
    return w


def main():
    log(f"devices: {jax.devices()}  N={N}")
    w_row = weights()
    ess = float(1.0 / jnp.sum(jnp.square(w_row)))
    log(f"ESS = {ess:.0f} ({ess/N*100:.2f}%)")
    p = jax.random.normal(jax.random.key(2), (3, N), jnp.float32)

    # shared glue products
    t_in, t_k, t_out, w_b = 1024, 128, 2048, 4
    offs = jnp.float32(0.37)
    t_row = rp.slot_boundaries(w_row, N, offs)
    tprev = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), t_row[:, :-1]], axis=-1)
    f_row = (t_row > tprev).astype(jnp.int32)
    g_row = jnp.cumsum(f_row, axis=-1) - f_row
    nt_in = N // t_in
    log(f"survivors: {int(jnp.sum(f_row))}, max/tile: "
        f"{int(jnp.max(f_row[0].reshape(nt_in, t_in).sum(-1)))}")

    vals4 = jnp.concatenate([p, t_row.astype(jnp.float32)], axis=0)

    for prec_name in ("DEFAULT", "HIGH", "HIGHEST"):
        prec = getattr(jax.lax.Precision, prec_name)
        rp._HIGHEST = prec  # patch the module knob

        def pass1(v4, g, f):
            row_in = lambda b: (0, b)  # noqa: E731
            return pl.pallas_call(
                functools.partial(rp._compact_kernel, t_k=t_k),
                grid=(nt_in,),
                in_specs=[pl.BlockSpec((4, t_in), row_in),
                          pl.BlockSpec((1, t_in), row_in),
                          pl.BlockSpec((1, t_in), row_in)],
                out_specs=pl.BlockSpec((4, t_k), row_in),
                out_shape=jax.ShapeDtypeStruct((4, nt_in * t_k),
                                               jnp.float32),
            )(v4, g, f)

        @jax.jit
        def loop1(v4, g, f):
            def body(c, _):
                out = pass1(v4 + c * 0, g, f)
                return jnp.sum(out[3]) * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(STEPS))
            return c

        dt = call_time(loop1, vals4, g_row, f_row) / STEPS
        log(f"pass1 [{prec_name}]: {dt*1e3:.3f} ms")

    rp._HIGHEST = jax.lax.Precision.HIGHEST
    bc = pass1_out = None
    # build tc4 + window params once (pass-2 inputs)
    row_in = lambda b: (0, b)  # noqa: E731
    bc = pl.pallas_call(
        functools.partial(rp._compact_kernel, t_k=t_k),
        grid=(nt_in,),
        in_specs=[pl.BlockSpec((4, t_in), row_in),
                  pl.BlockSpec((1, t_in), row_in),
                  pl.BlockSpec((1, t_in), row_in)],
        out_specs=pl.BlockSpec((4, t_k), row_in),
        out_shape=jax.ShapeDtypeStruct((4, nt_in * t_k), jnp.float32),
    )(vals4, g_row, f_row)
    lead = jnp.zeros((4, t_k), jnp.float32)
    tail = jnp.concatenate(
        [jnp.zeros((3, w_b * t_k), jnp.float32),
         jnp.full((1, w_b * t_k), float(N), jnp.float32)], axis=0)
    tc4 = jnp.concatenate([lead, bc, tail], axis=1)
    n_blocks = nt_in + 1 + w_b
    nt_out = N // t_out
    i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
    i_last = jnp.minimum(i0 + t_out, N) - 1
    tc1 = tc4[3]
    lv = jnp.searchsorted(tc1, i0.astype(jnp.float32),
                          side="right").astype(jnp.int32)
    le = jnp.searchsorted(tc1, i_last.astype(jnp.float32),
                          side="right").astype(jnp.int32)
    sb = jnp.clip((lv - 1) // t_k, 0, n_blocks - w_b)
    span = jnp.clip(le // t_k - sb + 1, 1, w_b)
    log(f"max span blocks: {int(jnp.max(le // t_k - (lv-1)//t_k + 1))}")

    for prec_name in ("DEFAULT", "HIGH", "HIGHEST"):
        prec = getattr(jax.lax.Precision, prec_name)
        rp._HIGHEST = prec

        def pass2(sb, span, tc4):
            return pl.pallas_call(
                functools.partial(rp._expand_kernel, t_k=t_k,
                                  t_out=t_out),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(nt_out, w_b),
                    in_specs=[pl.BlockSpec(
                        (4, t_k), lambda b, w, sb, span: (0, sb[b] + w))],
                    out_specs=pl.BlockSpec(
                        (3, t_out), lambda b, w, sb, span: (0, b)),
                    scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((3, N), jnp.float32),
            )(sb, span, tc4)

        @jax.jit
        def loop2(sb, span, tc4):
            def body(c, _):
                out = pass2(sb, span, tc4 + c * 0)
                return jnp.sum(out[0]) * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(STEPS))
            return c

        dt = call_time(loop2, sb, span, tc4) / STEPS
        log(f"pass2 [{prec_name}]: {dt*1e3:.3f} ms")

    # exactness of HIGH vs HIGHEST for the one-hot matmul
    rp._HIGHEST = jax.lax.Precision.HIGHEST
    ref = pass2(sb, span, tc4)
    for prec_name in ("DEFAULT", "HIGH"):
        rp._HIGHEST = getattr(jax.lax.Precision, prec_name)
        out = pass2(sb, span, tc4)
        d = np.abs(np.asarray(out) - np.asarray(ref))
        log(f"pass2 {prec_name} vs HIGHEST: max|d|={d.max():.3e}")
    rp._HIGHEST = jax.lax.Precision.HIGHEST

    log("ALL DONE")


if __name__ == "__main__":
    main()
