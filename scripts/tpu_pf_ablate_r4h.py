#!/usr/bin/env python
"""Round-4 PF ablation, part H: what makes pass 1's DMA floor 1.39 ms?

r4g: a dma-only pass-1 twin (fetch (3, 2048) f32 particles + (1, 2048)
weights per one-tile cell, write one SMEM int) costs 1.392 ms at 2M -
35x the ~0.04 ms the 32 MB payload costs at HBM speed - while the
boundary compute on top adds only ~0.5 ms.  Candidate culprits: per-cell
DMA issue latency (1024 cells), sublane-strided (3, X)/(1, X) blocks
(3/8 and 1/8 of each VMEM tile written), or the XLA-side quantize in
the loop.  Variants:

  xla-touch       sum(p) + sum(wq) only (no kernel): XLA HBM baseline +
                  scan/quantize overhead
  flat g=1        r4g's dma-only (reproduce)
  flat g=8        chunked (3, 16384) blocks: 128 cells
  seg g=8         dense (128, 128) f32 planes (x/y/yaw/wq separately):
                  full-sublane DMAs, 128 cells
  seg g=32        same, 32 cells
  seg g=8 fused4  one (4*128, 128) block per cell (x+y+yaw+wq stacked
                  in XLA beforehand): a single dense DMA per cell
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PF_N", 2 * 1024 * 1024))
REPS_IN = 20
T_IN = 2048


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
    from tpuslam.ops.resample_pallas import quantize_weights

    log(f"devices: {jax.devices()}  N={N}  t_in={T_IN}")
    k0 = jax.random.key(7)
    p_rows = jax.random.normal(k0, (3, N), jnp.float32)
    z = jax.random.normal(jax.random.key(8), (N,), jnp.float32) * 3.2
    w_row = jnp.exp(z - jax.scipy.special.logsumexp(z))[None, :]
    nt_in = N // T_IN

    def quant(k, wr):
        offs = jax.random.uniform(k, dtype=jnp.float32)
        wq, base, q_tot = quantize_weights(wr, N, T_IN)
        return offs, wq, base

    # --- xla-touch ----------------------------------------------------
    def xla_body(k, p, wr):
        offs, wq, base = quant(k, wr)
        return jnp.sum(p) * 1e-20 + jnp.sum(wq) * 1e-20 + offs

    log(f"{'xla-touch':15s}: {scan20(xla_body, p_rows, w_row)*1e3:.3f}"
        " ms/call")

    # --- flat kernels -------------------------------------------------
    def flat_kernel(base_ref, p_ref, wq_ref, cnt_ref, *, g):
        c = pl.program_id(0)
        for u in range(g):
            cnt_ref[0, c * g + u] = (
                p_ref[0, u * T_IN] + wq_ref[0, u * T_IN]).astype(
                    jnp.int32)

    def run_flat(g):
        def body(k, p, wr):
            offs, wq, base = quant(k, wr)
            cnt = pl.pallas_call(
                functools.partial(flat_kernel, g=g),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(nt_in // g,),
                    in_specs=[
                        pl.BlockSpec((3, g * T_IN), lambda b, *_: (0, b),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, g * T_IN), lambda b, *_: (0, b),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                ),
                out_shape=[jax.ShapeDtypeStruct((1, nt_in), jnp.int32)],
            )(base.astype(jnp.float32), p, wq)[0]
            return jnp.float32(jnp.max(cnt)) + offs

        log(f"{'flat g=%d' % g:15s}: {scan20(body, p_rows, w_row)*1e3:.3f}"
            " ms/call")

    run_flat(1)
    run_flat(8)

    # --- seg kernels --------------------------------------------------
    s_tile = T_IN // 128

    def seg_kernel(base_ref, x_ref, y_ref, yaw_ref, wq_ref, cnt_ref,
                   *, g):
        c = pl.program_id(0)
        for u in range(g):
            cnt_ref[0, c * g + u] = (
                x_ref[u * s_tile, 0] + y_ref[u * s_tile, 0]
                + yaw_ref[u * s_tile, 0]
                + wq_ref[u * s_tile, 0]).astype(jnp.int32)

    def run_seg(g):
        def body(k, p, wr):
            offs, wq, base = quant(k, wr)
            seg_spec = pl.BlockSpec((g * s_tile, 128),
                                    lambda b, *_: (b, 0),
                                    memory_space=pltpu.VMEM)
            cnt = pl.pallas_call(
                functools.partial(seg_kernel, g=g),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(nt_in // g,),
                    in_specs=[seg_spec] * 4,
                    out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                ),
                out_shape=[jax.ShapeDtypeStruct((1, nt_in), jnp.int32)],
            )(base.astype(jnp.float32), p[0].reshape(-1, 128),
              p[1].reshape(-1, 128), p[2].reshape(-1, 128),
              wq.reshape(-1, 128))[0]
            return jnp.float32(jnp.max(cnt)) + offs

        log(f"{'seg g=%d' % g:15s}: {scan20(body, p_rows, w_row)*1e3:.3f}"
            " ms/call")

    run_seg(8)
    run_seg(32)

    # --- one fused dense block per cell -------------------------------
    def fused_kernel(base_ref, s_ref, cnt_ref, *, g):
        c = pl.program_id(0)
        for u in range(g):
            cnt_ref[0, c * g + u] = s_ref[u * 4 * s_tile, 0].astype(
                jnp.int32)

    def run_fused(g):
        def body(k, p, wr):
            offs, wq, base = quant(k, wr)
            # Stack per tile: tile b's rows = [x(16) y(16) yaw(16)
            # wq(16)] -> (nt*64, 128); one dense DMA per cell.
            def tile_rows(a):
                return a.reshape(nt_in, s_tile, 128)

            stack = jnp.concatenate(
                [tile_rows(p[0]), tile_rows(p[1]), tile_rows(p[2]),
                 tile_rows(wq[0])], axis=1).reshape(-1, 128)
            cnt = pl.pallas_call(
                functools.partial(fused_kernel, g=g),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(nt_in // g,),
                    in_specs=[pl.BlockSpec((g * 4 * s_tile, 128),
                                           lambda b, *_: (b, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                ),
                out_shape=[jax.ShapeDtypeStruct((1, nt_in), jnp.int32)],
            )(base.astype(jnp.float32), stack)[0]
            return jnp.float32(jnp.max(cnt)) + offs

        log(f"{'seg g=%d fused' % g:15s}: "
            f"{scan20(body, p_rows, w_row)*1e3:.3f} ms/call")

    run_fused(8)
    log("ALL DONE")


if __name__ == "__main__":
    main()
