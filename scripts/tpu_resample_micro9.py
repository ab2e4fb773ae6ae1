#!/usr/bin/env python
"""Micro-bench #9: why does wrapping the merge kernel cost ~12 ms?

At 0.1%-survivor weights (kernel path certainly taken) times four
variants of the same computation inside a 20-step scan:

  a) library merge_resample_rows (nested @jax.jit + lax.cond)
  b) library via __wrapped__ (lax.cond, no nested jit)
  c) inline body, lax.cond(ok, expand, xla_path)
  d) inline body, expand always (no cond)

b-a isolates jit nesting, c-d isolates the cond, c-b isolates any
closure/capture difference.
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


def inline_merge(key, p_rows, w_row, n, with_cond, t_in=1024, t_k=256,
                 t_out=2048, w_b=12):
    import tpuslam.ops.resample_pallas as rp

    n_pad = p_rows.shape[1]
    wb2 = 128
    offs = jax.random.uniform(key, dtype=jnp.float32)
    t_row = rp.slot_boundaries(w_row, n, offs)
    tprev = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), t_row[:, :-1]], axis=-1)
    f_row = (t_row > tprev).astype(jnp.int32)
    g_row = jnp.cumsum(f_row, axis=-1) - f_row
    nt_in = n_pad // t_in
    cnt = f_row[0].reshape(nt_in, t_in).sum(axis=-1)
    ok_compact = jnp.max(cnt) <= t_k

    def xla_path(_):
        idx = rp.decode_indices(t_row, n)
        return jnp.zeros_like(p_rows).at[:, :n].set(p_rows[:, :n][:, idx])

    stack5 = jnp.concatenate(
        [p_rows.astype(jnp.float32), t_row.astype(jnp.float32),
         tprev.astype(jnp.float32)], axis=0)
    hml = rp.split3(stack5)
    vals15 = jnp.stack(hml, axis=1).reshape(rp._ROWS, n_pad)
    row_in = lambda b: (0, b)  # noqa: E731
    bc = pl.pallas_call(
        functools.partial(rp._compact_kernel, t_k=t_k),
        grid=(nt_in,),
        in_specs=[pl.BlockSpec((rp._ROWS, t_in), row_in,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, t_in), row_in,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, t_in), row_in,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rp._ROWS, t_k), row_in,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp._ROWS, nt_in * t_k),
                                       jnp.bfloat16),
    )(vals15, g_row, f_row)
    nh, nm, nl = rp.split3(jnp.float32(n))
    tail = jnp.zeros((rp._ROWS, w_b * wb2), jnp.bfloat16)
    for r, v in ((9, nh), (10, nm), (11, nl), (12, nh), (13, nm),
                 (14, nl)):
        tail = tail.at[r].set(v)
    tc15 = jnp.concatenate([bc, tail], axis=1)
    nw = t_k // wb2
    n_comp_max = nt_in * nw
    n_blk = n_comp_max + w_b
    occ_ne = (cnt[:, None]
              > jnp.arange(nw, dtype=cnt.dtype)[None, :] * wb2)
    nonempty = occ_ne.reshape(-1).astype(jnp.int32)
    pos = jnp.cumsum(nonempty) - nonempty
    tgt = jnp.where(nonempty > 0, pos, n_blk)
    blk_ids = jnp.full((n_blk,), n_comp_max, jnp.int32).at[tgt].set(
        jnp.arange(n_comp_max, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    tc_hi = (tc15[9].astype(jnp.float32) + tc15[10].astype(jnp.float32)
             + tc15[11].astype(jnp.float32))
    tb_last = tc_hi[(blk_ids + 1) * wb2 - 1]
    nt_out = n_pad // t_out
    i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
    i_last = jnp.minimum(i0 + t_out, n) - 1
    sb_raw = jnp.searchsorted(tb_last, i0.astype(jnp.float32),
                              side="right").astype(jnp.int32)
    le = jnp.searchsorted(tb_last, i_last.astype(jnp.float32),
                          side="right").astype(jnp.int32)
    sb = jnp.clip(sb_raw, 0, n_blk - w_b)
    span = jnp.clip(le - sb + 1, 1, w_b)
    need = jnp.where(i0 < n, le - sb_raw + 1, 1)
    ok_window = jnp.max(need) <= w_b

    def expand(_):
        out = pl.pallas_call(
            functools.partial(rp._expand_kernel, t_out=t_out, wb2=wb2),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nt_out, w_b),
                in_specs=[pl.BlockSpec(
                    (rp._ROWS, wb2),
                    lambda b, w, sb, span, blk: (0, blk[sb[b] + w]),
                    memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (3, t_out), lambda b, w, sb, span, blk: (0, b),
                    memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        )(sb, span, blk_ids, tc15)
        return out.astype(p_rows.dtype)

    if with_cond:
        return jax.lax.cond(ok_compact & ok_window, expand, xla_path, 0)
    return expand(0)


def main():
    import tpuslam.ops.resample_pallas as rp

    log(f"devices: {jax.devices()}  N={N}")
    npad = N
    key = jax.random.key(0)
    lw = jax.random.normal(jax.random.fold_in(key, 10), (npad,),
                           jnp.float32) * 8.0
    w = jnp.exp(lw - jnp.max(lw))
    w_row = (w / jnp.sum(w))[None, :]
    p = jax.random.normal(jax.random.fold_in(key, 11), (3, npad),
                          jnp.float32)

    def lib(k0, p, w, salt):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        return jnp.sum(rp.merge_resample_rows(k, p, w, N))

    def lib_nojit(k0, p, w, salt):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        return jnp.sum(rp.merge_resample_rows.__wrapped__(k, p, w, N))

    def inl_cond(k0, p, w, salt):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        return jnp.sum(inline_merge(k, p, w, N, True))

    def inl_nocond(k0, p, w, salt):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        return jnp.sum(inline_merge(k, p, w, N, False))

    for name, fn in (("a lib (jit+cond)   ", lib),
                     ("b lib (cond only)  ", lib_nojit),
                     ("c inline cond      ", inl_cond),
                     ("d inline no cond   ", inl_nocond)):
        dt = call_time(loop20(fn), key, p, w_row) / STEPS
        log(f"{name}: {dt*1e3:.3f} ms")

    log("ALL DONE")


if __name__ == "__main__":
    main()
