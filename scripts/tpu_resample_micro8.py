#!/usr/bin/env python
"""Micro-bench #8: cumulative stage timing of merge-resample v2
(self-describing intervals + skip table), including a cond-free forced
expand — to find the ~11 ms gap between component sums (~4 ms) and the
measured full path (~15 ms) at 1M particles.
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


def main():
    import tpuslam.ops.resample_pallas as rp
    from tpuslam.filters.pf import resample_indices

    log(f"devices: {jax.devices()}  N={N}")
    # ~5.5% survivors (production gate-firing profile): lognormal 4.0
    key0 = jax.random.key(7)
    lw = jax.random.normal(key0, (1, N), jnp.float32) * 4.0
    w_row = jnp.exp(lw - jnp.max(lw))
    w_row = w_row / jnp.sum(w_row)
    t0r = rp.slot_boundaries(w_row, N, jnp.float32(0.37))
    tp0 = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), t0r[:, :-1]], axis=-1)
    f0 = np.asarray((t0r > tp0).astype(jnp.int32))[0]
    log(f"survivors={f0.sum()} ({f0.sum()/N*100:.2f}%) "
        f"max/1024={f0.reshape(-1, 1024).sum(-1).max()}")
    p = jax.random.normal(jax.random.key(2), (3, N), jnp.float32)
    key = jax.random.key(5)

    t_in, t_k, t_out, w_b = 1024, 256, 2048, 4
    wb2 = 128
    nt_in = N // t_in
    nw = t_k // wb2

    def hist_full(k0, p, w, salt):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        idx = resample_indices(k, w[0], method="hist")
        return jnp.sum(p[:, idx])
    log(f"hist full (sum-all) : {call_time(loop20(hist_full), key, p, w_row)/STEPS*1e3:.3f} ms")

    def stages(k0, p, w, salt, upto):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        offs = jax.random.uniform(k, dtype=jnp.float32)
        t_row = rp.slot_boundaries(w, N, offs)
        tprev = jnp.concatenate(
            [jnp.zeros((1, 1), jnp.int32), t_row[:, :-1]], axis=-1)
        f_row = (t_row > tprev).astype(jnp.int32)
        g_row = jnp.cumsum(f_row, axis=-1) - f_row
        cnt = f_row[0].reshape(nt_in, t_in).sum(axis=-1)
        stack5 = jnp.concatenate(
            [p.astype(jnp.float32), t_row.astype(jnp.float32),
             tprev.astype(jnp.float32)], axis=0)
        hml = rp.split3(stack5)
        vals15 = jnp.stack(hml, axis=1).reshape(rp._ROWS, N)
        if upto == "glue":
            return jnp.sum(vals15.astype(jnp.float32)) + jnp.sum(g_row)
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
        if upto == "pass1":
            return jnp.sum(bc.astype(jnp.float32))
        nh, nm, nl = rp.split3(jnp.float32(N))
        tail = jnp.zeros((rp._ROWS, w_b * wb2), jnp.bfloat16)
        for r, v in ((9, nh), (10, nm), (11, nl), (12, nh), (13, nm),
                     (14, nl)):
            tail = tail.at[r].set(v)
        tc15 = jnp.concatenate([bc, tail], axis=1)
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
        tc_hi = (tc15[9].astype(jnp.float32)
                 + tc15[10].astype(jnp.float32)
                 + tc15[11].astype(jnp.float32))
        tb_last = tc_hi[(blk_ids + 1) * wb2 - 1]
        nt_out = N // t_out
        i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
        i_last = jnp.minimum(i0 + t_out, N) - 1
        sb_raw = jnp.searchsorted(tb_last, i0.astype(jnp.float32),
                                  side="right").astype(jnp.int32)
        le = jnp.searchsorted(tb_last, i_last.astype(jnp.float32),
                              side="right").astype(jnp.int32)
        sb = jnp.clip(sb_raw, 0, n_blk - w_b)
        span = jnp.clip(le - sb + 1, 1, w_b)
        if upto == "skiptab":
            return (jnp.sum(tc15.astype(jnp.float32))
                    + jnp.sum(sb + span) + jnp.sum(blk_ids))
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
            out_shape=jax.ShapeDtypeStruct((3, N), jnp.float32),
        )(sb, span, blk_ids, tc15)
        return jnp.sum(out)

    for upto in ("glue", "pass1", "skiptab", "expand"):
        fn = functools.partial(stages, upto=upto)
        fn.__name__ = upto
        wrapped = lambda k0, p, w, salt, _f=fn: _f(k0, p, w, salt=salt)
        dt = call_time(loop20(wrapped), key, p, w_row) / STEPS
        log(f"cum->{upto:8s}       : {dt*1e3:.3f} ms")

    def full(k0, p, w, salt):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        out = rp.merge_resample_rows(k, p, w, N, t_in=t_in, t_k=t_k,
                                     t_out=t_out, w_b=w_b)
        return jnp.sum(out)
    log(f"full (with cond)    : {call_time(loop20(full), key, p, w_row)/STEPS*1e3:.3f} ms")

    log("ALL DONE")


if __name__ == "__main__":
    main()
