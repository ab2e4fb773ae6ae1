#!/usr/bin/env python
"""Ablate the wide-PF pass-A tile body to find its real per-tile cost.

scripts/tpu_wide_profile4.py stage 3 holds at ~8 ms/step (0.78 us/tile
at 1024x10k) through three targeted cuts (hierarchical prefix, hoisted
krow, folded rank mask) - so the dominant term is NOT the prefix
triangular this script's siblings assumed.  Run the pass-A call alone
in a scan with carried inputs, compiled with pieces of the tile body
cut out, and read the deltas.

cuts (cumulative from 'full'):
  full        the production tile body
  nostack     skip the [p3 t_hi t_lo] split/interleave value stack
              (dot a dummy 15-row block instead)
  nodot       also skip the compact one-hot dot + sel build
  norank      also skip the survivor-rank prefix (dummy rank)
  nolaw       also skip boundary law + wq prefix (write wq-derived fill)
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


CUTS = ("full", "nostack", "nodot", "norank", "nolaw")


def tile_body(wq, p3, base, inv_tot, offs, lane0, n, t_k, koff, krow,
              cut):
    from tpuslam.ops.resample_pallas import (_ROWS, _hprefix_exact,
                                             split3_kernel)
    from tpuslam.filters.pf import boundary_law

    t_in = wq.shape[1]
    lvl = CUTS.index(cut)
    if lvl >= 4:  # nolaw
        cnt = wq[0, 0]
        row = wq[:, :t_k].astype(jnp.bfloat16)
        out = jnp.concatenate([row] * 15, axis=0)
        return out, cnt

    wh, wm, wl = split3_kernel(wq)
    cum_ex = _hprefix_exact([wh, wm, wl], t_in) + base
    cum_in = cum_ex + wq
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, t_in), 1) + lane0)
    nf = jnp.float32(n)

    def bound(cum, force_ge):
        t = boundary_law(cum, inv_tot, nf, offs)
        t = jnp.clip(t, 0.0, nf)
        return jnp.where(lane >= force_ge, nf, t)

    t_hi = bound(cum_in, n - 1)
    t_lo = bound(cum_ex, n)
    f = (t_hi > t_lo).astype(jnp.float32)
    t_hi = t_hi + koff
    t_lo = t_lo + koff

    if lvl >= 3:  # norank
        rank = cum_ex * 0.0
        cnt = rank[0, t_in - 1] + f[0, t_in - 1]
    else:
        rank = _hprefix_exact([f.astype(jnp.bfloat16)], t_in)
        cnt = rank[0, t_in - 1] + f[0, t_in - 1]

    if lvl >= 2:  # nodot
        row = (rank + t_hi + t_lo)[:, :t_k].astype(jnp.bfloat16)
        out = jnp.concatenate([row] * 15, axis=0)
        return out, cnt

    rank_m = jnp.where(f > 0, rank, jnp.float32(-1.0))
    sel = (krow == rank_m).astype(jnp.bfloat16)

    if lvl >= 1:  # nostack
        vals = jnp.concatenate(
            [p3.astype(jnp.bfloat16)] * 5, axis=0)
    else:
        stack5 = jnp.concatenate([p3, t_hi, t_lo], axis=0)
        hml = split3_kernel(stack5)
        vals = jnp.stack(hml, axis=1).reshape(_ROWS, t_in)
    compact = jax.lax.dot_general(
        vals, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    kcol = (jax.lax.broadcasted_iota(jnp.int32, (1, t_k), 1)
            .astype(jnp.float32))
    live = kcol < cnt
    fill_src = vals[:, t_in - 1:t_in]
    fill = jnp.concatenate([fill_src[0:12], fill_src[9:12]], axis=0)
    return jnp.where(live, compact.astype(jnp.bfloat16), fill), cnt


def kernel(fids_ref, base_ref, inv_ref, offs_ref, valid_ref, p_ref,
           wq_ref, out_ref, cnt_ref, *, t_k, n, w_tiles, g_a, tile_n,
           cut):
    c = pl.program_id(0)
    wc = pl.program_id(1)
    koff = ((c % 256).astype(jnp.float32)
            * jnp.float32(w_tiles * tile_n + 1))
    live = valid_ref[c] > 0
    krow = (jax.lax.broadcasted_iota(jnp.int32, (t_k, tile_n), 0)
            .astype(jnp.float32))

    for u in range(g_a):
        w = wc * g_a + u
        sid = c * w_tiles + w
        sl = slice(u * tile_n, (u + 1) * tile_n)

        @pl.when(live)
        def _go(w=w, sid=sid, sl=sl, u=u):
            out, cnt = tile_body(
                wq_ref[0:1, sl], p_ref[:, sl], base_ref[sid],
                inv_ref[c], offs_ref[c], w * tile_n, n, t_k, koff,
                krow, cut)
            out_ref[:, u * t_k:(u + 1) * t_k] = out
            cnt_ref[0, sid] = cnt.astype(jnp.int32)

        @pl.when(jnp.logical_not(live))
        def _skip(sid=sid):
            cnt_ref[0, sid] = 0


def run(cut, b=1024, n=10_000, tile_n=1024, steps=50):
    w_tiles = -(-n // tile_n)
    np_ = w_tiles * tile_n
    t_k = 256
    g_a = w_tiles
    wcells = 1
    cap_t = b

    key = jax.random.key(0)
    p_flat0 = jax.random.normal(key, (3, b * np_), jnp.float32)
    wq0 = jnp.abs(jax.random.normal(key, (1, b * np_), jnp.float32))
    fids = jnp.arange(cap_t, dtype=jnp.int32)
    base = jnp.zeros((cap_t * w_tiles,), jnp.float32)
    inv = jnp.full((cap_t,), 1e-6, jnp.float32)
    offs = jnp.full((cap_t,), 0.5, jnp.float32)
    valid = jnp.ones((cap_t,), jnp.int32)

    def call(p_flat, wq_rows):
        return pl.pallas_call(
            functools.partial(kernel, t_k=t_k, n=n, w_tiles=w_tiles,
                              g_a=g_a, tile_n=tile_n, cut=cut),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(cap_t, wcells),
                in_specs=[
                    pl.BlockSpec((3, g_a * tile_n),
                                 lambda c, w, fids, *_: (
                                     0, fids[c] * wcells + w),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, g_a * tile_n),
                                 lambda c, w, *_: (0, c * wcells + w),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((15, g_a * t_k),
                                 lambda c, w, *_: (0, c * wcells + w),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((15, cap_t * w_tiles * t_k),
                                     jnp.bfloat16),
                jax.ShapeDtypeStruct((1, cap_t * w_tiles), jnp.int32),
            ],
        )(fids, base, inv, offs, valid, p_flat, wq_rows)

    @jax.jit
    def roll(p_flat, wq_rows):
        def body(carry, _):
            p, wq = carry
            tc, cnt = call(p, wq)
            dep = tc[0, 0:1].astype(jnp.float32) * 0.0
            return (p + dep, wq + dep), cnt[0, 0]

        (_, _), cs = jax.lax.scan(body, (p_flat, wq_rows), None,
                                  length=steps)
        return jnp.sum(cs)

    float(roll(p_flat0, wq0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(roll(p_flat0, wq0))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / steps
    log(f"{cut:8s}: {ms:7.2f} ms/step ({ms * 1e3 / (cap_t * w_tiles):.3f}"
        f" us/tile)")
    return ms


def main():
    log(f"devices: {jax.devices()}")
    prev = None
    for cut in CUTS:
        ms = run(cut)
        if prev is not None:
            log(f"         delta vs prev: {prev - ms:+.2f} ms")
        prev = ms
    log("ALL DONE")


if __name__ == "__main__":
    main()
