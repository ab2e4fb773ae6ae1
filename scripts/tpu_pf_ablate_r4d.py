#!/usr/bin/env python
"""Round-4 PF ablation, part D: decompose the merge resample's 6 ms at
2M (r4c: pass 1 alone 3.0 ms, full merge 6.0 ms at 14% survivors) into
actionable pieces, and price the building blocks of a restructured
pass 2 (the "two wide windows over a block-compressed stack" design):

  p1 t2048/512        pass 1 at the r4c-best caps (grid halved)
  p1 no-dot           pass 1 with the compact dot + sel build removed
                      (boundary build + flag/rank only): splits pass 1
                      into boundary cost vs compaction cost
  p2 given p1         skip_table + expand_compacted on fixed pass-1
                      outputs (the rest of the production merge)
  compress take       XLA block-compress of the compacted stack
                      (take of ~n_comp (15, wb2) row-blocks): the new
                      glue the restructured pass 2 would need
  p2 on compressed    expand with blk_ids = identity (windows
                      contiguous): upper bound for the wide-window
                      design's kernel side (same DMA count as today's
                      pass 2 - the win would come from index-map
                      elision, measured by the 2-ref variant below)

Production regime note: r4c's lognormal sigma=2.15 gives ESS ~1.4%,
survivors ~14%.  The production gate fires at ESS < n/2 with survivors
~5%; survivor-count-independent costs (boundary build, fetch counts)
dominate, so the split, not the absolute, is the signal.
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
T_K = 512


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


def make_weights(key, sigma=2.15):
    z = jax.random.normal(key, (N,), jnp.float32) * sigma
    return jnp.exp(z - jax.scipy.special.logsumexp(z))


def main():
    from tpuslam.ops.resample_pallas import (_ROWS, boundary_compact_particles,
                                             expand_compacted, inert_tail,
                                             merge_caps, skip_table)

    log(f"devices: {jax.devices()}  N={N}  caps t_in={T_IN} t_k={T_K}")
    k0 = jax.random.key(7)
    p_rows = jax.random.normal(k0, (3, N), jnp.float32)
    w_row = make_weights(jax.random.key(8))[None, :]
    t_in, t_k, t_out, w_b, wb2 = merge_caps(N, T_IN, T_K)
    nt_in = N // t_in
    nw = t_k // wb2

    def scan20(body, *carry_and_args):
        """min-of-3 timing of 20 keyed iterations of `body`."""

        @jax.jit
        def roll(key, *a):
            def step(c, k):
                return body(k, *a), 0.0

            keys = jax.random.split(key, REPS_IN)
            c, _ = jax.lax.scan(step, 0.0, keys)
            return c

        dt = timed(roll, k0, *carry_and_args)
        return dt / REPS_IN

    # --- pass 1 at the r4c-best caps ---
    def p1_body(k, p, wr):
        offs = jax.random.uniform(k, dtype=jnp.float32)
        bc, cnt = boundary_compact_particles(p, wr, N, offs, t_in, t_k,
                                             False)
        return jnp.float32(jnp.max(cnt)) + bc[0, 0].astype(jnp.float32)

    dt = scan20(p1_body, p_rows, w_row)
    log(f"{'p1 t2048/512':26s}: {dt * 1e3:.3f} ms/call")

    # --- pass 1 with the compact dot removed (boundary-only kernel) ---
    from tpuslam.filters.pf import boundary_law
    from tpuslam.ops.resample_pallas import (_hprefix_exact, quantize_weights,
                                             split3_kernel)

    def _boundary_only_kernel(base_ref, par_ref, lane0_ref, p_ref, wq_ref,
                              cnt_ref):
        b = pl.program_id(0)
        wq = wq_ref[0:1, :]
        wh, wm, wl = split3_kernel(wq)
        cum_ex = _hprefix_exact([wh, wm, wl], t_in) + base_ref[b]
        cum_in = cum_ex + wq
        lane = (jax.lax.broadcasted_iota(jnp.int32, (1, t_in), 1)
                + lane0_ref[b])
        nf = jnp.float32(N)

        def bound(cum, force_ge):
            t = boundary_law(cum, par_ref[0], nf, par_ref[1])
            t = jnp.clip(t, 0.0, nf)
            return jnp.where(lane >= force_ge, nf, t)

        t_hi = bound(cum_in, N - 1)
        t_lo = bound(cum_ex, N)
        f = (t_hi > t_lo).astype(jnp.float32)
        # touch p so the input DMA stays (production fetches it too)
        cnt_ref[0, b] = (jnp.sum(f) + p_ref[0, 0] * 1e-20).astype(
            jnp.int32)

    def p1_nodot_body(k, p, wr):
        offs = jax.random.uniform(k, dtype=jnp.float32)
        wq, base, q_tot = quantize_weights(wr, N, t_in)
        params = jnp.stack([1.0 / q_tot.astype(jnp.float32),
                            offs.astype(jnp.float32)])
        lane0 = jnp.arange(nt_in, dtype=jnp.int32) * t_in
        cnt = pl.pallas_call(
            _boundary_only_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nt_in,),
                in_specs=[
                    pl.BlockSpec((3, t_in), lambda b, *_: (0, b),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, t_in), lambda b, *_: (0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            ),
            out_shape=[jax.ShapeDtypeStruct((1, nt_in), jnp.int32)],
            interpret=False,
        )(base.astype(jnp.float32), params, lane0, p, wq)[0]
        return jnp.float32(jnp.max(cnt))

    dt = scan20(p1_nodot_body, p_rows, w_row)
    log(f"{'p1 no-dot (boundary only)':26s}: {dt * 1e3:.3f} ms/call")

    # --- fixed pass-1 outputs for the pass-2 pieces ---
    offs0 = jnp.float32(0.37)
    bc0, cnt0 = jax.jit(
        lambda p, wr: boundary_compact_particles(p, wr, N, offs0, t_in,
                                                 t_k, False))(p_rows,
                                                              w_row)
    tc0 = jnp.concatenate([bc0, inert_tail(N, w_b, wb2)], axis=1)
    nt_out = N // t_out
    i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
    i_last = jnp.minimum(i0 + t_out, N) - 1

    def p2_body(k, tc, cnt):
        # perturb nothing; k only defeats CSE via a free add
        sb, span, need, blk_ids = skip_table(cnt, tc, t_k, wb2, w_b, i0,
                                             i_last, i0 < N)
        out = expand_compacted(tc, sb, span, blk_ids, i0, N, t_out, wb2,
                               w_b)
        return out[0, 0] + jax.random.uniform(k)

    dt = scan20(p2_body, tc0, cnt0)
    log(f"{'p2 given p1 (skip+expand)':26s}: {dt * 1e3:.3f} ms/call")

    # --- XLA block-compress: take of the nonempty (15, wb2) blocks ---
    n_comp_max = nt_in * nw

    def compress_body(k, tc, cnt):
        occ = (cnt[:, None]
               > jnp.arange(nw, dtype=cnt.dtype)[None, :] * wb2)
        nonempty = occ.reshape(-1).astype(jnp.int32)
        pos = jnp.cumsum(nonempty) - nonempty
        # compressed position -> source block id (empties -> tail)
        tgt = jnp.where(nonempty > 0, pos, n_comp_max)
        blk_ids = jnp.full((n_comp_max + 1,), n_comp_max, jnp.int32).at[
            tgt].set(jnp.arange(n_comp_max, dtype=jnp.int32),
                     mode="drop", unique_indices=True)[:n_comp_max]
        blocks = tc[:, :n_comp_max * wb2].reshape(_ROWS, n_comp_max, wb2)
        comp = jnp.take(blocks, blk_ids, axis=1)
        return comp[0, 0, 0].astype(jnp.float32) + jax.random.uniform(k)

    dt = scan20(compress_body, tc0, cnt0)
    log(f"{'compress take (n_comp blk)':26s}: {dt * 1e3:.3f} ms/call")

    # --- p2 on an identity-mapped (already-compressed) stack ---
    def p2_ident_body(k, tc, cnt):
        sb, span, need, blk_ids = skip_table(cnt, tc, t_k, wb2, w_b, i0,
                                             i_last, i0 < N)
        ident = jnp.arange(blk_ids.shape[0], dtype=jnp.int32)
        out = expand_compacted(tc, sb, span, ident, i0, N, t_out, wb2,
                               w_b)
        return out[0, 0] + jax.random.uniform(k)

    dt = scan20(p2_ident_body, tc0, cnt0)
    log(f"{'p2 identity blk_ids':26s}: {dt * 1e3:.3f} ms/call")
    log("ALL DONE")


if __name__ == "__main__":
    main()
