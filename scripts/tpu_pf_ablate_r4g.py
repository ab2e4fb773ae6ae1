#!/usr/bin/env python
"""Round-4 PF ablation, part G: where does the pass-1 BOUNDARY build's
~1.7 ms at 2M actually go?

r4f falsified the relayout/occupancy theory (segment-packed pass 1 ==
flat pass 1 within 4%).  This strips the boundary-only kernel stage by
stage - all variants (1024 one-tile cells, t_in=2048) write cnt so the
work isn't dead-code-eliminated:

  full       split3 + hierarchical prefix + 2x boundary_law + flag
  no-prefix  cum := wq + base (garbage values, same dtype/shape): costs
             of split3 + triangular dot + log-step isolated
  no-law     t_hi/t_lo := cum_in/cum_ex directly (no mul/ceil/clip/
             where): boundary-law chain isolated
  flag-only  f := wq > 0 on the raw input: everything but the compare
             gone (DMA + iota + sum floor)
  dma-only   cnt := p[0,0] + wq[0,0]: pure fetch floor
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


def main():
    from tpuslam.filters.pf import boundary_law
    from tpuslam.ops.resample_pallas import (_hprefix_exact,
                                             quantize_weights,
                                             split3_kernel)

    log(f"devices: {jax.devices()}  N={N}  t_in={T_IN}")
    k0 = jax.random.key(7)
    p_rows = jax.random.normal(k0, (3, N), jnp.float32)
    z = jax.random.normal(jax.random.key(8), (N,), jnp.float32) * 3.2
    w_row = jnp.exp(z - jax.scipy.special.logsumexp(z))[None, :]
    nt_in = N // T_IN

    def make_kernel(mode):
        def kern(base_ref, par_ref, lane0_ref, p_ref, wq_ref, cnt_ref):
            b = pl.program_id(0)
            wq = wq_ref[0:1, :]
            if mode == "dma-only":
                cnt_ref[0, b] = (p_ref[0, 0] + wq[0, 0]).astype(jnp.int32)
                return
            if mode == "flag-only":
                f = (wq > 0).astype(jnp.float32)
                cnt_ref[0, b] = (jnp.sum(f) + p_ref[0, 0] * 1e-20).astype(
                    jnp.int32)
                return
            if mode == "no-prefix":
                cum_ex = wq + base_ref[b]
            else:
                wh, wm, wl = split3_kernel(wq)
                cum_ex = _hprefix_exact([wh, wm, wl], T_IN) + base_ref[b]
            cum_in = cum_ex + wq
            lane = (jax.lax.broadcasted_iota(jnp.int32, (1, T_IN), 1)
                    + lane0_ref[b])
            nf = jnp.float32(N)
            if mode == "no-law":
                t_hi = jnp.where(lane >= N - 1, nf, cum_in)
                t_lo = jnp.where(lane >= N, nf, cum_ex)
            else:
                def bound(cum, force_ge):
                    t = boundary_law(cum, par_ref[0], nf, par_ref[1])
                    t = jnp.clip(t, 0.0, nf)
                    return jnp.where(lane >= force_ge, nf, t)

                t_hi = bound(cum_in, N - 1)
                t_lo = bound(cum_ex, N)
            f = (t_hi > t_lo).astype(jnp.float32)
            cnt_ref[0, b] = (jnp.sum(f) + p_ref[0, 0] * 1e-20).astype(
                jnp.int32)
        return kern

    def run(mode):
        kern = make_kernel(mode)

        def body(k, p, wr):
            offs = jax.random.uniform(k, dtype=jnp.float32)
            wq, base, q_tot = quantize_weights(wr, N, T_IN)
            params = jnp.stack([1.0 / q_tot.astype(jnp.float32),
                                offs.astype(jnp.float32)])
            lane0 = jnp.arange(nt_in, dtype=jnp.int32) * T_IN
            cnt = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(nt_in,),
                    in_specs=[
                        pl.BlockSpec((3, T_IN), lambda b, *_: (0, b),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, T_IN), lambda b, *_: (0, b),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                ),
                out_shape=[jax.ShapeDtypeStruct((1, nt_in), jnp.int32)],
            )(base.astype(jnp.float32), params, lane0, p, wq)[0]
            return jnp.float32(jnp.max(cnt))

        @jax.jit
        def roll(key, p, wr):
            def step(c, k):
                return body(k, p, wr), 0.0

            keys = jax.random.split(key, REPS_IN)
            c, _ = jax.lax.scan(step, 0.0, keys)
            return c

        dt = timed(roll, jax.random.key(7), p_rows, w_row) / REPS_IN
        log(f"{mode:10s}: {dt * 1e3:.3f} ms/call")

    for mode in ("full", "no-prefix", "no-law", "flag-only", "dma-only"):
        run(mode)
    log("ALL DONE")


if __name__ == "__main__":
    main()
