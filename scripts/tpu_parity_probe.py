"""Mosaic-vs-XLA boundary-law parity probe (one v5e chip).

Round-2 measurement found the fused pass-1 selection diverging from the
XLA decode on hardware (fused==unfused False).  Hypothesis: the boundary
law ``t = ceil(n * (cum / q_tot) - offs)`` divides inside the kernel,
and Mosaic's f32 division (a multi-instruction reciprocal+refine
sequence) rounds differently from XLA's on some lanes.  A single f32
MULTIPLY is one correctly-rounded hardware op on both compilers, so
``t = ceil(n * (cum * inv) - offs)`` with ``inv = 1/q_tot`` computed
once in XLA should agree bit-for-bit.

This probe evaluates BOTH laws on identical integer cumsums, in a
minimal kernel and in XLA, and counts mismatching lanes; then re-runs
the merge_resample fused==unfused smoke.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _law_kernel(params_ref, cum_ref, tdiv_ref, tmul_ref, *, n: int):
    q_tot = params_ref[0]
    inv = params_ref[1]
    offs = params_ref[2]
    cum = cum_ref[:, :]
    nf = jnp.float32(n)
    tdiv_ref[:, :] = jnp.ceil(nf * (cum / q_tot) - offs)
    tmul_ref[:, :] = jnp.ceil(nf * (cum * inv) - offs)


def probe(n, n_pad, seed):
    from tpuslam.filters.pf import quantize_weights_law

    rng = np.random.default_rng(seed)
    lw = rng.normal(size=n_pad) * 8.0
    lw[n:] = -np.inf
    w = np.exp(lw - lw[:n].max())
    w /= w.sum()
    w[n:] = 0.0
    w_row = jnp.asarray(w, jnp.float32)[None]

    total = jnp.sum(w_row, axis=-1, keepdims=True)
    wq = quantize_weights_law(w_row, total)
    cum = jnp.cumsum(wq, axis=-1).astype(jnp.float32)
    q_tot = cum[0, -1]
    inv = 1.0 / q_tot
    offs = jnp.float32(0.4711)

    @jax.jit
    def xla_laws(cum, q_tot, inv, offs):
        nf = jnp.float32(n)
        tdiv = jnp.ceil(nf * (cum / q_tot) - offs)
        tmul = jnp.ceil(nf * (cum * inv) - offs)
        return tdiv, tmul

    @jax.jit
    def kern_laws(cum, q_tot, inv, offs):
        params = jnp.stack([q_tot, inv, offs])
        return pl.pallas_call(
            functools.partial(_law_kernel, n=n),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((1, n_pad), lambda b, *_: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[
                    pl.BlockSpec((1, n_pad), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n_pad), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            ],
        )(params, cum)

    xd, xm = xla_laws(cum, q_tot, inv, offs)
    kd, km = kern_laws(cum, q_tot, inv, offs)
    nd = int(jnp.sum(xd[0, :n] != kd[0, :n]))
    nm = int(jnp.sum(xm[0, :n] != km[0, :n]))
    print(f"n={n}: div-law kernel!=XLA lanes: {nd}; "
          f"mul-law kernel!=XLA lanes: {nm}", flush=True)
    return nd, nm


def fused_smoke(n, n_pad, seed):
    from tpuslam.ops.resample_pallas import (decode_indices,
                                             merge_resample_rows,
                                             slot_boundaries)

    rng = np.random.default_rng(seed)
    lw = rng.normal(size=n_pad) * 8.0
    lw[n:] = -np.inf
    w = np.exp(lw - lw[:n].max())
    w /= w.sum()
    w[n:] = 0
    w_row = jnp.asarray(w, jnp.float32)[None]
    p = jnp.asarray(rng.normal(size=(3, n_pad)), jnp.float32)
    key = jax.random.key(seed)
    a = merge_resample_rows(key, p, w_row, n, fused=True)
    b = merge_resample_rows(key, p, w_row, n, fused=False)

    @jax.jit
    def oracle(p, w_row):
        offs = jax.random.uniform(key, dtype=jnp.float32)
        t_row = slot_boundaries(w_row, n, offs)
        idx = decode_indices(t_row, n)
        return jnp.zeros_like(p).at[:, :n].set(p[:, :n][:, idx])

    o = oracle(p, w_row)
    eq = bool(jnp.all(a == b))
    eq_fo = bool(jnp.all(a == o))
    eq_uo = bool(jnp.all(b == o))
    print(f"n={n}: fused==unfused: {eq}; fused==oracle: {eq_fo}; "
          f"unfused==oracle: {eq_uo}", flush=True)
    return eq and eq_fo and eq_uo


def main():
    print("device:", jax.devices()[0], flush=True)
    for seed in range(3):
        probe(5000, 8192, seed)
    probe(1_000_000, 1 << 20, 0)
    for seed in range(3):
        fused_smoke(5000, 8192, seed)
    fused_smoke(1_000_000, 1 << 20, 0)


if __name__ == "__main__":
    main()
