#!/usr/bin/env python
"""Ablate the batched-PF FIRING path cost term by term on the real chip.

scripts/tpu_pf_batch_floor.py measured 2.35 us/firing-filter (pre
exc-dot removal; 2.08 us after) at 8192x1000 g=8 r=8 P=1024, and the
first compact-then-expand attempt only recovered ~0.15 us - so the cost
model (mask build + big dots dominate) needs measuring, not guessing.

This micro-kernel replicates ONLY the firing math (relayout + split +
cumsum + boundaries + expand + writeback), unpredicated, every step,
for variants:

  base      cum = lt_inc dot, expand = (P, P) interval mask + v9 dot
  nomaskb   as base but the mask is a reused constant (no iota/compare)
  nodot     as base but the value dot is skipped (mask still built)
  hiercum   cum via _hprefix_exact (reshape-hierarchical), no lt dot
  compact   rank dot + sel + (15, P)@(P, t_k) + (P, t_k) expand
  comphier  compact with BOTH prefixes hierarchical (no (P, P) dots)
  empty     gate stats + relayouts only (floor of this micro-kernel)

Per-filter cost = (t_variant - t_empty) / (b * steps)."""

import functools
import math
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

from tpuslam.filters.pf import boundary_law
from tpuslam.ops.resample_pallas import _hprefix_exact, split3_kernel


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


R = 8
G = 8
P = 1024
P8 = P // R
N = 1000
T_K = 128


def _kernel(lt_ref, p_ref, lw_ref, p_out_ref, lw_out_ref, flat3, flat1,
            *, variant: str):
    neg_inf = jnp.float32(-jnp.inf)
    lane1 = (jax.lax.broadcasted_iota(jnp.int32, (R, P8), 0) * P8
             + jax.lax.broadcasted_iota(jnp.int32, (R, P8), 1))
    valid1 = lane1 < N

    for k in range(G):
        cols = slice(k * P8, (k + 1) * P8)
        lw = lw_ref[:, cols]
        m = jnp.max(lw)
        e = jnp.exp(lw - m)
        s = jnp.sum(e)
        lw_norm = jnp.where(valid1, lw - (m + jnp.log(s)), neg_inf)
        lw_out_ref[:, cols] = lw_norm
        if variant == "empty":
            for v in range(3):
                for kk in range(R):
                    p_out_ref[v * R + kk:v * R + kk + 1, cols] = \
                        p_ref[v * R + kk:v * R + kk + 1, cols] * 1.0001
            continue

        w = jnp.exp(lw_norm)
        wq = jnp.round(w * float(1 << 20))
        for kk in range(R):
            flat1[0:1, kk * P8:(kk + 1) * P8] = wq[kk:kk + 1, :]
        wq_f = flat1[0:1, :]
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        wh, wm, wl = split3_kernel(wq_f)
        if variant in ("hiercum", "comphier"):
            cum_e = _hprefix_exact([wh, wm, wl], P)
            cum_i = cum_e + wq_f
        else:
            w3 = jnp.concatenate([wh, wm, wl], axis=0)
            ci3 = jax.lax.dot_general(
                w3, lt_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cum_i = ci3[0:1] + ci3[1:2] + ci3[2:3]
            cum_e = cum_i - wq_f
        q_tot = jnp.max(cum_i)
        inv_tot = 1.0 / q_tot
        t_hi = jnp.clip(boundary_law(cum_i, inv_tot, N, 0.5), 0.0,
                        float(N))
        t_hi = jnp.where(lane_f >= N - 1, float(N), t_hi)
        t_lo = jnp.clip(boundary_law(cum_e, inv_tot, N, 0.5), 0.0,
                        float(N))
        t_lo = jnp.where(lane_f >= N, float(N), t_lo)

        for v in range(3):
            for kk in range(R):
                flat3[v:v + 1, kk * P8:(kk + 1) * P8] = \
                    p_ref[v * R + kk:v * R + kk + 1, cols]
        vh, vm, vl = split3_kernel(flat3[:, :])
        v9 = jnp.concatenate([vh, vm, vl], axis=0)

        if variant in ("base", "nomaskb", "nodot", "hiercum"):
            if variant == "nomaskb":
                msk = lt_ref[:, :]
            else:
                i_sub = jax.lax.broadcasted_iota(
                    jnp.int32, (P, P), 0).astype(jnp.float32)
                msk = ((i_sub >= t_lo) & (i_sub < t_hi)
                       ).astype(jnp.bfloat16)
            if variant == "nodot":
                part = msk[0:9, :].astype(jnp.float32)
            else:
                part = jax.lax.dot_general(
                    v9, msk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:  # compact / comphier
            f_srv = (t_hi > t_lo).astype(jnp.float32)
            fb = f_srv.astype(jnp.bfloat16)
            if variant == "comphier":
                rank_e = _hprefix_exact([fb], P)
            else:
                rk = jax.lax.dot_general(
                    fb, lt_ref[:, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                rank_e = rk - f_srv
            krow = jax.lax.broadcasted_iota(
                jnp.int32, (T_K, P), 0).astype(jnp.float32)
            sel = ((krow == rank_e) & (f_srv > 0.0)).astype(jnp.bfloat16)
            th3 = split3_kernel(t_hi)
            tl3 = split3_kernel(t_lo)
            stack = jnp.concatenate(
                [v9, th3[0], th3[1], th3[2], tl3[0], tl3[1], tl3[2]],
                axis=0)
            tc = jax.lax.dot_general(
                stack, sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            t_hi_c = tc[9:10] + tc[10:11] + tc[11:12]
            t_lo_c = tc[12:13] + tc[13:14] + tc[14:15]
            vc = tc[0:9].astype(jnp.bfloat16)
            i2 = jax.lax.broadcasted_iota(
                jnp.int32, (P, T_K), 0).astype(jnp.float32)
            m2 = ((i2 >= t_lo_c) & (i2 < t_hi_c)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                vc, m2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        px = part[0:1] + part[3:4] + part[6:7]
        py = part[1:2] + part[4:5] + part[7:8]
        pyaw = part[2:3] + part[5:6] + part[8:9]
        for kk in range(R):
            sl = slice(kk * P8, (kk + 1) * P8)
            p_out_ref[kk:kk + 1, cols] = px[0:1, sl]
            p_out_ref[R + kk:R + kk + 1, cols] = py[0:1, sl]
            p_out_ref[2 * R + kk:2 * R + kk + 1, cols] = pyaw[0:1, sl]


def rollout(variant: str, b: int, steps: int):
    ii = jnp.arange(P, dtype=jnp.int32)
    lt = (ii[:, None] <= ii[None, :]).astype(jnp.bfloat16)
    kern = functools.partial(_kernel, variant=variant)
    row3 = pl.BlockSpec((3 * R, G * P8), lambda c: (0, c),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((R, G * P8), lambda c: (0, c),
                        memory_space=pltpu.VMEM)
    const = pl.BlockSpec((P, P), lambda c: (0, 0),
                         memory_space=pltpu.VMEM)

    def step(carry, _):
        p, lw = carry
        p2, lw2 = pl.pallas_call(
            kern,
            grid=(b // G,),
            in_specs=[const, row3, row1],
            out_shape=(jax.ShapeDtypeStruct(p.shape, jnp.float32),
                       jax.ShapeDtypeStruct(lw.shape, jnp.float32)),
            out_specs=(row3, row1),
            scratch_shapes=[pltpu.VMEM((3, P), jnp.float32),
                            pltpu.VMEM((1, P), jnp.float32)],
            input_output_aliases={1: 0, 2: 1},
        )(lt, p, lw)
        return (p2, lw2), None

    @jax.jit
    def run(key):
        p = jax.random.normal(key, (3 * R, b * P8), jnp.float32)
        lane = (jnp.arange(b * P8)[None, :] % P8
                + jnp.arange(R)[:, None] * P8)
        lw = jnp.where(lane < N,
                       jax.random.normal(key, (R, b * P8)) * 0.3,
                       -jnp.inf)
        (p2, lw2), _ = jax.lax.scan(step, (p, lw), None, length=steps)
        return jnp.sum(p2) + jnp.sum(jnp.where(jnp.isfinite(lw2), lw2,
                                               0.0))

    return run


def main():
    log(f"devices: {jax.devices()}")
    b, steps = 8192, 50
    times = {}
    for variant in ("empty", "base", "nomaskb", "nodot", "hiercum",
                    "compact", "comphier"):
        fn = rollout(variant, b, steps)
        k = jax.random.key(0)
        float(fn(k))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(k))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        times[variant] = dt
        per = (dt - times.get("empty", 0.0)) / (b * steps) * 1e6
        log(f"{variant:10s}: {dt / steps * 1e3:7.3f} ms/step "
            f"({per:6.3f} us/filter over empty)")
    log("ALL DONE")


if __name__ == "__main__":
    main()
