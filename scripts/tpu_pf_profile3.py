#!/usr/bin/env python
"""Sublane-packed PF kernel layout experiment at 2M particles.

tpu_pf_profile2.py showed the fused PF stats kernel's cost is dominated
by the reduction block (0.52 ms/step) + Box-Muller (0.47) over a 0.28
DMA floor, with the actual filter math nearly free.  All kernel rows are
``(1, tile)`` - one sublane of eight per f32 vreg - so every VPU op may
be running at 1/8 occupancy.  This micro re-runs the same per-element
work with particles packed ``(8, tile/8)`` per logical row (x rows 0-7,
y rows 8-15, yaw rows 16-23; lw (8, tile/8)) to measure the ceiling of a
layout change.
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.filters.pf import PfConfig
from tpuslam.ops.fastmath import normals, sincos_rad

N = int(os.environ.get("PF_N", 2 * 1024 * 1024))
TILE = 2048  # particles per grid step (8 sublanes x 256 lanes)
N8 = N // 8
T8 = TILE // 8
STEPS = 100
_TWO_PI = 2.0 * math.pi


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


def make_kernel(cfg, noise, lik, stats):
    def kern(seed_ref, z_ref, p_in_ref, lw_in_ref, p_out_ref, lw_out_ref,
             st_ref, acc_ref):
        if noise:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        x = p_in_ref[0:8, :]
        y = p_in_ref[8:16, :]
        yaw = p_in_ref[16:24, :]
        lw = lw_in_ref[:, :]
        lane = x.shape  # (8, T8)
        if noise:
            n = normals(lane, 4)
        else:
            n = [jnp.zeros(lane, jnp.float32)] * 4
        v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt
        q0, q1, q2 = cfg.q_std
        c_o, s_o = sincos_rad(yaw)
        x = x + v * dt * c_o + n[0] * q0
        y = y + v * dt * s_o + n[1] * q1
        mag = jnp.abs(yaw + w * dt)
        k = jnp.maximum(jnp.ceil((mag - math.pi) / _TWO_PI), 0.0)
        yaw = jnp.where(yaw < 0, -(mag - _TWO_PI * k),
                        mag - _TWO_PI * k) + n[2] * q2
        if lik:
            sx, sy = cfg.r_std
            c_n, s_n = sincos_rad(yaw)
            c, s = s_n, c_n
            log_norm = math.log(_TWO_PI * sx * sy)
            acc = jnp.zeros(lane, jnp.float32)
            for li, (lm_x, lm_y) in enumerate(cfg.landmarks):
                dx = lm_x - x
                dy = lm_y - y
                px_l = c * dx - s * dy
                py_l = s * dx + c * dy
                ddx = (px_l - z_ref[li, 0]) / sx
                ddy = (py_l - z_ref[li, 1]) / sy
                acc = acc - 0.5 * (ddx * ddx + ddy * ddy) - log_norm
            lw = lw + acc
        else:
            lw = lw + n[3]
        p_out_ref[0:8, :] = x
        p_out_ref[8:16, :] = y
        p_out_ref[16:24, :] = yaw
        lw_out_ref[:, :] = lw
        if stats:
            pid = pl.program_id(0)
            # Global particle index: sublane-major within the tile.
            sub = jax.lax.broadcasted_iota(jnp.int32, lane, 0)
            ln = jax.lax.broadcasted_iota(jnp.int32, lane, 1)
            idx = (sub * T8 + ln).astype(jnp.float32) \
                + pid.astype(jnp.float32) * float(TILE)
            neg_inf = jnp.float32(-jnp.inf)
            tile_max = jnp.max(lw)
            e = jnp.exp(lw - tile_max)
            tile_sum = jnp.sum(e)
            tile_sum2 = jnp.sum(e * e)
            best_idx = jnp.max(jnp.where(lw == tile_max, idx, neg_inf))
            sel = idx == best_idx
            bx = jnp.max(jnp.where(sel, x, neg_inf))
            by = jnp.max(jnp.where(sel, y, neg_inf))
            byaw = jnp.max(jnp.where(sel, yaw, neg_inf))

            @pl.when(pid == 0)
            def _init():
                acc_ref[0] = tile_max
                acc_ref[1] = tile_sum
                acc_ref[2] = 2.0 * tile_max
                acc_ref[3] = tile_sum2
                acc_ref[4] = tile_max
                acc_ref[5] = bx
                acc_ref[6] = by
                acc_ref[7] = byaw

            @pl.when(pid > 0)
            def _accum():
                m_old = acc_ref[0]
                m_new = jnp.maximum(m_old, tile_max)
                acc_ref[1] = (acc_ref[1] * jnp.exp(m_old - m_new)
                              + tile_sum * jnp.exp(tile_max - m_new))
                acc_ref[0] = m_new
                m2_old = acc_ref[2]
                m2_new = jnp.maximum(m2_old, 2.0 * tile_max)
                acc_ref[3] = (acc_ref[3] * jnp.exp(m2_old - m2_new)
                              + tile_sum2 * jnp.exp(2.0 * tile_max
                                                    - m2_new))
                acc_ref[2] = m2_new
                better = tile_max > acc_ref[4]
                acc_ref[4] = jnp.where(better, tile_max, acc_ref[4])
                acc_ref[5] = jnp.where(better, bx, acc_ref[5])
                acc_ref[6] = jnp.where(better, by, acc_ref[6])
                acc_ref[7] = jnp.where(better, byaw, acc_ref[7])

            @pl.when(pid == pl.num_programs(0) - 1)
            def _fin():
                st_ref[0] = acc_ref[0] + jnp.log(acc_ref[1])
                st_ref[1] = acc_ref[2] + jnp.log(acc_ref[3])
                st_ref[2] = acc_ref[5]
                st_ref[3] = acc_ref[6]
                st_ref[4] = acc_ref[7]
                st_ref[5] = acc_ref[4]
        else:
            @pl.when(pl.program_id(0) == 0)
            def _fin0():
                for i in range(6):
                    st_ref[i] = 0.0
    return kern


def run(name, noise, lik, stats):
    cfg = PfConfig(num_particles=N, weight_mode="log")
    kern = make_kernel(cfg, noise, lik, stats)
    row24 = pl.BlockSpec((24, T8), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    row8 = pl.BlockSpec((8, T8), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

    def step(p, lw, seed):
        return pl.pallas_call(
            kern,
            grid=(N8 // T8,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      row24, row8],
            out_shape=(jax.ShapeDtypeStruct((24, N8), jnp.float32),
                       jax.ShapeDtypeStruct((8, N8), jnp.float32),
                       jax.ShapeDtypeStruct((6,), jnp.float32)),
            out_specs=(row24, row8,
                       pl.BlockSpec((6,), lambda i: (0,),
                                    memory_space=pltpu.SMEM)),
            scratch_shapes=[pltpu.SMEM((8,), jnp.float32)],
            input_output_aliases={2: 0, 3: 1},
        )(jnp.asarray([seed], jnp.int32),
          jnp.zeros((5, 2), jnp.float32), p, lw)

    @jax.jit
    def roll(seed0):
        p = jnp.zeros((24, N8), jnp.float32)
        lw = jnp.zeros((8, N8), jnp.float32)

        def body(carry, _):
            p, lw, seed = carry
            p, lw, st = step(p, lw, seed)
            return (p, lw, seed + 7919), st[0]

        (p, lw, _), s = jax.lax.scan(
            body, (p, lw, jnp.asarray(1, jnp.int32)), jnp.arange(STEPS))
        return jnp.sum(p) * 0.0 + jnp.sum(jnp.where(jnp.isfinite(s), 0.0,
                                                    1.0))

    dt = timed(roll, 0)
    log(f"{name:11s}: {dt/STEPS*1e3:.3f} ms/step "
        f"({N*STEPS/dt:.3e} p-steps/s)")


def main():
    log(f"devices: {jax.devices()}  N={N} packed (8, {T8}) tiles")
    run("full", True, True, True)
    run("no_noise", False, True, True)
    run("no_stats", True, True, False)
    run("noise_only", True, False, False)
    run("empty", False, False, False)
    log("ALL DONE")


if __name__ == "__main__":
    main()
