#!/usr/bin/env python
"""Component ablation of the fused PF stats kernel at 2M particles.

The round-3 carry experiment (STATUS.md) showed cutting transcendental
counts does NOT speed the kernel up at 2M, contradicting the nominal
"transcendental-bound" picture from the 1M noise-on/off split.  This
micro rebuilds the kernel's per-step structure with static toggles to
see where the time actually goes:

  full        draws + Box-Muller + predict trig + 5-LM likelihood + stats
  no_noise    skip the 4-draw Box-Muller block
  no_lik      skip the landmark loop + its sincos
  no_stats    skip the SMEM accumulator block
  noise_only  only the Box-Muller block (+ row writes)
  bits_only   only the 4 prng draws (+ row writes)
  empty       reads + writes only (DMA floor)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import math
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.filters.pf import PfConfig
from tpuslam.ops.fastmath import normals, sincos_rad

N = int(os.environ.get("PF_N", 2 * 1024 * 1024))
TILE = 2048
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


def make_kernel(cfg, noise, trig, lik, stats):
    def kern(seed_ref, z_ref, p_in_ref, lw_in_ref, p_out_ref, lw_out_ref,
             st_ref, acc_ref):
        if noise:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        x = p_in_ref[0:1, :]
        y = p_in_ref[1:2, :]
        yaw = p_in_ref[2:3, :]
        lw = lw_in_ref[0:1, :]
        lane = x.shape
        if noise == "full":
            n = normals(lane, 4)
        elif noise == "bits":
            n = [jax.lax.shift_right_logical(
                pltpu.prng_random_bits(lane), 8).astype(jnp.float32)
                * (1.0 / (1 << 24)) for _ in range(4)]
        else:
            n = [jnp.zeros(lane, jnp.float32)] * 4
        v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt
        q0, q1, q2 = cfg.q_std
        if trig:
            c_o, s_o = sincos_rad(yaw)
        else:
            c_o, s_o = jnp.ones(lane, jnp.float32), jnp.zeros(
                lane, jnp.float32)
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
        p_out_ref[0:1, :] = x
        p_out_ref[1:2, :] = y
        p_out_ref[2:3, :] = yaw
        lw_out_ref[0:1, :] = lw
        if stats:
            pid = pl.program_id(0)
            idx = (jax.lax.broadcasted_iota(jnp.int32, lw.shape, 1)
                   .astype(jnp.float32)
                   + pid.astype(jnp.float32) * float(TILE))
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


def run(name, noise, trig, lik, stats):
    cfg = PfConfig(num_particles=N, weight_mode="log")
    kern = make_kernel(cfg, noise, trig, lik, stats)
    row3 = pl.BlockSpec((3, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((1, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

    def step(p, lw, seed):
        return pl.pallas_call(
            kern,
            grid=(N // TILE,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      row3, row1],
            out_shape=(jax.ShapeDtypeStruct((3, N), jnp.float32),
                       jax.ShapeDtypeStruct((1, N), jnp.float32),
                       jax.ShapeDtypeStruct((6,), jnp.float32)),
            out_specs=(row3, row1,
                       pl.BlockSpec((6,), lambda i: (0,),
                                    memory_space=pltpu.SMEM)),
            scratch_shapes=[pltpu.SMEM((8,), jnp.float32)],
            input_output_aliases={2: 0, 3: 1},
        )(jnp.asarray([seed], jnp.int32),
          jnp.zeros((5, 2), jnp.float32), p, lw)

    @jax.jit
    def roll(seed0):
        p = jnp.zeros((3, N), jnp.float32)
        lw = jnp.zeros((1, N), jnp.float32)

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
    log(f"devices: {jax.devices()}  N={N}")
    run("full", "full", True, True, True)
    run("no_noise", False, True, True, True)
    run("no_lik", "full", True, False, True)
    run("no_stats", "full", True, True, False)
    run("no_trig", "full", False, True, True)
    run("noise_only", "full", False, False, False)
    run("bits_only", "bits", False, False, False)
    run("empty", False, False, False, False)
    log("ALL DONE")


if __name__ == "__main__":
    main()
