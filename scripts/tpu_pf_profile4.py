#!/usr/bin/env python
"""Stats-block redesign micro: per-tile partials + XLA combine vs the
serialized SMEM scalar-exp accumulator, at several packed tile sizes.

tpu_pf_profile2/3.py showed the stats block costs ~0.52 ms/step at 2M
in BOTH the flat (1, 2048) and packed (8, 256) layouts - i.e. it is all
SCALAR cost (the online-logsumexp SMEM chain runs ~4 scalar ``exp``s
per tile x 1024 tiles on the critical path between grid steps), not
vector work.  This micro replaces the chain with 6 plain scalar SMEM
stores per tile (max / sum / sum2 / best x / best y / best yaw, each
tile-local) and one tiny XLA logsumexp-combine over the ~G tile
partials per step, and sweeps the packed tile size (DMA chunk = 4*T8
bytes per sublane row).
"""

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


def make_kernel(cfg, t8, n8, packed_rows):
    """Packed (8, t8)-tile predict+loglik kernel emitting per-tile
    partials into an SMEM (8*G,) output; no cross-tile scalar chain."""
    sub_rows = packed_rows  # 8 for packed, 1 for flat

    def kern(seed_ref, z_ref, p_in_ref, lw_in_ref, p_out_ref, lw_out_ref,
             part_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        r = sub_rows
        x = p_in_ref[0:r, :]
        y = p_in_ref[r:2 * r, :]
        yaw = p_in_ref[2 * r:3 * r, :]
        lw = lw_in_ref[:, :]
        lane = x.shape
        n = normals(lane, 4)
        v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt
        q0, q1, q2 = cfg.q_std
        c_o, s_o = sincos_rad(yaw)
        x = x + v * dt * c_o + n[0] * q0
        y = y + v * dt * s_o + n[1] * q1
        mag = jnp.abs(yaw + w * dt)
        k = jnp.maximum(jnp.ceil((mag - math.pi) / _TWO_PI), 0.0)
        yaw = jnp.where(yaw < 0, -(mag - _TWO_PI * k),
                        mag - _TWO_PI * k) + n[2] * q2
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
        p_out_ref[0:r, :] = x
        p_out_ref[r:2 * r, :] = y
        p_out_ref[2 * r:3 * r, :] = yaw
        lw_out_ref[:, :] = lw

        pid = pl.program_id(0)
        sub = jax.lax.broadcasted_iota(jnp.int32, lane, 0)
        ln = jax.lax.broadcasted_iota(jnp.int32, lane, 1)
        idx = (sub * n8 + ln).astype(jnp.float32) \
            + pid.astype(jnp.float32) * float(t8)
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
        base = pid * 8
        part_ref[base + 0] = tile_max
        part_ref[base + 1] = tile_sum
        part_ref[base + 2] = tile_sum2
        part_ref[base + 3] = bx
        part_ref[base + 4] = by
        part_ref[base + 5] = byaw
        part_ref[base + 6] = 0.0
        part_ref[base + 7] = 0.0
    return kern


def combine(parts_flat):
    """XLA logsumexp-combine of (8*G,) per-tile partials -> (6,) stats."""
    p = parts_flat.reshape(-1, 8)
    m_g, s_g, s2_g = p[:, 0], p[:, 1], p[:, 2]
    m = jnp.max(m_g)
    e = jnp.exp(m_g - m)
    lse = m + jnp.log(jnp.sum(e * s_g))
    lse2 = 2.0 * m + jnp.log(jnp.sum(e * e * s2_g))
    i = jnp.argmax(m_g)
    return jnp.stack([lse, lse2, p[i, 3], p[i, 4], p[i, 5], m])


def run(name, t8, packed):
    rows = 8 if packed else 1
    n8 = N // rows
    g = n8 // t8
    cfg = PfConfig(num_particles=N, weight_mode="log")
    kern = make_kernel(cfg, t8, n8, rows)
    rowp = pl.BlockSpec((3 * rows, t8), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    roww = pl.BlockSpec((rows, t8), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

    def step(p, lw, seed):
        p, lw, parts = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      rowp, roww],
            out_shape=(jax.ShapeDtypeStruct((3 * rows, n8), jnp.float32),
                       jax.ShapeDtypeStruct((rows, n8), jnp.float32),
                       jax.ShapeDtypeStruct((8 * g,), jnp.float32)),
            out_specs=(rowp, roww,
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            input_output_aliases={2: 0, 3: 1},
        )(jnp.asarray([seed], jnp.int32),
          jnp.zeros((5, 2), jnp.float32), p, lw)
        return p, lw, combine(parts)

    @jax.jit
    def roll(seed0):
        p = jnp.zeros((3 * rows, n8), jnp.float32)
        lw = jnp.zeros((rows, n8), jnp.float32)

        def body(carry, _):
            p, lw, seed = carry
            p, lw, st = step(p, lw, seed)
            return (p, lw, seed + 7919), st[0]

        (p, lw, _), s = jax.lax.scan(
            body, (p, lw, jnp.asarray(1, jnp.int32)), jnp.arange(STEPS))
        return jnp.sum(p) * 0.0 + jnp.sum(jnp.where(jnp.isfinite(s), 0.0,
                                                    1.0))

    dt = timed(roll, 0)
    log(f"{name:22s}: {dt/STEPS*1e3:.3f} ms/step "
        f"({N*STEPS/dt:.3e} p-steps/s)")


def main():
    log(f"devices: {jax.devices()}  N={N}")
    run("flat1x2048+partials", 2048, False)
    run("packed8x256+partials", 256, True)
    run("packed8x1024+partials", 1024, True)
    run("packed8x2048+partials", 2048, True)
    run("packed8x4096+partials", 4096, True)
    log("ALL DONE")


if __name__ == "__main__":
    main()
