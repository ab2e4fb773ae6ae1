#!/usr/bin/env python
"""Round-4 fused-PF ablation ladder (VERDICT r3 item 1).

BENCH_r03 put the fused PF step at 9% VPU by the roofline (1.574e9
particle-steps/s at 2M = 1.27 ms/step) while the EKF kernel sits at 75%.
This script attributes the 2M step cost across the three suspects:

  A. XLA glue per scan iteration (truth/obs, combine, ESS gate cond,
     seed bookkeeping) -- full production rollout vs kernel-only scan.
  B. In-kernel stage costs -- noise / likelihood / stats partials / copy
     floor, each ablated independently (same blocks, same grid).
  C. Per-call + per-tile dispatch overhead -- tile-size sweep and a
     K-step-unrolled prototype (each tile advances its particles K steps
     per pallas_call; valid between resamples since particles are
     independent -- particle_filter.py:86-119 couples them only through
     the ESS gate + resample).

Also counts resample firings over the production 100-step rollout at 2M
(sets the speculation budget for a multi-step design).
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
R = 8
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


def step_math(cfg, x, y, yaw, lw, z_get, noise: str):
    """One PF predict+weight step on packed rows.  noise in
    {'on', 'zero', 'off'}: 'zero' keeps the poly trig + draws structure
    out but zeroes the draws; 'off' removes the noise block entirely
    (still poly trig)."""
    lane = x.shape
    if noise == "on":
        n = normals(lane, 4)
    elif noise == "zero":
        n = [jnp.zeros(lane, jnp.float32)] * 4
    else:
        n = None
    v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt
    q0, q1, q2 = cfg.q_std
    c_o, s_o = sincos_rad(yaw)
    x = x + v * dt * c_o + (0.0 if n is None else n[0] * q0)
    y = y + v * dt * s_o + (0.0 if n is None else n[1] * q1)
    mag = jnp.abs(yaw + w * dt)
    k = jnp.maximum(jnp.ceil((mag - math.pi) / _TWO_PI), 0.0)
    yaw = jnp.where(yaw < 0, -(mag - _TWO_PI * k), mag - _TWO_PI * k)
    if n is not None:
        yaw = yaw + n[2] * q2
    sx, sy = cfg.r_std
    c_n, s_n = sincos_rad(yaw)
    c, s = s_n, c_n
    log_norm = math.log(_TWO_PI * sx * sy)
    acc = jnp.zeros(lane, jnp.float32)
    if z_get is not None:
        for li, (lm_x, lm_y) in enumerate(cfg.landmarks):
            dx = lm_x - x
            dy = lm_y - y
            px_l = c * dx - s * dy
            py_l = s * dx + c * dy
            ddx = (px_l - z_get(li, 0)) / sx
            ddy = (py_l - z_get(li, 1)) / sy
            acc = acc - 0.5 * (ddx * ddx + ddy * ddy) - log_norm
    return x, y, yaw, lw + acc


def combine(parts_flat):
    p = parts_flat.reshape(-1, 8)
    m_g, s_g, s2_g = p[:, 0], p[:, 1], p[:, 2]
    m = jnp.max(m_g)
    e = jnp.exp(m_g - m)
    lse = m + jnp.log(jnp.sum(e * s_g))
    lse2 = 2.0 * m + jnp.log(jnp.sum(e * e * s2_g))
    i = jnp.argmax(m_g)
    return jnp.stack([lse, lse2, p[i, 3], p[i, 4], p[i, 5], m])


def run_variant(name, t8, *, noise="on", lik=True, stats=True,
                do_combine=True, copy_only=False, k_steps=1):
    n8 = N // R
    g = n8 // t8
    cfg = PfConfig(num_particles=N, weight_mode="log")

    def kern(seed_ref, z_ref, p_in_ref, lw_in_ref, p_out_ref, lw_out_ref,
             part_ref):
        if copy_only:
            p_out_ref[:, :] = p_in_ref[:, :]
            lw_out_ref[:, :] = lw_in_ref[:, :]
            for j in range(8 * k_steps):
                part_ref[pl.program_id(0) * 8 * k_steps + j] = 0.0
            return
        x = p_in_ref[0:R, :]
        y = p_in_ref[R:2 * R, :]
        yaw = p_in_ref[2 * R:3 * R, :]
        lw = lw_in_ref[:, :]
        for k in range(k_steps):
            if noise == "on":
                pltpu.prng_seed(seed_ref[0] + k * 7919 + pl.program_id(0))
            zg = (lambda li, c, k=k: z_ref[k * 5 + li, c]) if lik else None
            x, y, yaw, lw = step_math(cfg, x, y, yaw, lw, zg, noise)
            if stats:
                # k_steps*8 partial slots per tile, grid-major layout:
                # tile pid owns [pid*8K, (pid+1)*8K).
                pid_base = pl.program_id(0) * 8 * k_steps
                tile_partials_at(part_ref, pid_base + k * 8, x, y, yaw,
                                 lw, n8, t8)
        p_out_ref[0:R, :] = x
        p_out_ref[R:2 * R, :] = y
        p_out_ref[2 * R:3 * R, :] = yaw
        lw_out_ref[:, :] = lw
        if not stats:
            for j in range(8 * k_steps):
                part_ref[pl.program_id(0) * 8 * k_steps + j] = 0.0

    def tile_partials_at(part_ref, base, x, y, yaw, lw, n8, t8):
        pid = pl.program_id(0)
        lane = lw.shape
        sub = jax.lax.broadcasted_iota(jnp.int32, lane, 0)
        ln = jax.lax.broadcasted_iota(jnp.int32, lane, 1)
        idx = (sub * n8 + ln).astype(jnp.float32) \
            + pid.astype(jnp.float32) * float(t8)
        neg_inf = jnp.float32(-jnp.inf)
        tile_max = jnp.max(lw)
        e = jnp.exp(lw - tile_max)
        part_ref[base + 0] = tile_max
        part_ref[base + 1] = jnp.sum(e)
        part_ref[base + 2] = jnp.sum(e * e)
        best_idx = jnp.max(jnp.where(lw == tile_max, idx, neg_inf))
        sel = idx == best_idx
        part_ref[base + 3] = jnp.max(jnp.where(sel, x, neg_inf))
        part_ref[base + 4] = jnp.max(jnp.where(sel, y, neg_inf))
        part_ref[base + 5] = jnp.max(jnp.where(sel, yaw, neg_inf))
        part_ref[base + 6] = 0.0
        part_ref[base + 7] = 0.0

    rowp = pl.BlockSpec((3 * R, t8), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    roww = pl.BlockSpec((R, t8), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

    def call(p, lw, seed):
        return pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      rowp, roww],
            out_shape=(jax.ShapeDtypeStruct((3 * R, n8), jnp.float32),
                       jax.ShapeDtypeStruct((R, n8), jnp.float32),
                       jax.ShapeDtypeStruct((8 * k_steps * g,),
                                            jnp.float32)),
            out_specs=(rowp, roww,
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            input_output_aliases={2: 0, 3: 1},
        )(jnp.asarray([seed], jnp.int32),
          jnp.zeros((5 * k_steps, 2), jnp.float32), p, lw)

    n_outer = STEPS // k_steps

    @jax.jit
    def roll(seed0):
        p = jnp.zeros((3 * R, n8), jnp.float32)
        lw = jnp.zeros((R, n8), jnp.float32)

        def body(carry, _):
            p, lw, seed = carry
            p, lw, parts = call(p, lw, seed)
            if do_combine:
                out = combine(parts[:8 * g])[0]
            else:
                out = parts[0]
            return (p, lw, seed + 7919 * k_steps), out

        (p, lw, _), s = jax.lax.scan(
            body, (p, lw, jnp.asarray(1, jnp.int32)),
            jnp.arange(n_outer))
        return jnp.sum(p) * 0.0 + jnp.sum(
            jnp.where(jnp.isfinite(s), 0.0, 1.0))

    dt = timed(roll, 0)
    log(f"{name:34s}: {dt / STEPS * 1e3:.3f} ms/step "
        f"({N * STEPS / dt:.3e} p-steps/s)")
    return dt / STEPS


def production_baseline():
    from tpuslam.ops.pf_pallas import pf_fused_rollout, pf_fused_init, \
        pf_fused_step_stats
    cfg = PfConfig(num_particles=N, weight_mode="log",
                   resample_method="merge")

    @jax.jit
    def roll(key):
        final, outs = pf_fused_rollout(cfg, key, STEPS)
        return jnp.sum(outs[1])

    dt = timed(roll, jax.random.key(0))
    log(f"{'A. production pf_fused_rollout':34s}: {dt / STEPS * 1e3:.3f}"
        f" ms/step ({N * STEPS / dt:.3e} p-steps/s)")

    # Firing count: how often does the ESS gate fire at 2M over 100 steps?
    fs0 = pf_fused_init(cfg, tile_n=2048, sub_rows=8)

    @jax.jit
    def fire_count(key):
        keys = jax.random.split(key, STEPS)

        def body(carry, k):
            fs, seed = carry
            fs, ess = pf_fused_step_stats(cfg, fs, k, seed)
            return (fs, seed + 7919), ess

        (_, _), ess = jax.lax.scan(body, (fs0, jnp.asarray(1, jnp.int32)),
                                   keys)
        return jnp.sum(jnp.where(
            ess < cfg.num_particles * cfg.ess_threshold_frac, 1, 0))

    n_fire = int(fire_count(jax.random.key(0)))
    log(f"   resample firings over {STEPS} steps at N={N}: {n_fire}")
    return dt / STEPS


def main():
    log(f"devices: {jax.devices()}  N={N} R={R} steps={STEPS}")
    production_baseline()
    log("--- B. kernel-only scan (no truth/obs/cond/resample) ---")
    run_variant("B. kernel+combine t8=2048", 2048)
    run_variant("B. kernel only (no combine)", 2048, do_combine=False)
    log("--- C. in-kernel stage ablation (t8=2048) ---")
    run_variant("C. noise zeroed (draws off)", 2048, noise="zero")
    run_variant("C. noise off entirely", 2048, noise="off")
    run_variant("C. likelihood off", 2048, lik=False)
    run_variant("C. stats partials off", 2048, stats=False)
    run_variant("C. copy only", 2048, copy_only=True, do_combine=False)
    log("--- D. tile sweep (full kernel) ---")
    run_variant("D. t8=1024 (G=256)", 1024)
    run_variant("D. t8=4096 (G=64)", 4096)
    run_variant("D. t8=8192 (G=32)", 8192)
    run_variant("D. t8=16384 (G=16)", 16384)
    log("--- E. K-step unrolled prototype (no gate; upper bound) ---")
    run_variant("E. K=2  t8=2048", 2048, k_steps=2)
    run_variant("E. K=4  t8=2048", 2048, k_steps=4)
    run_variant("E. K=4  t8=4096", 4096, k_steps=4)
    run_variant("E. K=10 t8=4096", 4096, k_steps=10)
    log("ALL DONE")


if __name__ == "__main__":
    main()
