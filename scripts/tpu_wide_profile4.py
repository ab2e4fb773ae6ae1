#!/usr/bin/env python
"""Stage-by-stage decomposition of the wide-PF FIRING path.

STATUS.md round-4: the firing path (pass A/B + transposes) costs
~14 ms/firing step at 1024x10k and is the wide bottleneck.  This script
replays pf_batch_wide_step's fire path (same kernels, same helper
imports) truncated after each stage, inside an always-fire rollout with
carried state (CLAUDE.md: never benchmark conds over closed-over
constants), so consecutive deltas attribute the cost:

  stage 0  no resample at all (pass-C floor)
  stage 1  + packed->flat transposes + re-pack + fire_lane where-merge
  stage 2  + firing-row gather + quantize + per-tile boundary build
  stage 3  + pass A (compact survivors)
  stage 4  + skip table (XLA glue)
  stage 5  + pass B (expand) + take-to-B + where   (= full, untiered)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def staged_step(cfg, state, key, seed, stage, tile_n=1024, w_b=12):
    """pf_batch_wide_step with the fire path truncated after ``stage``.

    Mirrors ops/pf_batch_pallas.py::pf_batch_wide_step (untiered,
    cap = B, always-fire regime assumed by the caller's ess gate)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpuslam.filters.pf import quantize_weights_law
    from tpuslam.models.process import circular_step
    from tpuslam.core.se2 import world_to_robot
    from tpuslam.ops.pf_batch_pallas import (
        _SLOT_MOD, _combine_wide_stats, _wide_compact_kernel,
        _wide_dims, _wide_stats_kernel, flat_batch_rows, pack_batch_rows,
        PfBatchWideState, PfBatchOut)
    from tpuslam.ops.resample_pallas import (decode_indices,
                                             expand_compacted,
                                             inert_tail, skip_table,
                                             slot_boundaries)

    w_tiles, np_ = _wide_dims(cfg, tile_n)
    r = state.particles.shape[0] // 3
    np8 = np_ // r
    t8 = tile_n // r
    b = state.particles.shape[1] // np8
    n = cfg.num_particles
    t_k = min(256, tile_n)
    wb2 = min(128, t_k)
    nw = t_k // wb2
    cap_t = b

    k_rs, k_obs = jax.random.split(key)
    x_true = circular_step(state.x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
    lm = jnp.asarray(cfg.landmarks, jnp.float32)
    z0 = world_to_robot(x_true, lm)
    noise = jax.random.normal(k_obs, (b,) + z0.shape, jnp.float32)
    z = z0[None] + noise * jnp.asarray(cfg.r_std, jnp.float32)
    z_flat = jnp.zeros((b, 128), jnp.float32)
    z_flat = z_flat.at[:, :z0.size].set(z.reshape(b, -1))
    z_rows = z_flat.reshape(1, b * 128)

    bad = ~(jnp.isfinite(state.lse) & jnp.isfinite(state.lse2))
    ess = jnp.where(bad, float(n), jnp.exp(2.0 * state.lse - state.lse2))
    fire = (~bad) & (ess < n * cfg.ess_threshold_frac)
    offs = jax.random.uniform(k_rs, (b,), jnp.float32)
    fire_i = fire.astype(jnp.int32)
    pos = jnp.cumsum(fire_i) - fire_i
    n_fire = jnp.sum(fire_i)

    def fire_path(_):
        p_flat = (flat_batch_rows(state.particles, b, r) if r > 1
                  else state.particles)
        lw_flat = (flat_batch_rows(state.log_w, b, r) if r > 1
                   else state.log_w)
        lw2 = lw_flat.reshape(b, np_)
        resampled = p_flat  # stage-1 default: identity resample

        if stage >= 2:
            tgt = jnp.where(fire, pos, cap_t)
            fids = jnp.zeros((cap_t,), jnp.int32).at[tgt].set(
                jnp.arange(b, dtype=jnp.int32), mode="drop",
                unique_indices=True)
            valid_slot = (jnp.arange(cap_t, dtype=jnp.int32)
                          < n_fire).astype(jnp.int32)
            w_sel = jnp.exp(lw2[fids] - state.lse[fids][:, None])
            total = jnp.sum(w_sel, axis=-1, keepdims=True)
            wq = quantize_weights_law(w_sel, total)
            cum_in = jnp.cumsum(wq, axis=-1)
            q_tot = cum_in[:, -1]
            inv_slot = 1.0 / q_tot.astype(jnp.float32)
            offs_slot = offs[fids]
            wq_rows = wq.reshape(1, cap_t * np_)
            cum_rows = cum_in.reshape(1, cap_t * np_)
            if stage == 2:
                # Fold the boundary build into the output without
                # running pass A (keep XLA from DCE'ing it).
                resampled = p_flat + 0.0 * cum_rows[0, 0]

        g_a = 1
        for d in range(w_tiles, 0, -1):
            if w_tiles % d == 0 and d * tile_n <= 16384:
                g_a = d
                break
        wcells = w_tiles // g_a
        if stage >= 3:
            tc, cnt = pl.pallas_call(
                functools.partial(_wide_compact_kernel, t_k=t_k, n=n,
                                  w_tiles=w_tiles, g_a=g_a,
                                  tile_n=tile_n),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=4,
                    grid=(cap_t, wcells),
                    in_specs=[
                        pl.BlockSpec((3, g_a * tile_n),
                                     lambda c, w, fids, *_: (
                                         0, fids[c] * wcells + w),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, g_a * tile_n),
                                     lambda c, w, *_: (0, c * wcells + w),
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
            )(fids, inv_slot, offs_slot, valid_slot, p_flat,
              wq_rows, cum_rows)
            cnt = cnt[0]
            if stage == 3:
                resampled = p_flat + 0.0 * tc[0, :1].astype(jnp.float32)

        if stage >= 4:
            tc15t = jnp.concatenate([tc, inert_tail(n, w_b, wb2)], axis=1)
            stride = np_ + 1
            ot = jnp.arange(cap_t * w_tiles, dtype=jnp.int32)
            i0_loc = (ot % w_tiles) * tile_n
            q0 = (ot // w_tiles) * stride + i0_loc
            q1 = q0 + tile_n - 1
            valid_out = (ot // w_tiles) < n_fire
            sb, span, need, blk_ids = skip_table(
                cnt, tc15t, t_k, wb2, w_b, q0, q1, valid_out,
                slot_params=(w_tiles * nw, stride, np_ + 1, _SLOT_MOD),
                grid_params=(w_tiles, tile_n, cap_t * w_tiles))
            if stage == 4:
                resampled = p_flat + 0.0 * (sb[:1].astype(jnp.float32)
                                            + span[:1].astype(jnp.float32))

        if stage >= 5:
            i0_key = (((ot // w_tiles) % _SLOT_MOD) * (np_ + 1) + i0_loc)
            out = expand_compacted(tc15t, sb, span, blk_ids, i0_key,
                                   cap_t * np_, tile_n, wb2, w_b)
            rs3 = out.reshape(3, cap_t, np_)
            src = jnp.clip(pos, 0, cap_t - 1)
            resampled = jnp.take(rs3, src, axis=1).reshape(3, b * np_)

        fire_lane = jnp.repeat(fire, np_)[None, :]
        particles_in = jnp.where(fire_lane, resampled, p_flat)
        lane_valid = (jnp.arange(np_) < n)
        uni = jnp.where(lane_valid, 0.0, -jnp.inf)[None, :]
        lw_in = jnp.where(fire_lane, jnp.tile(uni, (1, b)), lw_flat)
        if r > 1:
            return (pack_batch_rows(particles_in, b, r),
                    pack_batch_rows(lw_in, b, r))
        return particles_in, lw_in

    def no_fire_path(_):
        return state.particles, state.log_w

    if stage == 0:
        particles_in, lw_in = state.particles, state.log_w
    else:
        particles_in, lw_in = jax.lax.cond(n_fire > 0, fire_path,
                                           no_fire_path, 0)
    flag = jnp.where(bad & ~fire, 1.0, 0.0)

    g_tiles = 1
    for d in range(w_tiles, 0, -1):
        if w_tiles % d == 0 and d * tile_n <= 8192:
            g_tiles = d
            break
    c_cells = w_tiles // g_tiles
    c8 = g_tiles * t8
    p_out, lw_out, st = pl.pallas_call(
        functools.partial(_wide_stats_kernel, cfg=cfg, noise_on=True,
                          c_cells=c_cells, np8=np8, sub_rows=r),
        grid=(b, c_cells),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda f, g: (0, f),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * r, c8), lambda f, g: (0, f * c_cells + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, c8), lambda f, g: (0, f * c_cells + g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((3 * r, b * np8), jnp.float32),
            jax.ShapeDtypeStruct((r, b * np8), jnp.float32),
            jax.ShapeDtypeStruct((1, 8 * b * c_cells), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((3 * r, c8), lambda f, g: (0, f * c_cells + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, c8), lambda f, g: (0, f * c_cells + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={3: 0, 4: 1},
    )(jnp.asarray([seed], jnp.int32), flag, z_rows, particles_in, lw_in)

    st = _combine_wide_stats(st, b, c_cells)
    lse, lse2 = st[:, 0], st[:, 1]
    x_est = st[:, 2:5]
    return PfBatchWideState(x_true=x_true, particles=p_out, log_w=lw_out,
                            lse=lse, lse2=lse2, x_est=x_est), x_est


def main():
    from tpuslam.filters.pf import PfConfig
    from tpuslam.ops.pf_batch_pallas import (_auto_sub_rows,
                                             pf_batch_wide_init)

    log(f"devices: {jax.devices()}")
    b, n, steps, tile_n = 1024, 10_000, 50, 1024
    cfg = PfConfig(num_particles=n, weight_mode="log",
                   ess_threshold_frac=2.0)  # always fire
    r = _auto_sub_rows(cfg)

    names = {
        0: "pass-C floor (no resample code at all)",
        1: "+ transposes + where-merge (identity resample)",
        2: "+ gather/quantize/boundary build",
        3: "+ pass A (compact)",
        4: "+ skip table (XLA)",
        5: "+ pass B + take + where (= full untiered)",
    }
    prev = None
    for stage in range(6):
        def roll(k, stage=stage):
            st0 = pf_batch_wide_init(cfg, b, tile_n=tile_n, sub_rows=r)

            def body(carry, ks):
                s, i = carry
                s2, x_est = staged_step(cfg, s, ks, 0, stage,
                                        tile_n=tile_n)
                return (s2, i + 1), jnp.sum(x_est)

            keys = jax.random.split(k, steps)
            (_, _), outs = jax.lax.scan(body, (st0, 0), keys)
            return jnp.sum(outs)

        fn = jax.jit(roll)
        k = jax.random.key(0)
        float(fn(k))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(k))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        ms = dt * 1e3 / steps
        d = "" if prev is None else f"  (+{ms - prev:6.2f} ms)"
        log(f"stage {stage} {names[stage]:48s}: {ms:7.2f} ms/step{d}")
        prev = ms


if __name__ == "__main__":
    main()
