"""Sharded Monte-Carlo sweeps and particle-parallel filtering.

TPU-native scaling tier (no reference counterpart - the reference is
single-process, SURVEY.md section 2): ``shard_map`` over the mesh's
``rollout`` axis carries independent noise-seeded rollouts (data parallel;
XLA lowers the metric reductions to psum over ICI), and the ``particle``
axis shards one filter's particle cloud across devices (the resampling
collective all-gathers weights - O(N) bytes - so the systematic comb stays
globally exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpuslam.filters.ekf import (EkfConfig, EkfState, ekf_init,
                                 ekf_rollout)
from tpuslam.filters.pf import (PfConfig, PfState, pf_estimate,
                                pf_likelihood)
from tpuslam.models.process import circular_step
from tpuslam.core.se2 import world_to_robot
from tpuslam.parallel.mesh import (PARTICLE_AXIS, ROLLOUT_AXIS,
                                   psum_hierarchical)


def sharded_ekf_sweep(cfg: EkfConfig, mesh, keys, n_steps: int,
                      slice_axis: str | None = None):
    """Monte-Carlo EKF sweep sharded over the rollout mesh axis.

    Each device runs its shard of seeded rollouts locally (vmap over the
    local batch); position-RMSE is reduced with ``psum`` over ICI so every
    device holds the global scalar.

    Args:
        keys: ``(B,)`` PRNG keys, B divisible by the sharded axis sizes.
        slice_axis: name of an outer mesh axis spanning TPU slices
            (:data:`tpuslam.parallel.mesh.SLICE_AXIS`).  Rollouts then
            shard over ``slice x rollout`` and the RMSE reduction is
            hierarchical: within-slice psum over ICI first, one combined
            value per slice over DCN after.

    Returns:
        ``(x_true, x_pre, rmse)``: sharded ``(B, T, 3)`` trajectory
        buffers and the replicated global RMSE scalar.
    """
    axes = (ROLLOUT_AXIS,) if slice_axis is None else (
        slice_axis, ROLLOUT_AXIS)

    def reduce_sum(v):
        # ICI within the slice, one combined value per slice over DCN.
        return psum_hierarchical(v, ROLLOUT_AXIS, slice_axis)

    def local(keys_shard):
        # Mark the (constant-initialized) filter state as varying over the
        # sharded axes so the scan carry types check under shard_map.
        state0 = jax.tree.map(
            lambda x: jax.lax.pcast(x, axes, to="varying"),
            ekf_init(cfg, (keys_shard.shape[0],)))
        _, outs = jax.vmap(
            lambda k, s: ekf_rollout(cfg, k, n_steps, state0=s))(
                keys_shard, state0)
        err = outs.x_pre[..., :2] - outs.x_true[..., :2]
        se = reduce_sum(jnp.sum(err * err))
        n = reduce_sum(
            jnp.asarray(err.shape[0] * err.shape[1], err.dtype))
        rmse = jnp.sqrt(se / n)
        return outs.x_true, outs.x_pre, rmse

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(axes),
                       out_specs=(P(axes), P(axes), P()))
    return fn(keys)


def sharded_ekf_fused_sweep(cfg: EkfConfig, mesh, seed, batch: int,
                            n_steps: int, tile_b: int = 2048,
                            noise_on: bool = True,
                            interpret: bool = False,
                            slice_axis: str | None = None):
    """Fused-kernel Monte-Carlo EKF sweep sharded over ``rollout``.

    The production composition of the two EKF tiers: every device runs
    the whole-rollout Pallas kernel (:mod:`tpuslam.ops.ekf_pallas`) on
    its shard of the batch - one launch per device for all ``n_steps`` -
    and the squared-error accumulators reduce to the global RMSE with a
    single ``psum`` over ICI.  Per-device PRNG streams fold the device
    index into the seed.

    Args:
        batch: total rollouts, divisible by the rollout axis size (and
            each device's share by ``tile_b``, or smaller than it).

    Returns:
        ``(final, err, rmse)``: the sharded final :class:`EkfState`
        (leading axis ``batch``), per-rollout accumulated squared error
        ``(batch,)``, and the replicated global position RMSE.
    """
    from tpuslam.ops import ekf_fused_rollout

    axes = (ROLLOUT_AXIS,) if slice_axis is None else (
        slice_axis, ROLLOUT_AXIS)
    n_dev = 1
    for a in axes:
        n_dev *= mesh.shape[a]
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by {n_dev}")
    b_local = batch // n_dev

    def local(seed_arr):
        my = jax.lax.axis_index(ROLLOUT_AXIS)
        if slice_axis is not None:
            my = my + jax.lax.axis_index(slice_axis) * mesh.shape[
                ROLLOUT_AXIS]
        final, err = ekf_fused_rollout(
            cfg, seed_arr[0] + my * 7919, batch=b_local,
            n_steps=n_steps, tile_b=min(tile_b, b_local),
            noise_on=noise_on, interpret=interpret)
        se = psum_hierarchical(jnp.sum(err), ROLLOUT_AXIS, slice_axis)
        rmse = jnp.sqrt(se / (batch * n_steps))
        return final, err, rmse

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(),
        out_specs=(jax.tree.map(lambda _: P(axes),
                                EkfState(0, 0, 0, 0)),
                   P(axes), P()),
        check_vma=False)
    return fn(jnp.asarray([seed], jnp.int32))


def sharded_pf_batch_sweep(cfg: PfConfig, mesh, seed, batch: int,
                           n_steps: int, wide: bool = False,
                           tile_n: int = 1024, noise_on: bool = True,
                           interpret: bool = False, **kw):
    """Filter-parallel batched-PF sweep sharded over ``rollout``.

    Many INDEPENDENT small filters (the reference's own 1000-particle
    scale, particle_filter.py:31) are data-parallel over the mesh: each
    device runs the one-filter-per-tile Pallas rollout
    (:func:`tpuslam.ops.pf_batch_pallas.pf_batch_rollout`; ``wide=True``
    selects the multi-tile wide kernel) on its shard of the filter
    batch, and the pooled position-RMSE reduces with one psum over ICI.
    Per-device PRNG: the host key folds in the device index and the
    on-core seed ranges are disjoint by construction.

    Args:
        seed: host PRNG seed (int).
        batch: total filter count, divisible by the rollout axis size.

    Returns:
        ``(x_est, ess, rmse)``: sharded ``(n_steps, batch, 3)`` per-step
        MAP estimates, sharded ``(n_steps, batch)`` pre-resample ESS,
        and the replicated pooled position RMSE.
    """
    from tpuslam.ops.pf_batch_pallas import (pf_batch_rollout,
                                             pf_batch_wide_rollout)

    n_dev = mesh.shape[ROLLOUT_AXIS]
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by {n_dev}")
    b_local = batch // n_dev
    # Each step advances the on-core seed by at most max(7919, cells);
    # spacing devices by (n_steps+1) of those keeps the streams disjoint.
    stride = (n_steps + 1) * max(7919, b_local * 64)

    def local(seed_arr):
        my = jax.lax.axis_index(ROLLOUT_AXIS)
        key = jax.random.fold_in(jax.random.key(seed_arr[0]), my)
        seed0 = 1 + my * stride
        if wide:
            _, outs = pf_batch_wide_rollout(
                cfg, key, b_local, n_steps, tile_n=tile_n,
                noise_on=noise_on, interpret=interpret, seed0=seed0, **kw)
        else:
            _, outs = pf_batch_rollout(
                cfg, key, b_local, n_steps, noise_on=noise_on,
                interpret=interpret, seed0=seed0, **kw)
        err = outs.x_est[..., :2] - outs.x_true[:, None, :2]
        se = jax.lax.psum(jnp.sum(err * err), ROLLOUT_AXIS)
        rmse = jnp.sqrt(se / (batch * n_steps))
        return outs.x_est, outs.ess, rmse

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(),
        out_specs=(P(None, ROLLOUT_AXIS), P(None, ROLLOUT_AXIS), P()),
        check_vma=False)
    return fn(jnp.asarray([seed], jnp.int32))


def sharded_pf_fused_init(cfg: PfConfig, mesh, tile_n: int = 2048,
                          sub_rows: int | None = None):
    """Particle-sharded fused-PF state: each device block is
    ``[n_local valid lanes | padding]`` in the kernel's row layout.

    Returns a :class:`tpuslam.ops.pf_pallas.PfFusedState` whose
    ``particles (3R, n_dev * n_local_pad / R)`` / ``log_w`` are meant
    to be sharded over the ``particle`` mesh axis by
    :func:`sharded_pf_fused_step`; scalars are replicated.

    ``sub_rows=None`` auto-packs each device's shard into R=8
    vreg-sublane planes once the local shard fills a packed tile (the
    same occupancy law as the single-device
    :func:`tpuslam.ops.pf_pallas.pf_fused_rollout`; the resample
    collectives work on the flat local order via per-device reshapes
    inside the gated firing branch).
    """
    from tpuslam.ops.pf_pallas import PfFusedState

    n_total = cfg.num_particles
    n_dev = mesh.shape[PARTICLE_AXIS]
    if n_total % n_dev:
        raise ValueError(f"{n_total} particles not divisible by "
                         f"{n_dev} devices")
    n_local = n_total // n_dev
    tile = min(tile_n, n_local)
    if sub_rows is None:
        sub_rows = 8 if n_local >= 8 * tile else 1
    r = sub_rows
    chunk = tile * r
    n_local_pad = -(-n_local // chunk) * chunk
    n8 = n_local_pad // r

    x0 = jnp.asarray(cfg.x0, jnp.float32)
    valid = (jnp.arange(n_local_pad).reshape(r, n8) < n_local)
    p_block = jnp.where(valid[None], x0[:, None, None],
                        0.0).reshape(3 * r, n8)
    lw_block = jnp.where(valid, -jnp.log(float(n_total)), -jnp.inf)
    return PfFusedState(
        x_true=x0,
        particles=jnp.tile(p_block, (1, n_dev)).astype(jnp.float32),
        log_w=jnp.tile(lw_block, (1, n_dev)).astype(jnp.float32),
        lse=jnp.float32(0.0),  # logsumexp of normalized log weights
        lse2=jnp.float32(-jnp.log(float(n_total))),  # ESS = n_total
        x_est=x0)


def sharded_pf_fused_step(cfg: PfConfig, mesh, fs, key, seed,
                          noise_on: bool = True, interpret: bool = False,
                          tile_n: int = 2048):
    """One fused-kernel PF step with the cloud sharded over ``particle``.

    The production-scale composition of the two PF tiers: each device
    runs the Pallas stats kernel (:mod:`tpuslam.ops.pf_pallas`) on its
    local shard in one pass; the per-device ``(lse, lse2)`` reductions
    combine into global normalizers with two scalar pmax+psum rounds
    (online logsumexp across devices); the MAP estimate is an argmax over
    the per-device kernel candidates.  The ESS-gated systematic resample
    is globally exact and comes in two flavors:

    * ``resample_method="merge"`` (production): SURVIVOR EXCHANGE with a
      DISTRIBUTED boundary build.  Each device quantizes its local
      weights (scale = psum of per-device partial sums - one scalar
      round), all_gathers only the per-tile integer sums
      (~0.004 B/particle) whose exact prefixes let the fused pass-1
      kernel rebuild the global cumsum bit-for-bit, compacts its OWN
      particle slab, and all_gathers just the compacted survivor blocks
      (bf16, ~2 B/particle at the production t_k/t_in=1/4 dilution vs
      12 B/particle for raw particles + 4 B/particle for a weight-row
      gather); every device then expands its slot range with the pass-2
      kernel.  Falls back to a gathered-wq decode (same quantized law,
      bit-identical selection) if the static caps overflow.
    * ``"hist"``: all-gather the quantized weights AND particles, XLA
      decode + gather - same distributed-total selection law as merge
      (bit-parity between the two sharded interval paths; the psum'd
      total may differ from a single device's flat sum by a ulp, the
      same 2^-20 order as the quantization itself).
    * anything else (``"search"``): all-gather raw weights + particles,
      reference-exact unquantized decode.

    ``estimate="map"`` (the reference's argmax-weight particle) comes
    straight from the per-device kernel candidates; ``"mean"`` adds one
    read of the local weight/particle rows (4 weighted partial sums,
    circular yaw averaging) combined with a single psum.

    Args:
        fs: state from :func:`sharded_pf_fused_init` (or a previous
            step); ``particles``/``log_w`` sharded over ``particle``.

    Returns:
        ``(next_fs, ess)`` - ESS before resampling, replicated.
    """
    from tpuslam.filters.pf import resample_indices
    from tpuslam.ops.pf_pallas import PfFusedState as _FS
    from tpuslam.ops.pf_pallas import (_flat_rows, _pack_rows,
                                       _pf_stats_call)

    n_total = cfg.num_particles
    n_dev = mesh.shape[PARTICLE_AXIS]
    if n_total % n_dev:
        raise ValueError(f"{n_total} particles not divisible by "
                         f"{n_dev} devices")
    n_local = n_total // n_dev
    r = fs.particles.shape[0] // 3  # packed row factor (1 = flat)
    n8 = fs.particles.shape[1] // n_dev  # local lanes per packed row
    tile = min(tile_n, n8)

    def local(x_true, p_rows, lw_rows, lse, lse2, key, seed):
        my = jax.lax.axis_index(PARTICLE_AXIS)
        k_rs, k_obs = jax.random.split(key)

        # Truth + observation (replicated math, same key everywhere).
        x_true = circular_step(x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
        lm = jnp.asarray(cfg.landmarks)
        z = world_to_robot(x_true, lm)
        z = z + jax.random.normal(k_obs, z.shape,
                                  z.dtype) * jnp.asarray(cfg.r_std)

        bad = ~(jnp.isfinite(lse) & jnp.isfinite(lse2))
        ess = jnp.where(bad, float(n_total),
                        jnp.exp(2.0 * lse - lse2))
        do_rs = ess < n_total * cfg.ess_threshold_frac

        def dist_wq(lw):
            """Distributed quantization: local integer weights + global
            exact prefixes, NO weight-row gather.

            The scale uses the psum of per-device partial sums; all
            downstream sums are of exact integers, so every evaluation
            (local kernel prefix, gathered-cumsum fallback) of the same
            ``wq`` produces bit-identical boundaries.  (The psum'd total
            can differ from a single device's flat sum by a ulp - a
            selection-law perturbation of the same 2^-20 order as the
            quantization itself; both sharded interval paths share it,
            keeping hist/merge bit-parity.)
            """
            from tpuslam.filters.pf import quantize_weights_law

            w_loc = jnp.exp(lw[:, :n_local] - lse)  # (1, n_local)
            total = jax.lax.psum(jnp.sum(w_loc), PARTICLE_AXIS)
            return quantize_weights_law(w_loc, total)

        def rs_gather_flat(args):
            p, lw = args  # FLAT (3, n_local_pad) / (1, n_local_pad)
            # Gather only the VALID lanes (padding is per-device).
            all_p = jax.lax.all_gather(p[:, :n_local], PARTICLE_AXIS,
                                       axis=1, tiled=True)
            if cfg.resample_method in ("hist", "merge"):
                from tpuslam.ops import resample_pallas as rp

                wq_all = jax.lax.all_gather(
                    dist_wq(lw), PARTICLE_AXIS, axis=1, tiled=True)
                t_row = rp.slot_boundaries_from_wq(wq_all, n_total,
                                                   offs)
                idx = rp.decode_indices(t_row, n_total)
            else:
                all_lw = jax.lax.all_gather(
                    lw[:, :n_local], PARTICLE_AXIS, axis=1,
                    tiled=True)[0]
                w = jnp.exp(all_lw - lse)
                idx = resample_indices(k_rs, w,
                                       method=cfg.resample_method)
            idx_loc = jax.lax.dynamic_slice_in_dim(idx, my * n_local,
                                                   n_local)
            p2 = jnp.zeros_like(p).at[:, :n_local].set(all_p[:, idx_loc])
            lw2 = jnp.full_like(lw, -jnp.inf).at[:, :n_local].set(0.0)
            return p2, lw2

        def rs_gather(args):
            # Packed wrapper: the resample works on the flat local lane
            # order; the per-device relayout is a pure reshape, inside
            # the (gated) firing branch only.
            p, lw = args
            p2, lw2 = rs_gather_flat((_flat_rows(p, r),
                                      _flat_rows(lw, r)))
            return _pack_rows(p2, r), _pack_rows(lw2, r)

        def rs_merge(p_in, lw_in):
            # Survivor exchange (see function docstring) with the
            # DISTRIBUTED boundary build: no weight-row gather at all -
            # one scalar psum + an all_gather of per-tile integer sums
            # (~0.004 B/particle) replace the 4 B/particle lw gather;
            # the fused pass-1 kernel rebuilds the exact global cumsum
            # from the gathered tile prefixes.
            from tpuslam.ops import resample_pallas as rp

            # Flat local views (pure reshape; firing branch only).
            p = _flat_rows(p_in, r)
            lw = _flat_rows(lw_in, r)

            # Caps via the shared helper (merge_caps defaults 1024/256;
            # the single-device merge_resample_rows now defaults to
            # t_in=2048/t_k=512).  Selection is cap-INVARIANT - only the
            # decoded boundaries must match across paths, and those come
            # from the same quantized-cum law - so differing caps here
            # are pure scheduling, not a parity hazard.
            t_in, t_k, t_out, w_b, wb2 = rp.merge_caps(n_local)

            wq = dist_wq(lw)
            nt_loc = n_local // t_in
            tile_sums = wq.reshape(nt_loc, t_in).sum(axis=-1)
            all_sums = jax.lax.all_gather(tile_sums, PARTICLE_AXIS,
                                          tiled=True)  # (nt_total,)
            cum_t = jnp.cumsum(all_sums)
            q_tot = cum_t[-1]
            base_loc = jax.lax.dynamic_slice_in_dim(
                cum_t - all_sums, my * nt_loc, nt_loc)
            sl = my * n_local
            lane0 = sl + jnp.arange(nt_loc, dtype=jnp.int32) * t_in
            bc, cnt_loc = rp.boundary_compact_particles(
                p[:, :n_local], None, n_total, offs, t_in, t_k,
                interpret, precomputed=(wq, base_loc, q_tot, lane0))
            cnt = jax.lax.all_gather(cnt_loc, PARTICLE_AXIS, tiled=True)
            ok_compact = jnp.max(cnt) <= t_k
            bc_all = jax.lax.all_gather(bc, PARTICLE_AXIS, axis=1,
                                        tiled=True)
            tc15 = jnp.concatenate(
                [bc_all, rp.inert_tail(n_total, w_b, wb2)], axis=1)

            n_local_pad = p.shape[1]
            nt_out = n_local_pad // t_out if n_local_pad % t_out == 0 \
                else n_local // t_out
            i0_t = jnp.arange(nt_out, dtype=jnp.int32) * t_out
            i0 = jnp.where(i0_t < n_local, sl + i0_t, n_total)
            i_last = jnp.minimum(i0 + t_out, n_total) - 1
            sb, span, need, blk_ids = rp.skip_table(
                cnt, tc15, t_k, wb2, w_b, i0, i_last, i0 < n_total)
            bad = (~ok_compact) | (jnp.max(need) > w_b)
            bad_any = jax.lax.psum(
                bad.astype(jnp.float32), PARTICLE_AXIS) > 0

            def merge_path(args):
                p, lw = args
                p = _flat_rows(p, r)
                lw = _flat_rows(lw, r)
                out = rp.expand_compacted(tc15, sb, span, blk_ids, i0,
                                          nt_out * t_out, t_out, wb2,
                                          w_b, interpret)
                p2 = jnp.zeros_like(p).at[:, :nt_out * t_out].set(
                    out.astype(p.dtype))
                lw2 = jnp.full_like(lw, -jnp.inf).at[:, :n_local].set(0.0)
                return _pack_rows(p2, r), _pack_rows(lw2, r)

            return jax.lax.cond(bad_any, rs_gather, merge_path,
                                (p_in, lw_in))

        offs = jax.random.uniform(k_rs, dtype=jnp.float32)
        rs = (rs_merge if cfg.resample_method == "merge"
              else lambda p, lw: rs_gather((p, lw)))
        p_rows, lw_rows = jax.lax.cond(
            do_rs, rs, lambda p, lw: (p, lw), p_rows, lw_rows)
        flag = jnp.where(bad & ~do_rs, 1.0, 0.0)

        p_rows, lw_rows, stats = _pf_stats_call(
            cfg, seed + my * 7919, flag, p_rows, lw_rows, z, tile,
            noise_on, interpret, n_valid=n_local)

        # Online logsumexp across devices (exp(-inf - m) == 0 handles
        # all-padding shards gracefully).
        def global_lse(v):
            m = jax.lax.pmax(v, PARTICLE_AXIS)
            return m + jnp.log(jax.lax.psum(jnp.exp(v - m),
                                            PARTICLE_AXIS))

        lse_g = global_lse(stats[0])
        lse2_g = global_lse(stats[1])

        if cfg.estimate == "mean":
            # Weighted mean with circular yaw averaging: 4 local partial
            # sums + one psum.  Same NaN->uniform law as
            # filters/pf.py::weights_from_log (padding lanes carry
            # lw = -inf, so they weigh 0 on the finite branch and are
            # masked out of the uniform reset).  The sums are
            # order-free, so they read the packed rows directly; only
            # the validity mask needs the flat index.
            lw_f = _flat_rows(lw_rows, r)
            p_f = _flat_rows(p_rows, r)
            lw_n = lw_f[0] - lse_g
            valid = jnp.arange(lw_f.shape[1]) < n_local
            w = jnp.where(jnp.isnan(lw_n) | ~jnp.isfinite(lse_g),
                          jnp.where(valid, 1.0 / n_total, 0.0),
                          jnp.exp(lw_n))
            yaw = p_f[2]
            part = jnp.stack([
                jnp.sum(w * p_f[0]), jnp.sum(w * p_f[1]),
                jnp.sum(w * jnp.cos(yaw)), jnp.sum(w * jnp.sin(yaw))])
            g = jax.lax.psum(part, PARTICLE_AXIS)
            x_est = jnp.stack([g[0], g[1], jnp.arctan2(g[3], g[2])])
        else:
            # Global MAP: argmax over the per-device kernel candidates.
            cand = jax.lax.all_gather(stats[2:6],
                                      PARTICLE_AXIS)  # (n_dev, 4)
            best = jnp.argmax(cand[:, 3])
            # Flat local particle 0 sits at column 0 of each variable's
            # packed plane.
            p0 = jnp.stack([p_rows[0, 0], p_rows[r, 0],
                            p_rows[2 * r, 0]])
            x_est = jnp.where(jnp.isfinite(lse_g), cand[best, :3], p0)

        return x_true, p_rows, lw_rows, lse_g, lse2_g, x_est, ess

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, PARTICLE_AXIS), P(None, PARTICLE_AXIS),
                  P(), P(), P(), P()),
        out_specs=(P(), P(None, PARTICLE_AXIS), P(None, PARTICLE_AXIS),
                   P(), P(), P(), P()),
        check_vma=False)
    x_true, p_rows, lw_rows, lse, lse2, x_est, ess = fn(
        fs.x_true, fs.particles, fs.log_w, fs.lse, fs.lse2, key,
        jnp.asarray(seed, jnp.int32))
    return _FS(x_true=x_true, particles=p_rows, log_w=lw_rows, lse=lse,
               lse2=lse2, x_est=x_est), ess


def sharded_pf_step(cfg: PfConfig, mesh, state: PfState, key):
    """One PF step with the particle cloud sharded over ``particle``.

    The predict and likelihood stages are embarrassingly parallel per
    particle shard; weight normalization is a ``psum``; ESS-gated
    systematic resampling all-gathers ``(weights, particles)`` so the
    global comb walk (particle_filter.py:212-221 semantics) is exact, then
    each device keeps its slice of the resampled cloud.

    Args:
        state: ``PfState`` whose ``particles``/``weights`` leading axis is
            sharded over the particle mesh axis.

    Returns:
        ``(next_state, x_est)`` with the same shardings.
    """
    n_total = cfg.num_particles

    def local(x_true, particles, weights, key):
        k_rs, k_pred, k_obs = jax.random.split(key, 3)
        my = jax.lax.axis_index(PARTICLE_AXIS)
        n_dev = jax.lax.axis_size(PARTICLE_AXIS)
        n_local = particles.shape[0]

        # ESS gate on global weights.
        ess = 1.0 / jax.lax.psum(jnp.sum(weights * weights), PARTICLE_AXIS)
        do_rs = ess < n_total * cfg.ess_threshold_frac

        def resample(args):
            particles, weights = args
            all_w = jax.lax.all_gather(weights, PARTICLE_AXIS,
                                       tiled=True)  # (N,)
            all_p = jax.lax.all_gather(particles, PARTICLE_AXIS,
                                       tiled=True)  # (N, 3)
            cum = jnp.cumsum(all_w)
            offs = jax.random.uniform(k_rs, dtype=weights.dtype) / n_total
            # Each device draws only its own comb positions.
            u = (jnp.arange(n_local, dtype=weights.dtype)
                 + my * n_local) / n_total + offs
            idx = jnp.clip(jnp.searchsorted(cum, u, side="left"), 0,
                           n_total - 1)
            return all_p[idx], jnp.full_like(weights, 1.0 / n_total)

        particles, weights = jax.lax.cond(
            do_rs, resample, lambda a: a, (particles, weights))

        # Predict (local).
        noise = jax.random.fold_in(k_pred, my)
        q = jax.random.normal(noise, particles.shape,
                              particles.dtype) * jnp.asarray(cfg.q_std)
        particles = circular_step(particles, cfg.vel, cfg.yaw_rate,
                                  cfg.dt) + q

        # Truth + observation (replicated math, same key everywhere).
        x_true_next = circular_step(x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
        lm = jnp.asarray(cfg.landmarks)
        z = world_to_robot(x_true_next, lm)
        z = z + jax.random.normal(k_obs, z.shape,
                                  z.dtype) * jnp.asarray(cfg.r_std)

        # Weight (local) + global normalize.
        like = pf_likelihood(cfg, particles, z)
        if cfg.weight_mode == "log":
            lw = jnp.log(weights) + like
            m = jax.lax.pmax(jnp.max(lw), PARTICLE_AXIS)
            w = jnp.exp(lw - m)
        else:
            w = weights * like
        total = jax.lax.psum(jnp.sum(w), PARTICLE_AXIS)
        w = w / total
        w = jnp.where(jnp.isnan(w), 1.0 / n_total, w)

        # Global MAP estimate: argmax across devices.
        local_max = jnp.max(w)
        local_arg = jnp.argmax(w)
        all_max = jax.lax.all_gather(local_max, PARTICLE_AXIS)
        best_dev = jnp.argmax(all_max)
        cand = pf_estimate(cfg, particles, w)  # local argmax particle
        all_cand = jax.lax.all_gather(cand, PARTICLE_AXIS)
        x_est = all_cand[best_dev]
        return x_true_next, particles, w, x_est

    # check_vma=False: x_true / x_est are value-replicated (they come from
    # all_gather / identical per-device math) but the static analysis
    # cannot prove it.
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(PARTICLE_AXIS), P(PARTICLE_AXIS), P()),
        out_specs=(P(), P(PARTICLE_AXIS), P(PARTICLE_AXIS), P()),
        check_vma=False)
    x_true, particles, weights, x_est = fn(state.x_true, state.particles,
                                           state.weights, key)
    return PfState(x_true=x_true, particles=particles,
                   weights=weights), x_est
