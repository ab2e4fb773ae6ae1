"""Fused particle-filter predict+likelihood as a Pallas TPU kernel.

The hot loop of the PF (particle_filter.py:86-119) per step is: propagate
every particle with system noise, transform all landmarks into every
particle's frame, and accumulate the observation log-likelihood - O(NP*L)
elementwise work that the reference does in a per-particle Python loop
(particle_filter.py:185-192) and the XLA path does in several fused
regions with threefry RNG.  This kernel does the whole thing in ONE pass
over the particle array with on-core RNG:

  * layout ``(3, NP)`` (rows x/y/yaw, particles on lanes) + ``(1, NP)``
    log-weights - pure VPU work, grid over particle tiles;
  * the landmark loop is statically unrolled (L is small);
  * noise via ``pltpu.prng_random_bits`` + Box-Muller (distributional,
    not bitwise, parity with the jax.random path - pinned by the
    noise-free exactness test).

Resampling (cumsum + searchsorted, data-dependent via the ESS gate) stays
in XLA around the kernel - it is O(NP) memory-bound work XLA handles
well, searchsorted has no efficient Mosaic lowering, and the ESS gate
makes it rare.  Everything else the step needs - weight normalization
(logsumexp), the ESS for the next step's gate (logsumexp of 2*lw), and
the MAP-particle estimate (running argmax) - is accumulated INSIDE the
kernel across the sequential TPU grid (flash-attention-style online
rescaling in SMEM scratch, :func:`_pf_stats_kernel`), so a no-resample
step touches particle memory exactly once and does only scalar math
outside.  :func:`pf_fused_rollout` stitches kernel + gate into a
``lax.scan`` matching ``pf_step``'s semantics in log-weight mode.
"""

from __future__ import annotations

import functools
import math
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.filters.pf import PfConfig, PfState
from tpuslam.models.process import circular_step
from tpuslam.core.se2 import world_to_robot

_TWO_PI = 2.0 * math.pi


def _wrap(a):
    mag = jnp.abs(a)
    k = jnp.maximum(jnp.ceil((mag - math.pi) / _TWO_PI), 0.0)
    w = mag - _TWO_PI * k
    return jnp.where(a < 0, -w, w)


from tpuslam.ops.fastmath import normals as _normals  # noqa: E402


def _predict_loglik(cfg: PfConfig, z_ref, x, y, yaw, noise_on: bool,
                    z_get=None):
    """Shared kernel math: circular predict + landmark log-likelihood.

    Returns ``(x', y', yaw', loglik)`` rows (all ``(1, tile)``).

    ``z_get(li, c)`` reads the scalar observation component ``c`` of
    landmark ``li`` (default: ``z_ref[li, c]``, the single-filter (L, 2)
    layout; the batched kernel passes a row accessor).
    """
    if z_get is None:
        z_get = lambda li, c: z_ref[li, c]  # noqa: E731
    lane = x.shape
    if noise_on:
        n = _normals(lane, 4)
    else:
        n = [jnp.zeros(lane, jnp.float32)] * 4

    # Predict (particle_filter.py:156-168): circular step + Q noise.
    # In the (production) noisy mode, state trig uses the polynomial
    # sincos (ops/fastmath.py; Mosaic builtin trig is ~40x an FMA) -
    # the ~2e-7 step error is 5 orders below the per-step Q noise.  The
    # noise-free mode keeps builtin trig for bit-parity with the XLA
    # oracle tests.
    v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt
    q0, q1, q2 = cfg.q_std
    if noise_on:
        from tpuslam.ops.fastmath import sincos_rad
        c_o, s_o = sincos_rad(yaw)
    else:
        c_o, s_o = jnp.cos(yaw), jnp.sin(yaw)
    x = x + v * dt * c_o + n[0] * q0
    y = y + v * dt * s_o + n[1] * q1
    # Reference adds the yaw noise AFTER the wrapped step with no second
    # wrap (particle_filter.py:166); match the XLA path exactly.
    yaw = _wrap(yaw + w * dt) + n[2] * q2

    # Log-likelihood over landmarks (particle_filter.py:170-198), with
    # world_to_robot inlined (BASE_ANG convention, mylib/transform.py).
    # The frame angle is BASE - yaw = pi/2 - yaw, so its (cos, sin) are
    # (sin(yaw), cos(yaw)) - one sincos pair covers it.
    sx, sy = cfg.r_std
    if noise_on:
        c_n, s_n = sincos_rad(yaw)
        c, s = s_n, c_n
    else:
        base = math.pi / 2.0
        ang = base - yaw
        c = jnp.cos(ang)
        s = jnp.sin(ang)
    log_norm = math.log(_TWO_PI * sx * sy)
    acc = jnp.zeros(lane, jnp.float32)
    for li, (lm_x, lm_y) in enumerate(cfg.landmarks):
        dx = lm_x - x
        dy = lm_y - y
        px_l = c * dx - s * dy
        py_l = s * dx + c * dy
        ddx = (px_l - z_get(li, 0)) / sx
        ddy = (py_l - z_get(li, 1)) / sy
        acc = acc - 0.5 * (ddx * ddx + ddy * ddy) - log_norm
    return x, y, yaw, acc


def _pf_kernel(seed_ref, z_ref, p_in_ref, lw_in_ref, p_out_ref,
               lw_out_ref, *, cfg: PfConfig, noise_on: bool):
    if noise_on:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    x, y, yaw, acc = _predict_loglik(
        cfg, z_ref, p_in_ref[0:1, :], p_in_ref[1:2, :], p_in_ref[2:3, :],
        noise_on)
    p_out_ref[0:1, :] = x
    p_out_ref[1:2, :] = y
    p_out_ref[2:3, :] = yaw
    lw_out_ref[0:1, :] = lw_in_ref[0:1, :] + acc


def _pf_stats_kernel(seed_ref, flag_ref, z_ref, p_in_ref, lw_in_ref,
                     p_out_ref, lw_out_ref, stats_ref, acc_ref, *,
                     cfg: PfConfig, noise_on: bool, n_valid: int,
                     tile_n: int):
    """Predict + weight + ALL step reductions in one pass.

    Accumulates across the (sequential) grid in SMEM scratch ``acc_ref``:
      [0] running max of lw'           [1] running sum exp(lw' - max)
      [2] running max of 2*lw'         [3] running sum exp(2*lw' - max)
      [4] best lw'   [5..7] best particle (x, y, yaw)
    and writes ``stats_ref`` = [lse, lse2, x_map, y_map, yaw_map, best_lw]
    at the last grid step.  ``flag_ref[0] > 0`` treats incoming log
    weights as uniform 0 (the NaN->uniform reset of
    particle_filter.py:226-237, applied lazily in-pass).
    """
    if noise_on:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    lw_in = lw_in_ref[0:1, :]
    lw_in = jnp.where(flag_ref[0] > 0.0, 0.0, lw_in)

    x, y, yaw, acc = _predict_loglik(
        cfg, z_ref, p_in_ref[0:1, :], p_in_ref[1:2, :], p_in_ref[2:3, :],
        noise_on)
    lw = lw_in + acc

    pid = pl.program_id(0)
    # Global lane index (f32 is exact up to 2^24 particles) for masking
    # the padded tail and for a consistent argmax pick.  (Mosaic's iota
    # is integer-only; cast after.)
    idx = (jax.lax.broadcasted_iota(jnp.int32, lw.shape, 1)
           .astype(jnp.float32) + pid.astype(jnp.float32) * float(tile_n))
    lane_valid = idx < float(n_valid)
    neg_inf = jnp.float32(-jnp.inf)
    # Padded lanes carry -inf OUT so downstream laneswise consumers
    # (exp -> 0 in the resample cumsum) never see ballast values.
    lw_m = jnp.where(lane_valid, lw, neg_inf)

    p_out_ref[0:1, :] = x
    p_out_ref[1:2, :] = y
    p_out_ref[2:3, :] = yaw
    lw_out_ref[0:1, :] = lw_m

    tile_max = jnp.max(lw_m)
    e = jnp.exp(lw_m - tile_max)  # exp(-inf - m) == 0
    tile_sum = jnp.sum(e)
    tile_sum2 = jnp.sum(e * e)  # exp(2(lw - m)) without a second exp

    # Argmax pick: break ties by highest index so every coordinate is
    # read from the SAME particle (the reference's np.argmax keeps the
    # first; ties are measure-zero under continuous noise).
    best_idx = jnp.max(jnp.where(lw_m == tile_max, idx, neg_inf))
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
    def _accumulate():
        m_old = acc_ref[0]
        m_new = jnp.maximum(m_old, tile_max)
        acc_ref[1] = (acc_ref[1] * jnp.exp(m_old - m_new)
                      + tile_sum * jnp.exp(tile_max - m_new))
        acc_ref[0] = m_new
        m2_old = acc_ref[2]
        m2_new = jnp.maximum(m2_old, 2.0 * tile_max)
        acc_ref[3] = (acc_ref[3] * jnp.exp(m2_old - m2_new)
                      + tile_sum2 * jnp.exp(2.0 * tile_max - m2_new))
        acc_ref[2] = m2_new
        better = tile_max > acc_ref[4]
        acc_ref[4] = jnp.where(better, tile_max, acc_ref[4])
        acc_ref[5] = jnp.where(better, bx, acc_ref[5])
        acc_ref[6] = jnp.where(better, by, acc_ref[6])
        acc_ref[7] = jnp.where(better, byaw, acc_ref[7])

    @pl.when(pid == pl.num_programs(0) - 1)
    def _finish():
        stats_ref[0] = acc_ref[0] + jnp.log(acc_ref[1])
        stats_ref[1] = acc_ref[2] + jnp.log(acc_ref[3])
        stats_ref[2] = acc_ref[5]
        stats_ref[3] = acc_ref[6]
        stats_ref[4] = acc_ref[7]
        stats_ref[5] = acc_ref[4]


@functools.partial(jax.jit, static_argnames=("cfg", "tile_n", "noise_on",
                                             "interpret"))
def pf_fused_predict_weight(cfg: PfConfig, seed, particles, log_w, z,
                            tile_n: int = 2048, noise_on: bool = True,
                            interpret: bool = False):
    """Fused predict + log-likelihood-weight update.

    Args:
        particles: ``(NP, 3)``.
        log_w: ``(NP,)`` unnormalized log weights.
        z: ``(L, 2)`` robot-frame landmark observation.

    Returns:
        ``(particles', log_w')`` with the same shapes (log_w' is
        unnormalized; normalize with logsumexp outside).
    """
    n = cfg.num_particles
    tile_n = min(tile_n, n)
    # Pad the particle axis to a tile multiple; padded lanes are pure
    # ballast (outputs sliced off before any reduction).
    n_pad = -(-n // tile_n) * tile_n
    pad = n_pad - n
    if pad:
        particles = jnp.concatenate(
            [particles, jnp.zeros((pad, 3), particles.dtype)], axis=0)
        log_w = jnp.concatenate([log_w, jnp.zeros((pad,), log_w.dtype)])
    p_in = particles.T.astype(jnp.float32)  # (3, NP)
    lw_in = log_w[None, :].astype(jnp.float32)

    kernel = functools.partial(_pf_kernel, cfg=cfg, noise_on=noise_on)
    row3 = pl.BlockSpec((3, tile_n), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((1, tile_n), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    p_out, lw_out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row3,
            row1,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        out_specs=(row3, row1),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), jnp.asarray(z, jnp.float32), p_in,
      lw_in)
    return p_out.T[:n], lw_out[0, :n]


def _pf_stats_call(cfg: PfConfig, seed, uniform_flag, p_in, lw_in, z,
                   tile_n: int, noise_on: bool, interpret: bool,
                   n_valid: int | None = None):
    """Raw-layout stats kernel call: ``(3, N_pad)`` / ``(1, N_pad)`` in
    and out, no transposes (the scan carry stays in kernel layout).

    ``n_valid`` overrides the valid lane count (defaults to the full
    particle count; the particle-sharded path passes its local shard
    size)."""
    n_pad = p_in.shape[1]
    kernel = functools.partial(
        _pf_stats_kernel, cfg=cfg, noise_on=noise_on,
        n_valid=cfg.num_particles if n_valid is None else n_valid,
        tile_n=tile_n)
    row3 = pl.BlockSpec((3, tile_n), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((1, tile_n), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row3,
            row1,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((6,), jnp.float32),
        ),
        out_specs=(row3, row1,
                   pl.BlockSpec((6,), lambda i: (0,),
                                memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((8,), jnp.float32)],
        # Update the particle/weight buffers in place: each grid tile
        # reads only its own block before writing it, and the scan carry
        # donates its buffers - saves an HBM copy per step.
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32),
      jnp.asarray([uniform_flag], jnp.float32),
      jnp.asarray(z, jnp.float32), p_in, lw_in)


def _padded(cfg: PfConfig, tile_n: int) -> tuple[int, int]:
    """(tile, padded particle count) for the fused layout."""
    tile_n = min(tile_n, cfg.num_particles)
    return tile_n, -(-cfg.num_particles // tile_n) * tile_n


@functools.partial(jax.jit, static_argnames=("cfg", "tile_n", "noise_on",
                                             "interpret"))
def pf_fused_predict_weight_stats(cfg: PfConfig, seed, uniform_flag,
                                  particles, log_w, z, tile_n: int = 2048,
                                  noise_on: bool = True,
                                  interpret: bool = False):
    """Fused predict + weight + in-kernel reductions.

    Like :func:`pf_fused_predict_weight` but also returns the step's
    scalar reductions, computed inside the kernel's single pass over the
    particles (see :func:`_pf_stats_kernel`).  (Convenience ``(NP, 3)``
    API; the rollout path uses the transpose-free raw layout.)

    Args:
        uniform_flag: f32 scalar; > 0 treats the incoming ``log_w`` as
            uniform zeros (lazy NaN->uniform reset).

    Returns:
        ``(particles', log_w', stats)`` where ``stats`` is ``(6,)``:
        ``[lse, lse2, x_map, y_map, yaw_map, best_lw]`` with
        ``lse = logsumexp(lw')``, ``lse2 = logsumexp(2 lw')`` and
        ``(x,y,yaw)_map`` the max-weight particle after the update.
    """
    n = cfg.num_particles
    tile_n, n_pad = _padded(cfg, tile_n)
    pad = n_pad - n
    if pad:
        particles = jnp.concatenate(
            [particles, jnp.zeros((pad, 3), particles.dtype)], axis=0)
        log_w = jnp.concatenate([log_w, jnp.zeros((pad,), log_w.dtype)])
    p_in = particles.T.astype(jnp.float32)  # (3, NP)
    lw_in = log_w[None, :].astype(jnp.float32)
    p_out, lw_out, stats = _pf_stats_call(
        cfg, seed, uniform_flag, p_in, lw_in, z, tile_n, noise_on,
        interpret)
    return p_out.T[:n], lw_out[0, :n], stats


class PfFusedState(typing.NamedTuple):
    """Scan state of the fully-fused PF path.

    Particles stay in the kernel's ``(3, N_pad)`` row layout for the
    whole rollout (transposing to ``(NP, 3)`` every step is a
    lane-crossing relayout that costs more than the kernel itself).
    Weights live as UNNORMALIZED ``(1, N_pad)`` log weights - padded
    lanes pinned to ``-inf`` - plus their kernel-computed normalizers
    (``lse = logsumexp(lw)``, ``lse2 = logsumexp(2 lw)``), so no step
    materializes normalized weights unless it resamples.  ``x_est`` is
    the step's point estimate (MAP particle by default).
    """

    x_true: jax.Array  # (3,)
    particles: jax.Array  # (3, N_pad)
    log_w: jax.Array  # (1, N_pad) unnormalized; padded lanes -inf
    lse: jax.Array  # scalar
    lse2: jax.Array  # scalar
    x_est: jax.Array  # (3,)


def pf_fused_init(cfg: PfConfig, state0: PfState | None = None,
                  tile_n: int = 2048) -> PfFusedState:
    """Lift a :class:`PfState` into the fused (padded, row-major)
    representation.  ``tile_n`` must match the step's tile."""
    from tpuslam.filters.pf import pf_init

    if state0 is None:
        state0 = pf_init(cfg)
    n = cfg.num_particles
    _, n_pad = _padded(cfg, tile_n)
    lw = jnp.log(jnp.maximum(state0.weights, 1e-38)).astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lw)
    lse2 = jax.scipy.special.logsumexp(2.0 * lw)
    idx = jnp.argmax(state0.weights)
    p_rows = jnp.zeros((3, n_pad), jnp.float32)
    p_rows = p_rows.at[:, :n].set(state0.particles.T)
    lw_rows = jnp.full((1, n_pad), -jnp.inf, jnp.float32)
    lw_rows = lw_rows.at[0, :n].set(lw)
    return PfFusedState(
        x_true=state0.x_true, particles=p_rows, log_w=lw_rows,
        lse=lse, lse2=lse2, x_est=state0.particles[idx])


def pf_fused_to_state(cfg: PfConfig, fs: PfFusedState) -> PfState:
    """Materialize normalized weights (NaN->uniform, matching
    particle_filter.py:226-237) back into a :class:`PfState`."""
    from tpuslam.filters.pf import weights_from_log

    n = cfg.num_particles
    weights = weights_from_log(cfg, fs.log_w[0, :n], fs.lse)
    return PfState(x_true=fs.x_true, particles=fs.particles.T[:n],
                   weights=weights)


def pf_fused_step_stats(cfg: PfConfig, fs: PfFusedState, key, seed,
                        noise_on: bool = True, interpret: bool = False,
                        tile_n: int = 2048):
    """One PF step, one pass over particle memory.

    Semantics of ``pf_step`` in log-weight mode (resample -> predict ->
    observe -> weight -> normalize -> estimate), with the normalization,
    ESS, and MAP estimate folded into the kernel.  The ESS-gated
    systematic resample is the only remaining O(NP) XLA work and runs
    only in the taken ``lax.cond`` branch.

    Returns ``(next_fs, ess)`` (ESS before resampling, as in ``pf_step``).
    """
    from tpuslam.filters.pf import resample_indices

    k_rs, k_obs = jax.random.split(key)

    # Truth + observation (XLA; tiny).
    x_true = circular_step(fs.x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
    lm = jnp.asarray(cfg.landmarks)
    z = world_to_robot(x_true, lm)
    z = z + jax.random.normal(k_obs, z.shape, z.dtype) * jnp.asarray(
        cfg.r_std)

    n = cfg.num_particles
    # The padded width is a property of the carried state (set by
    # pf_fused_init's tile); the step's tile only needs to divide it.
    n_pad = fs.particles.shape[1]
    tile_n = min(tile_n, n_pad)
    if n_pad % tile_n:
        raise ValueError(
            f"state padded to {n_pad} lanes (from pf_fused_init) is not "
            f"divisible by tile_n={tile_n}")
    # ESS from the kernel stats: sum(w_norm^2) = exp(lse2 - 2 lse).
    bad = ~(jnp.isfinite(fs.lse) & jnp.isfinite(fs.lse2))
    ess = jnp.where(bad, float(n), jnp.exp(2.0 * fs.lse - fs.lse2))
    do_rs = ess < n * cfg.ess_threshold_frac

    def rs(p, lw):
        # Padded lanes have lw = -inf -> weight 0 -> never selected.
        if cfg.resample_method == "merge":
            from tpuslam.ops.resample_pallas import merge_resample_rows

            w_row = jnp.exp(lw - fs.lse)  # padded -inf lanes -> 0
            p2 = merge_resample_rows(k_rs, p, w_row, n,
                                     interpret=interpret)
        else:
            w = jnp.exp(lw[0, :n] - fs.lse)
            idx = resample_indices(k_rs, w, method=cfg.resample_method)
            p2 = jnp.zeros_like(p).at[:, :n].set(p[:, :n][:, idx])
        lw2 = jnp.full_like(lw, -jnp.inf).at[0, :n].set(0.0)
        return p2, lw2

    particles, log_w = jax.lax.cond(
        do_rs, rs, lambda p, lw: (p, lw), fs.particles, fs.log_w)
    # Lazy NaN->uniform reset: applied inside the kernel's read, not as a
    # separate pass.  (After a resample log_w is already uniform zeros.)
    flag = jnp.where(bad & ~do_rs, 1.0, 0.0)

    particles, log_w, stats = _pf_stats_call(
        cfg, seed, flag, particles, log_w, z, tile_n, noise_on, interpret)
    lse, lse2 = stats[0], stats[1]

    if cfg.estimate == "mean":
        from tpuslam.filters.pf import weights_from_log

        weights = weights_from_log(cfg, log_w[0, :n], lse)
        x = particles[0, :n]
        y = particles[1, :n]
        yaw = particles[2, :n]
        x_est = jnp.stack([
            jnp.sum(weights * x), jnp.sum(weights * y),
            jnp.arctan2(jnp.sum(weights * jnp.sin(yaw)),
                        jnp.sum(weights * jnp.cos(yaw)))])
    else:
        # All-NaN weights reset to uniform; argmax of uniform = first
        # particle (np.argmax semantics, particle_filter.py:115-117).
        x_est = jnp.where(jnp.isfinite(lse), stats[2:5], particles[:, 0])

    return PfFusedState(x_true=x_true, particles=particles, log_w=log_w,
                        lse=lse, lse2=lse2, x_est=x_est), ess


def pf_fused_step(cfg: PfConfig, state: PfState, key, seed,
                  noise_on: bool = True, interpret: bool = False):
    """One PF step with the fused kernel; :class:`PfState`-in/out API.

    Thin wrapper over :func:`pf_fused_step_stats` (which avoids the
    weight materialization this API requires - prefer it inside scans).

    ``key`` drives the XLA parts (truth, observation, resample offset);
    ``seed`` drives the kernel's on-core particle-noise stream.
    """
    fs = pf_fused_init(cfg, state)
    fs, ess = pf_fused_step_stats(cfg, fs, key, seed, noise_on=noise_on,
                                  interpret=interpret)
    return pf_fused_to_state(cfg, fs), ess


def pf_fused_rollout(cfg: PfConfig, key, n_steps: int,
                     state0: PfState | None = None, noise_on: bool = True,
                     interpret: bool = False, tile_n: int = 2048):
    """``n_steps`` fused PF steps under ``lax.scan``.

    The scan carry stays in the kernel's padded row layout; the two
    boundary relayouts (init/final) are the only transposes.

    Returns ``(final_state, (x_true, x_est))`` trajectory buffers.
    """
    fs0 = pf_fused_init(cfg, state0, tile_n=tile_n)
    keys = jax.random.split(key, n_steps)

    def body(carry, k):
        fs, seed = carry
        fs, _ = pf_fused_step_stats(cfg, fs, k, seed, noise_on=noise_on,
                                    interpret=interpret, tile_n=tile_n)
        return (fs, seed + 7919), (fs.x_true, fs.x_est)

    (final, _), outs = jax.lax.scan(
        body, (fs0, jnp.asarray(1, jnp.int32)), keys)
    return pf_fused_to_state(cfg, final), outs
