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
                    z_get=None, normals=None):
    """Shared kernel math: circular predict + landmark log-likelihood.

    Returns ``(x', y', yaw', loglik)`` rows (all ``(1, tile)``).

    ``z_get(li, c)`` reads the scalar observation component ``c`` of
    landmark ``li`` (default: ``z_ref[li, c]``, the single-filter (L, 2)
    layout; the batched kernel passes a row accessor — any value that
    broadcasts against the lane shape works).

    ``normals`` overrides the in-place Q-noise draw with precomputed
    standard normals (>= 3 lane-shaped arrays) — the chunked batched
    kernel draws them per sub-filter so its PRNG streams stay
    bit-identical to the one-filter-per-cell layout.
    """
    if z_get is None:
        z_get = lambda li, c: z_ref[li, c]  # noqa: E731
    lane = x.shape
    if normals is not None:
        n = normals
    elif noise_on:
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
                     p_out_ref, lw_out_ref, part_ref, *,
                     cfg: PfConfig, noise_on: bool, n_valid: int,
                     tile_n: int, sub_rows: int, n8: int):
    """Predict + weight + per-tile reductions in one pass.

    Each grid tile writes 6 TILE-LOCAL partials (no cross-tile scalar
    chain) into its 8-slot stride of the SMEM output ``part_ref``:
      [0] tile max of lw'     [1] tile sum exp(lw' - max)
      [2] tile sum exp(2(lw' - max))   [3..5] tile-best (x, y, yaw)
    The global logsumexp / argmax combine over the ~G tile partials runs
    in XLA (:func:`_combine_stats`) - measured on a v5e, the previous
    online-rescaling SMEM accumulator cost ~0.5 ms/step at 2M particles
    in PURE SCALAR work (4 scalar ``exp``s per tile on the critical path
    between grid steps; scripts/tpu_pf_profile2/4.py), invariant to
    vector-lane occupancy.  ``flag_ref[0] > 0`` treats incoming log
    weights as uniform 0 (the NaN->uniform reset of
    particle_filter.py:226-237, applied lazily in-pass).

    ``sub_rows`` is the packed-layout row factor R: particle i of the
    flat order lives at row ``i // n8``, column ``i % n8`` of an
    ``(R, n8)`` plane (R=1 is the flat layout).  Packing R=8 fills all
    f32 vreg sublanes - the flat ``(1, tile)`` rows run every VPU op at
    1/8 occupancy (measured 2.5x on the Box-Muller block alone).
    """
    if noise_on:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    r = sub_rows
    lw_in = lw_in_ref[:, :]
    lw_in = jnp.where(flag_ref[0] > 0.0, 0.0, lw_in)

    x, y, yaw, acc = _predict_loglik(
        cfg, z_ref, p_in_ref[0:r, :], p_in_ref[r:2 * r, :],
        p_in_ref[2 * r:3 * r, :], noise_on)
    lw = lw_in + acc

    pid = pl.program_id(0)
    # Global FLAT particle index (f32 is exact up to 2^24 particles) for
    # masking the padded tail and a consistent argmax pick.  (Mosaic's
    # iota is integer-only; cast after.)
    sub = jax.lax.broadcasted_iota(jnp.int32, lw.shape, 0)
    idx = (sub.astype(jnp.float32) * float(n8)
           + jax.lax.broadcasted_iota(jnp.int32, lw.shape, 1)
           .astype(jnp.float32) + pid.astype(jnp.float32) * float(tile_n))
    lane_valid = idx < float(n_valid)
    neg_inf = jnp.float32(-jnp.inf)
    # Padded lanes carry -inf OUT so downstream laneswise consumers
    # (exp -> 0 in the resample cumsum) never see ballast values.
    lw_m = jnp.where(lane_valid, lw, neg_inf)

    p_out_ref[0:r, :] = x
    p_out_ref[r:2 * r, :] = y
    p_out_ref[2 * r:3 * r, :] = yaw
    lw_out_ref[:, :] = lw_m

    tile_max = jnp.max(lw_m)
    # All-padding tiles (possible in the packed layout: a whole trailing
    # row plane can be ballast) have tile_max = -inf; clamp the exp
    # shift so e underflows to 0 instead of exp(-inf + inf) = NaN.
    m_safe = jnp.maximum(tile_max, jnp.float32(-1e30))
    e = jnp.exp(lw_m - m_safe)  # exp(-inf - m) == 0
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

    base = pid * 8
    part_ref[base + 0] = tile_max
    part_ref[base + 1] = tile_sum
    part_ref[base + 2] = tile_sum2
    part_ref[base + 3] = bx
    part_ref[base + 4] = by
    part_ref[base + 5] = byaw
    part_ref[base + 6] = 0.0
    part_ref[base + 7] = 0.0


def _combine_stats(parts):
    """XLA combine of the per-tile kernel partials.

    Args:
        parts: ``(8 * G,)`` f32, 8-slot stride per tile (see
            :func:`_pf_stats_kernel`).

    Returns:
        ``(6,)`` ``[lse, lse2, x_map, y_map, yaw_map, best_lw]`` - the
        same contract the old in-kernel accumulator produced.  Tiny
        (G ~ 128 at 2M particles) and fuses into one XLA kernel inside
        the step.
    """
    p = parts.reshape(-1, 8)
    m_g, s_g, s2_g = p[:, 0], p[:, 1], p[:, 2]
    m = jnp.max(m_g)
    e = jnp.exp(m_g - jnp.maximum(m, jnp.float32(-1e30)))
    lse = m + jnp.log(jnp.sum(e * s_g))
    lse2 = 2.0 * m + jnp.log(jnp.sum(e * e * s2_g))
    i = jnp.argmax(m_g)  # first max, like the old strictly-greater chain
    return jnp.stack([lse, lse2, p[i, 3], p[i, 4], p[i, 5], m])


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
    """Raw-layout stats kernel call: ``(3R, N8)`` / ``(R, N8)`` in and
    out, no transposes (the scan carry stays in kernel layout).  The
    packed row factor R is inferred from the shapes (R=1 is the classic
    flat ``(3, N_pad)`` layout); ``tile_n`` is lanes per row per tile.

    ``n_valid`` overrides the valid flat-index count (defaults to the
    full particle count; the particle-sharded path passes its local
    shard size)."""
    r = p_in.shape[0] // 3
    n8 = p_in.shape[1]
    g = n8 // tile_n
    kernel = functools.partial(
        _pf_stats_kernel, cfg=cfg, noise_on=noise_on,
        n_valid=cfg.num_particles if n_valid is None else n_valid,
        tile_n=tile_n, sub_rows=r, n8=n8)
    rowp = pl.BlockSpec((3 * r, tile_n), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    roww = pl.BlockSpec((r, tile_n), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    p_out, lw_out, parts = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rowp,
            roww,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((3 * r, n8), jnp.float32),
            jax.ShapeDtypeStruct((r, n8), jnp.float32),
            jax.ShapeDtypeStruct((8 * g,), jnp.float32),
        ),
        out_specs=(rowp, roww,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        # Update the particle/weight buffers in place: each grid tile
        # reads only its own block before writing it, and the scan carry
        # donates its buffers - saves an HBM copy per step.
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32),
      jnp.asarray([uniform_flag], jnp.float32),
      jnp.asarray(z, jnp.float32), p_in, lw_in)
    return p_out, lw_out, _combine_stats(parts)


def _padded(cfg: PfConfig, tile_n: int,
            sub_rows: int = 1) -> tuple[int, int]:
    """(tile, padded particle count) for the fused layout.

    With the packed layout (``sub_rows`` = R > 1) the padded count is a
    multiple of ``R * tile_n`` so the ``(R, n_pad // R)`` planes tile
    evenly; the tile shrinks (to a 128-lane multiple) rather than pad a
    small particle set past 2x."""
    if sub_rows == 1:
        tile_n = min(tile_n, cfg.num_particles)
        return tile_n, -(-cfg.num_particles // tile_n) * tile_n
    while tile_n > 128 and tile_n * sub_rows > 2 * cfg.num_particles:
        tile_n //= 2
    chunk = tile_n * sub_rows
    return tile_n, -(-cfg.num_particles // chunk) * chunk


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
    particles: jax.Array  # (3R, N8); R*N8 = N_pad, R=1 is flat
    log_w: jax.Array  # (R, N8) unnormalized; padded lanes -inf
    lse: jax.Array  # scalar
    lse2: jax.Array  # scalar
    x_est: jax.Array  # (3,)


def _pack_rows(rows, r: int):
    """Flat ``(k, N_pad)`` -> packed ``(k*R, N8)``: flat particle i goes
    to row ``i // N8``, column ``i % N8`` of its variable's R-plane (a
    pure row-major reshape per variable)."""
    k, n_pad = rows.shape
    return rows.reshape(k * r, n_pad // r)


def _flat_rows(rows, r: int):
    """Packed ``(k*R, N8)`` -> flat ``(k, N_pad)`` (inverse of
    :func:`_pack_rows`)."""
    kr, n8 = rows.shape
    return rows.reshape(kr // r, n8 * r)


def pf_fused_init(cfg: PfConfig, state0: PfState | None = None,
                  tile_n: int = 2048, sub_rows: int = 1) -> PfFusedState:
    """Lift a :class:`PfState` into the fused (padded, row-major)
    representation.  ``tile_n`` must match the step's tile.

    ``sub_rows`` = R packs the particle axis into R vreg-sublane planes
    (``(3R, N_pad/R)`` state; see :func:`_pf_stats_kernel`) - the
    production choice for large N is 8 (full f32 sublane occupancy,
    measured 3.2x the flat step cost at 2M particles with tile_n=2048;
    scripts/tpu_pf_profile4.py)."""
    from tpuslam.filters.pf import pf_init

    if state0 is None:
        state0 = pf_init(cfg)
    n = cfg.num_particles
    _, n_pad = _padded(cfg, tile_n, sub_rows)
    lw = jnp.log(jnp.maximum(state0.weights, 1e-38)).astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lw)
    lse2 = jax.scipy.special.logsumexp(2.0 * lw)
    idx = jnp.argmax(state0.weights)
    p_rows = jnp.zeros((3, n_pad), jnp.float32)
    p_rows = p_rows.at[:, :n].set(state0.particles.T)
    lw_rows = jnp.full((1, n_pad), -jnp.inf, jnp.float32)
    lw_rows = lw_rows.at[0, :n].set(lw)
    return PfFusedState(
        x_true=state0.x_true, particles=_pack_rows(p_rows, sub_rows),
        log_w=_pack_rows(lw_rows, sub_rows),
        lse=lse, lse2=lse2, x_est=state0.particles[idx])


def pf_fused_to_state(cfg: PfConfig, fs: PfFusedState) -> PfState:
    """Materialize normalized weights (NaN->uniform, matching
    particle_filter.py:226-237) back into a :class:`PfState`."""
    from tpuslam.filters.pf import weights_from_log

    n = cfg.num_particles
    r = fs.particles.shape[0] // 3
    lw = _flat_rows(fs.log_w, r)
    p = _flat_rows(fs.particles, r)
    weights = weights_from_log(cfg, lw[0, :n], fs.lse)
    return PfState(x_true=fs.x_true, particles=p.T[:n],
                   weights=weights)


def pf_fused_step_stats(cfg: PfConfig, fs: PfFusedState, key, seed,
                        noise_on: bool = True, interpret: bool = False,
                        tile_n: int = 2048,
                        merge_caps_kw: tuple = ()):
    """One PF step, one pass over particle memory.

    Semantics of ``pf_step`` in log-weight mode (resample -> predict ->
    observe -> weight -> normalize -> estimate), with the normalization,
    ESS, and MAP estimate folded into the kernel.  The ESS-gated
    systematic resample is the only remaining O(NP) XLA work and runs
    only in the taken ``lax.cond`` branch.

    Returns ``(next_fs, ess)`` (ESS before resampling, as in ``pf_step``).

    ``merge_caps_kw`` is a (hashable) tuple of ``(name, value)`` pairs
    forwarded to :func:`tpuslam.ops.resample_pallas.merge_resample_rows`
    (e.g. ``(("t_in", 512), ("t_k", 128))``) - pure scheduling: any cap
    choice selects identically (tests pin this).
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
    # pf_fused_init's tile and sub_rows); the step's tile only needs to
    # divide the per-row width.
    r = fs.particles.shape[0] // 3
    n8 = fs.particles.shape[1]
    tile_n = min(tile_n, n8)
    if n8 % tile_n:
        raise ValueError(
            f"state padded to {n8} lanes/row (from pf_fused_init) is "
            f"not divisible by tile_n={tile_n}")
    # ESS from the kernel stats: sum(w_norm^2) = exp(lse2 - 2 lse).
    bad = ~(jnp.isfinite(fs.lse) & jnp.isfinite(fs.lse2))
    ess = jnp.where(bad, float(n), jnp.exp(2.0 * fs.lse - fs.lse2))
    do_rs = ess < n * cfg.ess_threshold_frac

    def rs(p, lw):
        # The resample kernels work on the flat lane order; the packed
        # state relayouts to flat and back INSIDE the (rare) firing
        # branch only - a pure reshape in flat-index space.
        p = _flat_rows(p, r)
        lw = _flat_rows(lw, r)
        # Padded lanes have lw = -inf -> weight 0 -> never selected.
        if cfg.resample_method == "merge":
            from tpuslam.ops.resample_pallas import merge_resample_rows

            w_row = jnp.exp(lw - fs.lse)  # padded -inf lanes -> 0
            p2 = merge_resample_rows(k_rs, p, w_row, n,
                                     interpret=interpret,
                                     **dict(merge_caps_kw))
        else:
            w = jnp.exp(lw[0, :n] - fs.lse)
            idx = resample_indices(k_rs, w, method=cfg.resample_method)
            p2 = jnp.zeros_like(p).at[:, :n].set(p[:, :n][:, idx])
        lw2 = jnp.full_like(lw, -jnp.inf).at[0, :n].set(0.0)
        return _pack_rows(p2, r), _pack_rows(lw2, r)

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

        p_flat = _flat_rows(particles, r)
        weights = weights_from_log(cfg, _flat_rows(log_w, r)[0, :n], lse)
        x = p_flat[0, :n]
        y = p_flat[1, :n]
        yaw = p_flat[2, :n]
        x_est = jnp.stack([
            jnp.sum(weights * x), jnp.sum(weights * y),
            jnp.arctan2(jnp.sum(weights * jnp.sin(yaw)),
                        jnp.sum(weights * jnp.cos(yaw)))])
    else:
        # All-NaN weights reset to uniform; argmax of uniform = first
        # particle (np.argmax semantics, particle_filter.py:115-117).
        # Flat particle 0 sits at column 0 of each variable's row plane.
        p0 = jnp.stack([particles[0, 0], particles[r, 0],
                        particles[2 * r, 0]])
        x_est = jnp.where(jnp.isfinite(lse), stats[2:5], p0)

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
                     interpret: bool = False, tile_n: int = 2048,
                     sub_rows: int | None = None,
                     merge_caps_kw: tuple = ()):
    """``n_steps`` fused PF steps under ``lax.scan``.

    The scan carry stays in the kernel's padded row layout; the two
    boundary relayouts (init/final) are the only transposes.

    ``sub_rows=None`` auto-packs: R=8 sublane planes once the particle
    set fills at least one full packed chunk per grid step (the flat
    ``(1, tile)`` layout runs the VPU at 1/8 f32-sublane occupancy;
    packed measured 2.9x at 2M particles, scripts/tpu_pf_profile4.py).
    Noise-free bit-parity tests run small N and stay flat.

    Returns ``(final_state, (x_true, x_est))`` trajectory buffers.
    """
    if sub_rows is None:
        sub_rows = 8 if cfg.num_particles >= 8 * tile_n else 1
    fs0 = pf_fused_init(cfg, state0, tile_n=tile_n, sub_rows=sub_rows)
    keys = jax.random.split(key, n_steps)

    def body(carry, k):
        fs, seed = carry
        fs, _ = pf_fused_step_stats(cfg, fs, k, seed, noise_on=noise_on,
                                    interpret=interpret, tile_n=tile_n,
                                    merge_caps_kw=merge_caps_kw)
        return (fs, seed + 7919), (fs.x_true, fs.x_est)

    (final, _), outs = jax.lax.scan(
        body, (fs0, jnp.asarray(1, jnp.int32)), keys)
    return pf_fused_to_state(cfg, final), outs
