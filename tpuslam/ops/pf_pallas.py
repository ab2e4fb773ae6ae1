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

Resampling (cumsum + searchsorted, data-dependent via the ESS gate) and
weight normalization stay in XLA around the kernel - they are O(NP)
memory-bound ops XLA handles well, and searchsorted has no efficient
Mosaic lowering.  :func:`pf_fused_rollout` stitches kernel + gate into a
``lax.scan`` matching ``pf_step``'s semantics in log-weight mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.filters.pf import PfConfig, PfState, systematic_resample
from tpuslam.models.process import circular_step
from tpuslam.core.se2 import world_to_robot

_TWO_PI = 2.0 * math.pi


def _wrap(a):
    mag = jnp.abs(a)
    k = jnp.maximum(jnp.ceil((mag - math.pi) / _TWO_PI), 0.0)
    w = mag - _TWO_PI * k
    return jnp.where(a < 0, -w, w)


def _normals(shape, count):
    out = []
    for _ in range((count + 1) // 2):
        b1 = pltpu.prng_random_bits(shape)
        b2 = pltpu.prng_random_bits(shape)
        u1 = (jax.lax.shift_right_logical(b1, 8).astype(jnp.float32)
              + 0.5) * (1.0 / (1 << 24))
        u2 = jax.lax.shift_right_logical(b2, 8).astype(jnp.float32) * (
            1.0 / (1 << 24))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        ang = _TWO_PI * u2
        out.append(r * jnp.cos(ang))
        out.append(r * jnp.sin(ang))
    return out[:count]


def _pf_kernel(seed_ref, z_ref, p_in_ref, lw_in_ref, p_out_ref,
               lw_out_ref, *, cfg: PfConfig, noise_on: bool):
    if noise_on:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    lane = (1, p_in_ref.shape[1])
    x = p_in_ref[0:1, :]
    y = p_in_ref[1:2, :]
    yaw = p_in_ref[2:3, :]
    lw = lw_in_ref[0:1, :]

    if noise_on:
        n = _normals(lane, 4)
    else:
        n = [jnp.zeros(lane, jnp.float32)] * 4

    # Predict (particle_filter.py:156-168): circular step + Q noise.
    v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt
    q0, q1, q2 = cfg.q_std
    x = x + v * dt * jnp.cos(yaw) + n[0] * q0
    y = y + v * dt * jnp.sin(yaw) + n[1] * q1
    # Reference adds the yaw noise AFTER the wrapped step with no second
    # wrap (particle_filter.py:166); match the XLA path exactly.
    yaw = _wrap(yaw + w * dt) + n[2] * q2

    # Log-likelihood over landmarks (particle_filter.py:170-198), with
    # world_to_robot inlined (BASE_ANG convention, mylib/transform.py).
    sx, sy = cfg.r_std
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
        ddx = (px_l - z_ref[li, 0]) / sx
        ddy = (py_l - z_ref[li, 1]) / sy
        acc = acc - 0.5 * (ddx * ddx + ddy * ddy) - log_norm

    p_out_ref[0:1, :] = x
    p_out_ref[1:2, :] = y
    p_out_ref[2:3, :] = yaw
    lw_out_ref[0:1, :] = lw + acc


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


def pf_fused_step(cfg: PfConfig, state: PfState, key, seed,
                  noise_on: bool = True, interpret: bool = False):
    """One PF step with the fused kernel; semantics of ``pf_step`` in
    log-weight mode (resample -> predict -> observe -> weight).

    ``key`` drives the XLA parts (truth, observation, resample offset);
    ``seed`` drives the kernel's on-core particle-noise stream.
    """
    k_rs, k_obs = jax.random.split(key)

    # Truth + observation (XLA; tiny).
    x_true = circular_step(state.x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
    lm = jnp.asarray(cfg.landmarks)
    z = world_to_robot(x_true, lm)
    z = z + jax.random.normal(k_obs, z.shape, z.dtype) * jnp.asarray(
        cfg.r_std)

    # ESS-gated systematic resample on the normalized weights.
    ess = 1.0 / jnp.sum(jnp.square(state.weights), axis=-1)
    particles, weights = jax.lax.cond(
        ess < cfg.num_particles * cfg.ess_threshold_frac,
        lambda p, w: systematic_resample(k_rs, p, w,
                                         method=cfg.resample_method),
        lambda p, w: (p, w),
        state.particles, state.weights)

    # Fused predict + weight (Pallas).
    log_w = jnp.log(jnp.maximum(weights, 1e-38))
    particles, log_w = pf_fused_predict_weight(
        cfg, seed, particles, log_w, z,
        tile_n=min(2048, cfg.num_particles), noise_on=noise_on,
        interpret=interpret)

    # Normalize (logsumexp) with NaN->uniform reset
    # (particle_filter.py:226-237 semantics).
    lw = log_w - jax.scipy.special.logsumexp(log_w, axis=-1,
                                             keepdims=True)
    weights = jnp.where(jnp.isnan(lw), 1.0 / cfg.num_particles,
                        jnp.exp(lw))
    return PfState(x_true=x_true, particles=particles,
                   weights=weights), ess


def pf_fused_rollout(cfg: PfConfig, key, n_steps: int,
                     state0: PfState | None = None, noise_on: bool = True,
                     interpret: bool = False):
    """``n_steps`` fused PF steps under ``lax.scan``.

    Returns ``(final_state, (x_true, x_est))`` trajectory buffers.
    """
    from tpuslam.filters.pf import pf_estimate, pf_init

    if state0 is None:
        state0 = pf_init(cfg)
    keys = jax.random.split(key, n_steps)

    def body(carry, inp):
        state, seed = carry
        k = inp
        state, _ = pf_fused_step(cfg, state, k, seed, noise_on=noise_on,
                                 interpret=interpret)
        est = pf_estimate(cfg, state.particles, state.weights)
        return (state, seed + 7919), (state.x_true, est)

    (final, _), outs = jax.lax.scan(body, (state0, jnp.asarray(1, jnp.int32)),
                                    keys)
    return final, outs
