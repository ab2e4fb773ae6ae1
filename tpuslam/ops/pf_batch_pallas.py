"""Batched fused particle filters: B independent small PFs, one per tile.

The reference's own scale is 1000 particles (particle_filter.py:31); the
Monte-Carlo sweep shape is MANY such filters advancing in lockstep
(``filters/pf.py::pf_rollout_batch``).  The XLA path pays for that shape
twice: vmap turns the per-filter ESS gate's ``lax.cond`` into a select
(every step resamples every filter), and the batched
cumsum/searchsorted/gather resample runs through the XLA gather floor.

Here each FILTER IS ONE KERNEL TILE (lanes = its padded particle axis),
which makes every stage tile-local - no cross-tile accumulators, no XLA
glue between steps at all:

  * in-kernel ESS gate: one pass over the tile's log weights gives
    ``lse`` / ``ess`` (the gate value) directly;
  * in-tile systematic resample: weights are quantized to integer
    multiples of 2^-20 and their cumsum computed by one-hot
    lower-triangular MXU matmuls over the tile's lanes - integer
    partial sums below 2^24 are EXACT in f32 regardless of summation
    order, so the boundary sequence is provably monotone and the
    exclusive sum equals the previous inclusive sum exactly: each
    lane's slot interval ``[t_lo, t_hi)`` chains with its neighbor's
    with no gap or overlap.  The interval one-hot
    ``M[i, u] = (t_lo_u <= i < t_hi_u)`` then expands survivors into
    their slots with one 9-split-row value matmul - bit-exact particle
    values, no scatter, no gather, no compaction (non-survivors
    self-mask with empty intervals);
  * predict + landmark log-likelihood reuse the fused kernel's VPU math
    (:func:`tpuslam.ops.pf_pallas._predict_loglik`) with a per-tile
    observation row;
  * per-filter stats (MAP estimate, ESS, lse, fired/bad flags) are a
    tiny per-tile output row.

Parity note: selection follows the hist/merge interval semantics
(``t = ceil(Np*cum - offs)``, trailing clip absorbed by forcing the last
valid lane's boundary), applied to the 2^-20-QUANTIZED weights - a comb
point can land one slot differently than the XLA path (relative weight
perturbation <= 2^-20), the same order of caveat as "hist" vs "search"
(filters/pf.py::systematic_resample).  The quantization is what makes
the in-tile boundaries provably monotone (see the resample comment in
the kernel): an unquantized f32 split-matmul cumsum is NOT
order-monotone, and an inverted interval would silently sum two
particles into one output slot.
"""

from __future__ import annotations

import functools
import math
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.filters.pf import PfConfig
from tpuslam.models.process import circular_step
from tpuslam.core.se2 import world_to_robot
from tpuslam.ops.pf_pallas import _predict_loglik
from tpuslam.ops.resample_pallas import split3


class PfBatchState(typing.NamedTuple):
    """Scan carry of the batched fused PF.

    ``particles``/``log_w`` hold filter f's cloud at lanes
    ``[f*P, (f+1)*P)`` (P = padded per-filter particle count); log
    weights are unnormalized with padding lanes pinned to ``-inf``.
    The truth trajectory is shared - the circular process is
    deterministic, so every filter tracks the same truth (matching
    ``pf_rollout_batch``, where vmapped truths are identical); only the
    observation noise differs per filter.
    """

    x_true: jax.Array  # (3,)
    particles: jax.Array  # (3, B*P)
    log_w: jax.Array  # (1, B*P)


class PfBatchOut(typing.NamedTuple):
    x_true: jax.Array  # (3,)
    x_est: jax.Array  # (B, 3) per-filter MAP estimate
    ess: jax.Array  # (B,) pre-resample ESS (the gate value)
    lse: jax.Array  # (B,) logsumexp of the updated log weights
    resampled: jax.Array  # (B,) bool
    bad: jax.Array  # (B,) bool - NaN/-inf weight reset fired


def _padded_p(cfg: PfConfig) -> int:
    return -(-cfg.num_particles // 128) * 128


def pf_batch_init(cfg: PfConfig, batch: int) -> PfBatchState:
    """All filters at x0 with uniform weights (particle_filter.py:77-84)."""
    p = _padded_p(cfg)
    n = cfg.num_particles
    x0 = jnp.asarray(cfg.x0, jnp.float32)
    lane = jnp.arange(p) < n
    p_blk = jnp.where(lane[None, :], x0[:, None], 0.0)
    lw_blk = jnp.where(lane[None, :], -math.log(float(n)), -jnp.inf)
    return PfBatchState(
        x_true=x0,
        particles=jnp.tile(p_blk, (1, batch)).astype(jnp.float32),
        log_w=jnp.tile(lw_blk, (1, batch)).astype(jnp.float32))


def _pf_batch_kernel(seed_ref, z_ref, lt_inc_ref, lt_exc_ref, p_ref,
                     lw_ref, p_out_ref, lw_out_ref, st_ref, p_cur,
                     lw_cur, *, cfg: PfConfig, P: int, noise_on: bool):
    f = pl.program_id(0)
    n = cfg.num_particles
    if noise_on:
        pltpu.prng_seed(seed_ref[0] + f)

    lw = lw_ref[0:1, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    valid = lane < n
    neg_inf = jnp.float32(-jnp.inf)

    # --- gate statistics on the incoming (previous-step) weights ------
    m = jnp.max(lw)
    e = jnp.exp(lw - m)  # exp(-inf - m) == 0
    s = jnp.sum(e)
    s2 = jnp.sum(e * e)
    bad = ~(jnp.isfinite(m) & (s > 0.0))
    ess = jnp.where(bad, jnp.float32(n), s * s / s2)
    fire = (~bad) & (ess < n * cfg.ess_threshold_frac)
    # Normalized previous log weights (NaN/-inf -> uniform reset,
    # particle_filter.py:226-237).
    lw_norm = jnp.where(bad, -math.log(float(n)), lw - (m + jnp.log(s)))
    lw_norm = jnp.where(valid, lw_norm, neg_inf)

    # Comb offset: drawn unconditionally so the per-tile PRNG stream
    # does not depend on the gate (reduced to a scalar - Mosaic-friendly
    # alternative to a vector lane read).
    if noise_on:
        bits = pltpu.prng_random_bits((1, P))
        offs = jnp.sum(
            jax.lax.shift_right_logical(bits[0:1, 0:1], 8)
            .astype(jnp.float32)) * (1.0 / (1 << 24))
    else:
        offs = jnp.float32(0.5)

    p_cur[:, :] = p_ref[:, :]
    lw_cur[:, :] = lw_norm

    # --- ESS-gated in-tile systematic resample (skipped when the gate
    # does not fire: the matmuls below are the expensive part) ---------
    @pl.when(fire)
    def _resample():
        # QUANTIZED-EXACT cumsum: weights are rounded to integer
        # multiples of 2^-20 of the max-normalized mass, so every
        # partial sum in the one-hot matmuls is an exact integer < 2^24
        # in f32 (the bf16 splits of an integer are themselves
        # integers, and each split row's f32 accumulator stays exact).
        # Exact integer cumsums are MONOTONE in any summation order and
        # the exclusive sum equals the previous inclusive sum exactly -
        # which is what makes the slot intervals chain without overlap.
        # (A raw f32 cumsum is NOT order-monotone: the mid/lo split
        # rows are signed, and a ulp-level inversion would make two
        # lanes' intervals overlap and the value matmul SUM two
        # particles into one slot.)  Weights below 2^-21 of the total
        # quantize to zero slots - statistically negligible.
        w = jnp.exp(lw_norm)  # padding lanes 0
        wq = jnp.round(w * float(1 << 20))  # integers in [0, 2^20]
        wh, wm, wl = split3(wq)
        w3 = jnp.concatenate([wh, wm, wl], axis=0)  # (3, P) bf16
        cum_i3 = jax.lax.dot_general(
            w3, lt_inc_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cum_e3 = jax.lax.dot_general(
            w3, lt_exc_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cum_i = cum_i3[0:1] + cum_i3[1:2] + cum_i3[2:3]
        cum_e = cum_e3[0:1] + cum_e3[1:2] + cum_e3[2:3]
        q_tot = jnp.max(cum_i)  # exact integer total (monotone cumsum)
        t_hi = jnp.clip(jnp.ceil(n * (cum_i / q_tot) - offs), 0.0,
                        float(n))
        t_hi = jnp.where(lane >= n - 1, float(n), t_hi)
        t_lo = jnp.clip(jnp.ceil(n * (cum_e / q_tot) - offs), 0.0,
                        float(n))
        t_lo = jnp.where(lane >= n, float(n), t_lo)

        i_sub = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0) \
            .astype(jnp.float32)
        msk = ((i_sub >= t_lo) & (i_sub < t_hi)).astype(jnp.bfloat16)
        # Split-major value rows: [x y yaw]_hi, _mid, _lo.
        vh, vm, vl = split3(p_ref[:, :])
        v9 = jnp.concatenate([vh, vm, vl], axis=0)  # (9, P) bf16
        part = jax.lax.dot_general(
            v9, msk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (9, P)
        p_cur[0:1, :] = part[0:1] + part[3:4] + part[6:7]
        p_cur[1:2, :] = part[1:2] + part[4:5] + part[7:8]
        p_cur[2:3, :] = part[2:3] + part[5:6] + part[8:9]
        lw_cur[:, :] = jnp.where(valid, -math.log(float(n)), neg_inf)

    # --- predict + landmark log-likelihood ----------------------------
    zget = lambda li, c: z_ref[0, 2 * li + c]  # noqa: E731
    x, y, yaw, acc = _predict_loglik(
        cfg, z_ref, p_cur[0:1, :], p_cur[1:2, :], p_cur[2:3, :],
        noise_on, z_get=zget)
    lw_new = jnp.where(valid, lw_cur[0:1, :] + acc, neg_inf)

    p_out_ref[0:1, :] = x
    p_out_ref[1:2, :] = y
    p_out_ref[2:3, :] = yaw
    lw_out_ref[0:1, :] = lw_new

    # --- per-filter stats row (SMEM scalars) --------------------------
    m2 = jnp.max(lw_new)
    lse_new = m2 + jnp.log(jnp.sum(jnp.exp(lw_new - m2)))
    lanef = lane.astype(jnp.float32)
    best = jnp.max(jnp.where(lw_new == m2, lanef, neg_inf))
    sel = lanef == best
    st_ref[0, 0] = jnp.max(jnp.where(sel, x, neg_inf))
    st_ref[0, 1] = jnp.max(jnp.where(sel, y, neg_inf))
    st_ref[0, 2] = jnp.max(jnp.where(sel, yaw, neg_inf))
    st_ref[0, 3] = ess
    st_ref[0, 4] = lse_new
    st_ref[0, 5] = m2
    st_ref[0, 6] = fire.astype(jnp.float32)
    st_ref[0, 7] = bad.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "noise_on",
                                             "interpret"))
def pf_batch_step(cfg: PfConfig, state: PfBatchState, key, seed,
                  noise_on: bool = True, interpret: bool = False):
    """One step of B independent fused filters (order = main_pf,
    particle_filter.py:86-119: resample -> predict -> observe -> weight
    -> estimate; the shared truth advances first).

    Args:
        state: from :func:`pf_batch_init` (or a previous step).
        key: drives the shared truth's observation noise (per-filter
            independent draws); kernel noise comes from the on-core PRNG
            seeded by ``seed`` + filter id.

    Returns:
        ``(next_state, PfBatchOut)``.
    """
    P = _padded_p(cfg)
    b = state.particles.shape[1] // P

    x_true = circular_step(state.x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
    lm = jnp.asarray(cfg.landmarks, jnp.float32)
    z0 = world_to_robot(x_true, lm)  # (L, 2)
    noise = jax.random.normal(key, (b,) + z0.shape, jnp.float32)
    z = z0[None] + noise * jnp.asarray(cfg.r_std, jnp.float32)
    # Grid-major flat layout (1, B*128): per-tile blocks (1, 128) satisfy
    # Mosaic's block-shape rules (dim0 equal, dim1 divisible by 128).
    z_flat = jnp.zeros((b, 128), jnp.float32)
    z_flat = z_flat.at[:, :z0.size].set(z.reshape(b, -1))
    z_rows = z_flat.reshape(1, b * 128)

    ii = jnp.arange(P, dtype=jnp.int32)
    lt_inc = (ii[:, None] <= ii[None, :]).astype(jnp.bfloat16)
    lt_exc = (ii[:, None] < ii[None, :]).astype(jnp.bfloat16)

    kernel = functools.partial(_pf_batch_kernel, cfg=cfg, P=P,
                               noise_on=noise_on)
    row3 = pl.BlockSpec((3, P), lambda f: (0, f),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((1, P), lambda f: (0, f),
                        memory_space=pltpu.VMEM)
    const = pl.BlockSpec((P, P), lambda f: (0, 0),
                         memory_space=pltpu.VMEM)
    p_out, lw_out, st = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda f: (0, f),
                         memory_space=pltpu.SMEM),
            const, const, row3, row1,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((3, b * P), jnp.float32),
            jax.ShapeDtypeStruct((1, b * P), jnp.float32),
            jax.ShapeDtypeStruct((1, b * 128), jnp.float32),
        ),
        out_specs=(row3, row1,
                   pl.BlockSpec((1, 128), lambda f: (0, f),
                                memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((3, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32)],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), z_rows, lt_inc, lt_exc,
      state.particles, state.log_w)

    st = st.reshape(b, 128)
    out = PfBatchOut(
        x_true=x_true, x_est=st[:, 0:3], ess=st[:, 3], lse=st[:, 4],
        resampled=st[:, 6] > 0.0, bad=st[:, 7] > 0.0)
    return PfBatchState(x_true=x_true, particles=p_out,
                        log_w=lw_out), out


def pf_batch_rollout(cfg: PfConfig, key, batch: int, n_steps: int,
                     noise_on: bool = True, interpret: bool = False):
    """``n_steps`` batched fused steps under ``lax.scan``.

    Returns ``(final_state, outs)`` with outs stacked over steps
    (``x_est (T, B, 3)``, ``ess (T, B)``, ...).
    """
    state0 = pf_batch_init(cfg, batch)
    keys = jax.random.split(key, n_steps)

    def body(carry, inp):
        st, seed = carry
        k = inp
        st, out = pf_batch_step(cfg, st, k, seed, noise_on=noise_on,
                                interpret=interpret)
        return (st, seed + 7919), out

    (final, _), outs = jax.lax.scan(
        body, (state0, jnp.asarray(1, jnp.int32)), keys)
    return final, outs
