"""Fused batched EKF-SLAM rollout as a single Pallas TPU kernel.

This is the performance path for the BASELINE headline metric (>= 1e6
batched EKF-SLAM sim steps/sec/chip): the entire N-step fused sim+filter
rollout (the math of ``tpuslam.filters.ekf.ekf_step_with_noise``, itself
parity with extended_kalman_filter.py:86-130) runs in ONE kernel launch.

Design (see /opt/skills/guides/pallas_guide.md):
  * Structure-of-arrays layout: the batch lives on the LANE dimension -
    states are ``(9, B)`` rows ``[x_true, x_dr, x_hat]`` and covariances
    ``(9, B)`` row-major 3x3 - so every operation is an (8, 128)-tiled
    VPU elementwise op.  There are no 3x3 matmuls left: the Jacobian/
    covariance products are unrolled into scalar-times-row FMAs (an MXU
    would be idle at these shapes; the VPU is the right unit).
  * RNG on-core: ``pltpu.prng_random_bits`` + Box-Muller, seeded once per
    grid tile.  This removes the dominant cost of the XLA path (threefry
    key splitting per step).  The stream differs from ``jax.random`` -
    results are distributionally, not bitwise, equal to the scan path
    (fidelity is pinned by the noise-free test which must match exactly).
  * The step loop is a ``fori_loop`` inside the kernel: zero per-step
    dispatch or scan overhead; all state stays in VMEM for the whole
    rollout.
  * Position squared-error and NEES accumulate in-kernel into
    ``(1, tile_b)`` carry rows (written out as a ``(2, batch)`` buffer:
    row 0 = sum squared error, row 1 = sum NEES), so the Monte-Carlo
    RMSE/consistency reductions cost one row-sum at the end instead of
    a ``(B, T, 3)`` HBM trajectory buffer.
  * Grid over batch tiles (``TILE_B`` lanes each); each tile folds
    ``program_id`` into its seed for independent streams.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.filters.ekf import EkfConfig, EkfState
from tpuslam.ops.fastmath import sincos_rad

_TWO_PI = 2.0 * math.pi


def _wrap(a):
    """Closed-form equivalent of mylib/limit.py:11-26 (VPU-only, no trig)."""
    mag = jnp.abs(a)
    k = jnp.maximum(jnp.ceil((mag - math.pi) / _TWO_PI), 0.0)
    w = mag - _TWO_PI * k
    return jnp.where(a < 0, -w, w)


from tpuslam.ops.fastmath import normals as _normals  # noqa: E402


def _ekf_kernel(seed_ref, tbl_ref, state_in_ref, cov_in_ref, state_ref,
                cov_ref, err_ref, *, cfg: EkfConfig, n_steps: int,
                noise_on: bool, sub_rows: int, with_nees: bool = True):
    if noise_on:
        # (TPU-only primitive; the noise-free path must stay liftable to
        # CPU interpret mode for the exactness test.)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    v = cfg.vel
    w = cfg.yaw_rate
    dt = cfg.dt
    q0, q1, q2 = (s * s for s in cfg.q_std)
    r0sq, r1sq = (s * s for s in cfg.r_std)
    qa0, qa1, qa2 = cfg.q_act_std
    ra0, ra1 = cfg.r_act_std

    # Each state variable occupies ``sub_rows`` = R packed rows of the
    # (9R, B/R) layout: flat rollout i lives at row i // B8, column
    # i % B8 of its variable's R-plane.  R=1 is the classic flat
    # (1, tile_b) row; R=8 fills all f32 vreg sublanes - every kernel op
    # here is elementwise over lanes, so packing is a pure relayout
    # (bit-identical per lane) that runs the VPU at 8x the occupancy
    # (the PF stats kernel measured 2.5-3.2x end-to-end from the same
    # change; scripts/tpu_pf_profile4.py).
    r = sub_rows
    lane_shape = (r, state_ref.shape[1])

    def step(i, carry):
        (xd0, xd1, xd2, xh0, xh1, xh2,
         p00, p01, p02, p10, p11, p12, p20, p21, p22, acc,
         acc_n) = carry

        if noise_on:
            n = _normals(lane_shape, 6)  # 5 used; Box-Muller pairs of 2
        else:
            n = [jnp.zeros(lane_shape, jnp.float32)] * 6

        # --- ground truth (extended_kalman_filter.py:97): deterministic
        # and identical on every lane, so it is PRECOMPUTED in XLA
        # (tbl = [xt0, xt1, xt2, cos(xt2), sin(xt2)] per step) and read
        # as per-step scalars instead of burning vector trig.
        xt0 = tbl_ref[i, 0]
        xt1 = tbl_ref[i, 1]
        c_t = tbl_ref[i, 3]
        s_t = tbl_ref[i, 4]

        # --- observation: robot-frame noise rotated to world (:100-101).
        # The rotation angle is xt2 - pi/2, so cos = sin(xt2) and
        # sin = -cos(xt2): the pair is free given the table.
        wx = n[0] * ra0
        wy = n[1] * ra1
        z0 = s_t * wx + c_t * wy + xt0
        z1 = -c_t * wx + s_t * wy + xt1

        # --- dead reckoning (:104-106): display-only data (never feeds
        # the filter), so polynomial trig is fine here ------------------
        if noise_on:
            c_d, s_d = sincos_rad(xd2)
        else:  # bit-parity with the XLA scan oracle in the exact test
            c_d = jnp.cos(xd2)
            s_d = jnp.sin(xd2)
        xd0 = xd0 + v * dt * c_d + n[2] * qa0
        xd1 = xd1 + v * dt * s_d + n[3] * qa1
        xd2 = _wrap(xd2 + w * dt + n[4] * qa2)

        # --- predict (:109-115): poly trig in noisy mode (~2e-7 step
        # error, 5 orders under the noise floor; builtin in the
        # noise-free mode for bit-parity with the XLA oracle) ----------
        if noise_on:
            c_h, s_h = sincos_rad(xh2)
        else:
            c_h = jnp.cos(xh2)
            s_h = jnp.sin(xh2)
        xp0 = xh0 + v * dt * c_h
        xp1 = xh1 + v * dt * s_h
        xp2 = _wrap(xh2 + w * dt)
        a = -dt * v * s_h  # jF[0,2]
        b = dt * v * c_h  # jF[1,2]
        # M = jF P  (rows 0,1 pick up a,b times row 2)
        m00 = p00 + a * p20
        m01 = p01 + a * p21
        m02 = p02 + a * p22
        m10 = p10 + b * p20
        m11 = p11 + b * p21
        m12 = p12 + b * p22
        # P- = M jF^T + Q  (cols 0,1 pick up a,b times col 2)
        p00 = m00 + a * m02 + q0
        p01 = m01 + b * m02
        p02 = m02
        p10 = m10 + a * m12
        p11 = m11 + b * m12 + q1
        p12 = m12
        p20n = p20 + a * p22
        p21n = p21 + b * p22
        p20, p21, p22 = p20n, p21n, p22 + q2

        # --- update (:117-128); analytic 2x2 innovation inverse ----------
        s00 = p00 + r0sq
        s01 = p01
        s10 = p10
        s11 = p11 + r1sq
        det = s00 * s11 - s01 * s10
        inv = 1.0 / det
        i00 = s11 * inv
        i01 = -s01 * inv
        i10 = -s10 * inv
        i11 = s00 * inv
        g00 = p00 * i00 + p01 * i10
        g01 = p00 * i01 + p01 * i11
        g10 = p10 * i00 + p11 * i10
        g11 = p10 * i01 + p11 * i11
        g20 = p20 * i00 + p21 * i10
        g21 = p20 * i01 + p21 * i11
        e0 = z0 - xp0
        e1 = z1 - xp1
        xh0 = xp0 + g00 * e0 + g01 * e1
        xh1 = xp1 + g10 * e0 + g11 * e1
        xh2 = _wrap(xp2 + g20 * e0 + g21 * e1)
        # P = P- - G (C P-)  with C P- = rows 0,1 of P-
        n00 = p00 - (g00 * p00 + g01 * p10)
        n01 = p01 - (g00 * p01 + g01 * p11)
        n02 = p02 - (g00 * p02 + g01 * p12)
        n10 = p10 - (g10 * p00 + g11 * p10)
        n11 = p11 - (g10 * p01 + g11 * p11)
        n12 = p12 - (g10 * p02 + g11 * p12)
        n20 = p20 - (g20 * p00 + g21 * p10)
        n21 = p21 - (g20 * p01 + g21 * p11)
        n22 = p22 - (g20 * p02 + g21 * p12)

        # --- in-kernel position-RMSE + NEES accumulators -----------------
        # NEES uses the POSTERIOR position covariance block (analytic
        # 2x2 solve): e^T P^-1 e, chi2(2)-distributed ~ mean 2 for a
        # consistent filter (metrics/metrics.py::nees at full speed).
        d0 = xh0 - xt0
        d1 = xh1 - xt1
        acc = acc + d0 * d0 + d1 * d1
        if with_nees:
            # The per-step divide is the single most expensive op of
            # this block; skip it (statically) when the caller never
            # reads the NEES accumulator.
            det_n = n00 * n11 - n01 * n10
            acc_n = acc_n + (n11 * d0 * d0 - (n01 + n10) * d0 * d1
                             + n00 * d1 * d1) / det_n

        return (xd0, xd1, xd2, xh0, xh1, xh2,
                n00, n01, n02, n10, n11, n12, n20, n21, n22, acc,
                acc_n)

    # Initial state/covariance from the memory-backed input tiles (splat
    # constants in the loop carry trip Mosaic relayout checks).
    init = tuple(state_in_ref[i * r:(i + 1) * r, :]
                 for i in range(3, 9)) + tuple(
        cov_in_ref[i * r:(i + 1) * r, :] for i in range(9)) + (
            state_in_ref[0:r, :] * 0.0, state_in_ref[0:r, :] * 0.0)
    out = jax.lax.fori_loop(0, n_steps, step, init)

    zero_row = state_in_ref[0:r, :] * 0.0
    last = n_steps - 1
    for i in range(3):  # final truth, broadcast from the table
        state_ref[i * r:(i + 1) * r, :] = zero_row + tbl_ref[last, i]
    for i in range(6):
        state_ref[(i + 3) * r:(i + 4) * r, :] = out[i]
    for i in range(9):
        cov_ref[i * r:(i + 1) * r, :] = out[6 + i]
    err_ref[0:r, :] = out[15]
    err_ref[r:2 * r, :] = out[16]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "batch", "n_steps", "tile_b",
                                    "noise_on", "interpret",
                                    "with_nees", "sub_rows"))
def ekf_fused_rollout(cfg: EkfConfig, seed, batch: int, n_steps: int,
                      tile_b: int = 2048, noise_on: bool = True,
                      interpret: bool = False, with_nees: bool = False,
                      sub_rows: int | None = None):
    """Run ``batch`` fused EKF rollouts of ``n_steps`` in one kernel.

    Args:
        cfg: static EKF config (reference defaults).
        seed: int32 scalar array seeding the on-core PRNG.
        batch: number of independent rollouts (multiple of ``tile_b``,
            or smaller than it).
        n_steps: steps per rollout.
        noise_on: disable to get the deterministic noise-free trajectory
            (used by the exactness test against the XLA scan path).
        sub_rows: packed-layout row factor R - each state variable
            occupies R vreg-sublane rows of a ``(9R, batch/R)`` buffer
            so every VPU op runs at full f32 sublane occupancy (the
            flat R=1 rows use 1/8 of each vreg).  ``None`` auto-packs
            R=8 when the batch fills at least one packed tile; the
            relayout is a pure reshape at the XLA boundary and every
            kernel op is lane-elementwise, so results are bit-identical
            to R=1 per rollout.

    Returns:
        ``(EkfState, sum_sq_err)``: final batched state (pytree of
        ``(batch, ...)`` arrays) and the ``(batch,)`` accumulated position
        squared error (divide by n_steps, sqrt, for per-rollout RMSE).
        With ``with_nees=True``, ``(EkfState, sum_sq_err, sum_nees)`` -
        the in-kernel accumulated position NEES (divide by n_steps;
        ~2 for a consistent filter).
    """
    if sub_rows is None:
        sub_rows = 8 if batch % (8 * tile_b) == 0 and batch > 0 else 1
    r = sub_rows
    if batch % r:
        raise ValueError(f"batch {batch} not a multiple of "
                         f"sub_rows {r}")
    n8 = batch // r
    tile_b = min(tile_b, n8)
    if n8 % tile_b:
        raise ValueError(
            f"batch/sub_rows {n8} not a multiple of tile {tile_b}")
    grid = n8 // tile_b

    x0 = jnp.asarray(cfg.x0, jnp.float32)
    # (9, B) variable-major rows; the packed (9R, B/R) view is a pure
    # row-major reshape per variable plane (flat rollout i -> row
    # i // (B/R), column i % (B/R) of its variable's R-plane).
    state0 = jnp.tile(x0[:, None], (3, batch)).reshape(9 * r, n8)
    p0 = jnp.diag(jnp.square(jnp.asarray(cfg.p0_std, jnp.float32)))
    cov0 = jnp.tile(p0.reshape(9, 1), (1, batch)).reshape(9 * r, n8)

    # Truth table (deterministic, lane-invariant): per-step scalars
    # [xt0, xt1, xt2, cos(xt2), sin(xt2)], computed with the same jnp
    # ops as the XLA scan oracle so noise-free parity stays exact.
    v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt

    def _truth(carry, _):
        t0, t1, t2 = carry
        t0 = t0 + v * dt * jnp.cos(t2)
        t1 = t1 + v * dt * jnp.sin(t2)
        t2 = _wrap(t2 + w * dt)
        return (t0, t1, t2), jnp.stack(
            [t0, t1, t2, jnp.cos(t2), jnp.sin(t2)])

    _, tbl = jax.lax.scan(_truth, (x0[0], x0[1], x0[2]), None,
                          length=n_steps)  # (n_steps, 5)

    kernel = functools.partial(_ekf_kernel, cfg=cfg, n_steps=n_steps,
                               noise_on=noise_on, sub_rows=r,
                               with_nees=with_nees)
    row_spec = pl.BlockSpec((9 * r, tile_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    state, cov, err = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            row_spec,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((9 * r, n8), jnp.float32),
            jax.ShapeDtypeStruct((9 * r, n8), jnp.float32),
            jax.ShapeDtypeStruct((2 * r, n8), jnp.float32),
        ),
        out_specs=(
            row_spec,
            row_spec,
            pl.BlockSpec((2 * r, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), tbl, state0, cov0)

    state = state.reshape(9, batch)
    cov = cov.reshape(9, batch)
    err = err.reshape(2, batch)
    final = EkfState(
        x_true=state[0:3].T, x_dr=state[3:6].T, x_hat=state[6:9].T,
        cov=cov.T.reshape(batch, 3, 3))
    if with_nees:
        return final, err[0], err[1]
    return final, err[0]


def ekf_fused_sweeps(cfg: EkfConfig, seed, n_sweeps: int, batch: int,
                     n_steps: int, tile_b: int = 2048,
                     noise_on: bool = True, interpret: bool = False):
    """Run ``n_sweeps`` independent Monte-Carlo sweeps in ONE program.

    Amortizes the per-program dispatch cost across sweeps: on the
    tunneled v5e a jit call costs ~25 ms, which dominates a single
    latency-bound sweep (8192 rollouts x 400 steps is a ~28 ms job, so
    one sweep per call runs at ~1e8 steps/s while the same shape inside
    a large program runs at ~2.8e9).  Stacking K sweeps into one kernel
    launch cuts the dispatch share to 25/K ms per sweep.

    Each sweep gets independent PRNG streams (the kernel folds the tile
    id into the seed and draws per-lane bits, so disjoint rollout slices
    never share draws).

    Returns:
        ``(EkfState, rmse)``: final state (pytree of
        ``(n_sweeps * batch, ...)`` arrays, sweep-major) and the
        ``(n_sweeps,)`` per-sweep position RMSE.
    """
    final, err = ekf_fused_rollout(
        cfg, seed, batch=n_sweeps * batch, n_steps=n_steps,
        tile_b=min(tile_b, batch), noise_on=noise_on, interpret=interpret)
    rmse = jnp.sqrt(err.reshape(n_sweeps, batch).mean(axis=1) / n_steps)
    return final, rmse
