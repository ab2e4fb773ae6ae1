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
    with no gap or overlap.  The survivors (non-empty intervals) are
    then COMPACTED into ``compact_cap`` columns by a rank one-hot and
    expanded from the compacted stack by the interval one-hot
    ``M[i, u] = (t_lo_u <= i < t_hi_u)`` - both masks P x t_k instead
    of P x P and the value dot contracts over t_k, which is what cut
    the measured 2.35 us/firing-filter to ~1 us at P=1024
    (scripts/tpu_pf_batch_floor.py).  Bit-exact particle values: every
    slot receives exactly ONE survivor's bf16 split rows, f32
    reassembled; a resample with more than ``compact_cap`` survivors
    (near-uniform weights) takes the direct P x P expansion under the
    same predicate structure - identical output either way;
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

from tpuslam.filters.pf import PfConfig, boundary_law
from tpuslam.models.process import circular_step
from tpuslam.core.se2 import world_to_robot
from tpuslam.ops.fastmath import normals as _normals
from tpuslam.ops.pf_pallas import _predict_loglik
from tpuslam.ops.resample_pallas import _hprefix_exact, split3_kernel


class PfBatchState(typing.NamedTuple):
    """Scan carry of the batched fused PF.

    ``particles``/``log_w`` hold filter f's cloud at lanes
    ``[f*P, (f+1)*P)`` (P = padded per-filter particle count); log
    weights are unnormalized with padding lanes pinned to ``-inf``.
    The truth trajectory is shared - the circular process is
    deterministic, so every filter tracks the same truth (matching
    ``pf_rollout_batch``, where vmapped truths are identical); only the
    observation noise differs per filter.

    With the sublane-packed layout (``sub_rows`` = R > 1 at init) the
    buffers are ``(3R, B*P/R)`` / ``(R, B*P/R)``: filter f's flat
    particle i lives at row ``var*R + i // (P/R)``, column
    ``f*(P/R) + i % (P/R)`` - each variable fills R vreg sublanes so
    the kernel's VPU ops run at full f32 occupancy (the flat R=1 rows
    use 1/8 of each vreg; see ops/pf_pallas.py::_pf_stats_kernel).
    """

    x_true: jax.Array  # (3,)
    particles: jax.Array  # (3R, B*P/R)
    log_w: jax.Array  # (R, B*P/R)
    #: Carried per-filter normalizers of ``log_w`` (round 5): the ESS
    #: gate reads these instead of recomputing max/sum-exp in-kernel -
    #: the per-sub-filter serial reductions were ~1.4 ms/step at
    #: 8192x1000 (scripts/tpu_pf_batch_ablate_r5.py).  Same carried-
    #: normalizer contract as :class:`PfBatchWideState`; states built by
    #: hand (tests) must keep them consistent with ``log_w`` - use
    #: :func:`pf_batch_refresh_stats`.
    lse: jax.Array  # (B,) logsumexp(log_w)
    lse2: jax.Array  # (B,) logsumexp(2*log_w)


class PfBatchOut(typing.NamedTuple):
    x_true: jax.Array  # (3,)
    x_est: jax.Array  # (B, 3) per-filter MAP estimate
    ess: jax.Array  # (B,) pre-resample ESS (the gate value)
    lse: jax.Array  # (B,) logsumexp of the updated log weights
    resampled: jax.Array  # (B,) bool
    bad: jax.Array  # (B,) bool - NaN/-inf weight reset fired


def _padded_p(cfg: PfConfig, sub_rows: int = 1) -> int:
    base = 128 * sub_rows
    return -(-cfg.num_particles // base) * base


def _auto_sub_rows(cfg: PfConfig) -> int:
    """8 when the packed padding stays within 2x of the flat padding
    (e.g. the reference's 1000 particles pad to 1024 either way)."""
    return 8 if _padded_p(cfg, 8) <= 2 * _padded_p(cfg, 1) else 1


def pack_batch_rows(rows: jax.Array, batch: int, r: int) -> jax.Array:
    """Flat ``(k, B*P)`` -> packed ``(k*R, B*P/R)``: filter f's flat
    particle i goes to row ``v*R + i // (P/R)``, column
    ``f*(P/R) + i % (P/R)`` of variable v's plane."""
    k, bp = rows.shape
    p = bp // batch
    p8 = p // r
    return (rows.reshape(k, batch, r, p8).transpose(0, 2, 1, 3)
            .reshape(k * r, batch * p8))


def flat_batch_rows(rows: jax.Array, batch: int, r: int) -> jax.Array:
    """Inverse of :func:`pack_batch_rows`."""
    kr, bp8 = rows.shape
    k = kr // r
    p8 = bp8 // batch
    return (rows.reshape(k, r, batch, p8).transpose(0, 2, 1, 3)
            .reshape(k, batch * r * p8))


def pf_batch_init(cfg: PfConfig, batch: int,
                  sub_rows: int = 1) -> PfBatchState:
    """All filters at x0 with uniform weights (particle_filter.py:77-84).

    ``sub_rows`` = R packs each filter's particle axis into R
    vreg-sublane planes (see :class:`PfBatchState`); R=1 is the flat
    layout the interpret-mode parity tests use."""
    r = sub_rows
    p = _padded_p(cfg, r)
    p8 = p // r
    n = cfg.num_particles
    x0 = jnp.asarray(cfg.x0, jnp.float32)
    valid = (jnp.arange(p).reshape(r, p8) < n)
    p_blk = jnp.where(valid[None], x0[:, None, None], 0.0)  # (3, R, P8)
    p_blk = p_blk.reshape(3 * r, p8)
    lw_blk = jnp.where(valid, -math.log(float(n)), -jnp.inf)
    return PfBatchState(
        x_true=x0,
        particles=jnp.tile(p_blk, (1, batch)).astype(jnp.float32),
        log_w=jnp.tile(lw_blk, (1, batch)).astype(jnp.float32),
        # Uniform weights: lse = log(n * 1/n) = 0, lse2 = -log n.
        lse=jnp.zeros((batch,), jnp.float32),
        lse2=jnp.full((batch,), -math.log(float(n)), jnp.float32))


def pf_batch_refresh_stats(cfg: PfConfig, state: PfBatchState
                           ) -> PfBatchState:
    """Recompute the carried ``lse``/``lse2`` normalizers from ``log_w``.

    For states assembled by hand (tests, checkpoint surgery): the ESS
    gate reads the carried normalizers, so injected log weights must be
    accompanied by consistent ones.
    """
    r = state.particles.shape[0] // 3
    p8 = _padded_p(cfg, r) // r
    b = state.particles.shape[1] // p8
    lw = (flat_batch_rows(state.log_w, b, r) if r > 1
          else state.log_w).reshape(b, r * p8)
    m = jnp.max(lw, axis=1)
    mc = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(lw - mc[:, None])
    lse = m + jnp.log(jnp.sum(e, axis=1))
    lse2 = 2.0 * m + jnp.log(jnp.sum(e * e, axis=1))
    return state._replace(lse=lse, lse2=lse2)


def _pf_batch_kernel(seed_ref, gate_ref, z_ref, p_ref,
                     lw_ref, p_out_ref, lw_out_ref, part_ref, p_cur,
                     lw_cur, flat3, flat1, nzs, *, cfg: PfConfig, P: int,
                     noise_on: bool, sub_rows: int, g: int,
                     compact_cap: int, ablate: tuple = ()):
    """G filters per grid cell (g=1 is the original one-filter-per-cell
    layout; other g match it exactly on particles/estimates and to 1 ulp
    on the per-filter logsumexp normalizer, whose scalar reduction fuses
    differently over a slice of a wider block).

    The ~0.5 us fixed cost per grid cell was the 8192-filter floor
    (~4 ms/step, STATUS.md round-4); chunking G filters into one cell
    amortizes it Gx.  The resample stays PER FILTER (an unrolled loop of
    ``@pl.when(fire_k)`` closures over column slices); everything else
    is VECTORIZED over the whole (R, G*P8) block (round 5): the ESS
    gate reads per-filter fire/normalizer scalars prefetched from the
    CARRIED ``lse``/``lse2`` (``gate_ref`` rows: fire, lse, bad - the
    wide kernel's pattern), and the per-filter stats are emitted as
    per-COLUMN partial rows (``part_ref``, 8 x G*P8) that a tiny XLA
    combine reduces - the former per-sub-filter serial reductions +
    scalar SMEM writes were ~3.9 ms/step at 8192x1000
    (scripts/tpu_pf_batch_ablate_r5.py).  Per-filter PRNG streams are
    preserved exactly by re-seeding ``seed + cell*G + k`` before each
    sub-filter's draws (== ``seed + f``), drawing its comb offset and
    Q-noise normals in the original order into the ``nzs`` scratch.
    """
    c = pl.program_id(0)
    n = cfg.num_particles
    r = sub_rows
    p8 = P // r
    # ``ablate`` (measurement-only; see pf_batch_step): compile-time
    # knockouts of kernel blocks for the offset-corrected attribution
    # ladder (scripts/tpu_pf_batch_ablate_r5.py).  Never set in
    # production paths.
    if "copy_only" in ablate:
        p_out_ref[:, :] = p_ref[:, :]
        lw_out_ref[:, :] = lw_ref[:, :]
        part_ref[:, :] = jnp.zeros_like(part_ref)
        return

    # Flat per-filter particle index of each packed element (row-major
    # over the R planes; exact in f32/int32 well past any tile size).
    lane1 = (jax.lax.broadcasted_iota(jnp.int32, (r, p8), 0) * p8
             + jax.lax.broadcasted_iota(jnp.int32, (r, p8), 1))
    valid1 = lane1 < n
    if g == 1:
        lane_g, valid_g = lane1, valid1
    else:
        col_g = jax.lax.broadcasted_iota(jnp.int32, (r, g * p8), 1)
        lane_g = (jax.lax.broadcasted_iota(jnp.int32, (r, g * p8), 0) * p8
                  + jax.lax.rem(col_g, jnp.int32(p8)))
        valid_g = lane_g < n
    neg_inf = jnp.float32(-jnp.inf)

    p_cur[:, :] = p_ref[:, :]

    for k in range(g):
        cols = slice(k * p8, (k + 1) * p8)
        lw = lw_ref[:, cols]  # (R, P8); R=1 is the flat layout

        if "no_gate" in ablate:  # measurement-only knockout
            lw_cur[:, cols] = lw
            fire = False
            lw_norm = lw
        else:
            # --- gate from the CARRIED normalizers (XLA computed fire/
            # bad from lse/lse2; rows: [fire, lse, bad]) ---------------
            fire = gate_ref[0, c * g + k] > 0.0
            cnorm = gate_ref[1, c * g + k]
            badk = gate_ref[2, c * g + k] > 0.0
            # Normalized previous log weights (NaN/-inf -> uniform
            # reset, particle_filter.py:226-237); lse == m + log(s).
            lw_norm = jnp.where(badk, jnp.float32(-math.log(float(n))),
                                lw - cnorm)
            lw_norm = jnp.where(valid1, lw_norm, neg_inf)
            lw_cur[:, cols] = lw_norm

        # Per-sub-filter PRNG stream == the one-filter-per-cell stream:
        # re-seed, then draw the comb offset and the 4 Q-noise normals
        # in the original order (offset drawn unconditionally so the
        # stream does not depend on the gate).
        if noise_on:
            pltpu.prng_seed(seed_ref[0] + c * g + k)
            bits = pltpu.prng_random_bits((r, p8))
            offs = jnp.sum(
                jax.lax.shift_right_logical(bits[0:1, 0:1], 8)
                .astype(jnp.float32)) * (1.0 / (1 << 24))
            nk = _normals((r, p8), 4)
            for j in range(4):
                nzs[j * r:(j + 1) * r, cols] = nk[j]
        else:
            offs = jnp.float32(0.5)

        if "no_resample" in ablate or "no_gate" in ablate:
            continue  # measurement-only: predict/likelihood still run

        # --- ESS-gated in-tile systematic resample (skipped when the
        # gate does not fire: the matmuls below are the expensive part)
        @pl.when(fire)
        def _resample(cols=cols, lw_norm=lw_norm, offs=offs):
            # QUANTIZED-EXACT cumsum: weights are rounded to integer
            # multiples of 2^-20 of the max-normalized mass, so every
            # partial sum in the one-hot matmuls is an exact integer
            # < 2^24 in f32 (the bf16 splits of an integer are
            # themselves integers, and each split row's f32 accumulator
            # stays exact).  Exact integer cumsums are MONOTONE in any
            # summation order and the exclusive sum equals the previous
            # inclusive sum exactly - which is what makes the slot
            # intervals chain without overlap.  (A raw f32 cumsum is
            # NOT order-monotone: the mid/lo split rows are signed, and
            # a ulp-level inversion would make two lanes' intervals
            # overlap and the value matmul SUM two particles into one
            # slot.)  Weights below 2^-21 of the total quantize to zero
            # slots - statistically negligible.
            #
            # The interval machinery works on the FLAT per-filter lane
            # order (the one-hot cumsum/expand matmuls contract over
            # lanes); the packed R>1 layout relayouts through the flat
            # VMEM scratch rows with R static row copies per variable -
            # cheap, and only on the (gated) firing path.
            w = jnp.exp(lw_norm)  # padding lanes 0
            wq = jnp.round(w * float(1 << 20))  # integers in [0, 2^20]
            if r == 1:
                wq_f = wq
            else:
                for kk in range(r):
                    flat1[0:1, kk * p8:(kk + 1) * p8] = wq[kk:kk + 1, :]
                wq_f = flat1[0:1, :]
            lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            wh, wm, wl = split3_kernel(wq_f)
            # Hierarchical exclusive prefix of the exact integers (the
            # merge kernel's (P/128, 128)-plane triangular + log-step
            # form): measured 0.42 us/firing-filter cheaper than a
            # (3, P) @ (P, P) lower-triangular matmul at P=1024
            # (scripts/tpu_pf_batch_fire_ablate.py), and bit-identical
            # (integer partial sums < 2^24 are exact in any order).
            # The inclusive prefix is then an exact integer addition.
            cum_e = _hprefix_exact([wh, wm, wl], P)
            cum_i = cum_e + wq_f
            q_tot = jnp.max(cum_i)  # exact integer total (monotone)
            # ONE reciprocal, then the shared multiply-only law: a
            # single f32 multiply is monotone in `cum` under any
            # lowering, so the no-overlap interval chaining holds
            # regardless of how Mosaic rounds the reciprocal itself
            # (filters/pf.py::boundary_law).
            inv_tot = 1.0 / q_tot
            t_hi = jnp.clip(boundary_law(cum_i, inv_tot, n, offs), 0.0,
                            float(n))
            t_hi = jnp.where(lane_f >= n - 1, float(n), t_hi)
            t_lo = jnp.clip(boundary_law(cum_e, inv_tot, n, offs), 0.0,
                            float(n))
            t_lo = jnp.where(lane_f >= n, float(n), t_lo)

            # Split-major value rows: [x y yaw]_hi, _mid, _lo.
            if r == 1 and g == 1:
                v_f = p_ref[:, :]
            else:
                for v in range(3):
                    for kk in range(r):
                        flat3[v:v + 1, kk * p8:(kk + 1) * p8] = \
                            p_ref[v * r + kk:v * r + kk + 1, cols]
                v_f = flat3[:, :]
            vh, vm, vl = split3_kernel(v_f)
            v9 = jnp.concatenate([vh, vm, vl], axis=0)  # (9, P) bf16

            def writeback(part, cols=cols):
                px = part[0:1] + part[3:4] + part[6:7]
                py = part[1:2] + part[4:5] + part[7:8]
                pyaw = part[2:3] + part[5:6] + part[8:9]
                if r == 1:
                    p_cur[0:1, cols] = px
                    p_cur[1:2, cols] = py
                    p_cur[2:3, cols] = pyaw
                else:
                    for kk in range(r):
                        sl = slice(kk * p8, (kk + 1) * p8)
                        p_cur[kk:kk + 1, cols] = px[0:1, sl]
                        p_cur[r + kk:r + kk + 1, cols] = py[0:1, sl]
                        p_cur[2 * r + kk:2 * r + kk + 1, cols] = \
                            pyaw[0:1, sl]

            def full_expand(v9=v9, t_lo=t_lo, t_hi=t_hi):
                # Direct (P, P) interval one-hot: slot j (sublane) takes
                # lane u (lane dim) iff t_lo_u <= j < t_hi_u.
                i_sub = jax.lax.broadcasted_iota(
                    jnp.int32, (P, P), 0).astype(jnp.float32)
                msk = ((i_sub >= t_lo)
                       & (i_sub < t_hi)).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    v9, msk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (9, P)
                writeback(part)

            if compact_cap:
                # Compact-then-expand: pull the cnt survivors (lanes
                # with a non-empty slot interval) into t_k columns with
                # a rank one-hot, then expand from the (15, t_k) stack -
                # both masks are P*t_k instead of P*P and the expand
                # dot's contraction shrinks P -> t_k (8x at t_k=128).
                # Bit-exact: every output slot still receives exactly
                # ONE survivor's bf16 split rows (one-hot products, f32
                # reassembly), identical to the full path.  The full
                # path stays as the predicated overflow fallback (a
                # near-uniform firing resample can have ~n survivors).
                t_k = compact_cap
                f_srv = (t_hi > t_lo).astype(jnp.float32)  # (1, P) 0/1
                cnt = jnp.sum(f_srv)
                ovf = cnt > float(t_k)

                @pl.when(~ovf)
                def _compact_expand(v9=v9, t_lo=t_lo, t_hi=t_hi,
                                    f_srv=f_srv):
                    # Exclusive survivor rank (exact 0/1 integer sums),
                    # hierarchical for the same measured reason as the
                    # weight prefix above: a (1, P) @ (P, P) rank matmul
                    # cost as much as the mask savings it enabled.
                    rank_e = _hprefix_exact(
                        [f_srv.astype(jnp.bfloat16)], P)
                    krow = jax.lax.broadcasted_iota(
                        jnp.int32, (t_k, P), 0).astype(jnp.float32)
                    sel = ((krow == rank_e)
                           & (f_srv > 0.0)).astype(jnp.bfloat16)
                    th3 = split3_kernel(t_hi)
                    tl3 = split3_kernel(t_lo)
                    stack = jnp.concatenate(
                        [v9, th3[0], th3[1], th3[2],
                         tl3[0], tl3[1], tl3[2]], axis=0)  # (15, P)
                    tc = jax.lax.dot_general(
                        stack, sel, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (15, t_k)
                    t_hi_c = tc[9:10] + tc[10:11] + tc[11:12]
                    t_lo_c = tc[12:13] + tc[13:14] + tc[14:15]
                    # Each tc value IS a bf16 value (one-hot select of a
                    # bf16 split row) - the cast back is exact.  Unused
                    # columns (rank >= cnt) are zero with empty [0, 0)
                    # intervals: inert in the expand mask.
                    vc = tc[0:9].astype(jnp.bfloat16)
                    i2 = jax.lax.broadcasted_iota(
                        jnp.int32, (P, t_k), 0).astype(jnp.float32)
                    m2 = ((i2 >= t_lo_c)
                          & (i2 < t_hi_c)).astype(jnp.bfloat16)
                    part = jax.lax.dot_general(
                        vc, m2, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (9, P)
                    writeback(part)

                @pl.when(ovf)
                def _full():
                    full_expand()
            else:
                full_expand()
            lw_cur[:, cols] = jnp.where(valid1, -math.log(float(n)),
                                        neg_inf)

    # --- predict + landmark log-likelihood (vectorized over the G
    # filters; per-filter z components are precomputed (2L, B*P8) rows
    # that broadcast against the (R, G*P8) block) ----------------------
    zget = lambda li, cc: z_ref[2 * li + cc:2 * li + cc + 1, :]  # noqa: E731
    nrm = ([nzs[j * r:(j + 1) * r, :] for j in range(4)]
           if noise_on else None)
    x, y, yaw, acc = _predict_loglik(
        cfg, z_ref, p_cur[0:r, :], p_cur[r:2 * r, :],
        p_cur[2 * r:3 * r, :], noise_on, z_get=zget, normals=nrm)
    if "no_like" in ablate:  # measurement-only: acc unused -> DCE'd
        acc = jnp.float32(0.0)
    lw_new = jnp.where(valid_g, lw_cur[:, :] + acc, neg_inf)

    p_out_ref[0:r, :] = x
    p_out_ref[r:2 * r, :] = y
    p_out_ref[2 * r:3 * r, :] = yaw
    lw_out_ref[:, :] = lw_new

    if "no_stats" in ablate:  # measurement-only knockout
        part_ref[:, :] = jnp.zeros_like(part_ref)
        return

    # --- per-COLUMN stats partials (round 5): one vectorized pass over
    # the whole (R, G*P8) block; the per-filter reduction over the P8
    # columns happens in XLA (_combine_batch_stats).  Rows: m_col,
    # s_col, s2_col, lane_best, x/y/yaw at the column argmax (max flat
    # lane among column ties - composing with the XLA cross-column max
    # reproduces the old "largest flat lane among global ties" pick
    # exactly). ---------------------------------------------------------
    m_col = jnp.max(lw_new, axis=0, keepdims=True)  # (1, G*P8)
    mc = jnp.where(m_col > neg_inf, m_col, 0.0)
    e = jnp.exp(lw_new - mc)  # empty/-inf lanes -> 0
    s_col = jnp.sum(e, axis=0, keepdims=True)
    s2_col = jnp.sum(e * e, axis=0, keepdims=True)
    lane_f = lane_g.astype(jnp.float32)
    sel = lw_new == m_col
    lane_b = jnp.max(jnp.where(sel, lane_f, neg_inf), axis=0,
                     keepdims=True)
    sel2 = sel & (lane_f == lane_b)
    x_b = jnp.max(jnp.where(sel2, x, neg_inf), axis=0, keepdims=True)
    y_b = jnp.max(jnp.where(sel2, y, neg_inf), axis=0, keepdims=True)
    yaw_b = jnp.max(jnp.where(sel2, yaw, neg_inf), axis=0,
                    keepdims=True)
    part_ref[0:1, :] = m_col
    part_ref[1:2, :] = s_col
    part_ref[2:3, :] = s2_col
    part_ref[3:4, :] = lane_b
    part_ref[4:5, :] = x_b
    part_ref[5:6, :] = y_b
    part_ref[6:7, :] = yaw_b
    part_ref[7:8, :] = jnp.zeros_like(m_col)


def _combine_batch_stats(part, b: int, p8: int):
    """Reduce the kernel's per-column stats partials to per-filter values.

    ``part`` rows (8, B*P8): [m_col, s_col, s2_col, lane_best, x_b, y_b,
    yaw_b, 0] (see the kernel's stats block).  Cross-column max + a
    scaled sum reproduce logsumexp; the MAP pick composes the per-column
    max-lane tie-break with a cross-column argmax on (m, lane) so the
    selected lane equals the old in-kernel "largest flat lane among
    global ties" exactly.

    Returns ``(lse (B,), lse2 (B,), x_est (B, 3))``.
    """
    p = part.reshape(8, b, p8)
    m_col, s_col, s2_col, lane_b = p[0], p[1], p[2], p[3]
    m = jnp.max(m_col, axis=1)  # (B,)
    mc = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(m_col - mc[:, None])
    lse = m + jnp.log(jnp.sum(e * s_col, axis=1))
    lse2 = 2.0 * m + jnp.log(jnp.sum(e * e * s2_col, axis=1))
    # Column with the globally-largest tie lane: lane ids are unique per
    # filter, so argmax over (m_col == m ? lane_b : -inf) is unambiguous.
    cand = jnp.where(m_col == m[:, None], lane_b, -jnp.inf)
    jc = jnp.argmax(cand, axis=1)  # (B,)
    pick = jnp.take_along_axis(
        p[4:7], jc[None, :, None], axis=2)[..., 0]  # (3, B)
    return lse, lse2, pick.T


def _auto_filters_per_cell(b: int) -> int:
    """Largest of (8, 4, 2, 1) dividing the batch: amortizes the
    ~0.5 us per-grid-cell fixed cost that floors large batches."""
    for cand in (8, 4, 2):
        if b % cand == 0:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("cfg", "noise_on",
                                             "interpret",
                                             "filters_per_cell",
                                             "compact_cap", "_ablate"))
def pf_batch_step(cfg: PfConfig, state: PfBatchState, key, seed,
                  noise_on: bool = True, interpret: bool = False,
                  filters_per_cell: int | None = None,
                  compact_cap: int = 128, _ablate: tuple = ()):
    """One step of B independent fused filters (order = main_pf,
    particle_filter.py:86-119: resample -> predict -> observe -> weight
    -> estimate; the shared truth advances first).

    Args:
        state: from :func:`pf_batch_init` (or a previous step).
        key: drives the shared truth's observation noise (per-filter
            independent draws); kernel noise comes from the on-core PRNG
            seeded by ``seed`` + filter id.
        filters_per_cell: filters served per grid cell (must divide B;
            default auto = 8 where possible).  A scheduling knob: the
            kernel re-seeds each sub-filter's PRNG stream at
            ``seed + f``, so outputs match across values (exactly on
            particles/estimates; to 1 ulp on the logsumexp normalizer —
            see :func:`_pf_batch_kernel`).
        _ablate: measurement-only compile-time block knockouts for the
            offset-corrected attribution ladder (any of "copy_only",
            "no_gate", "no_resample", "no_like", "no_stats"; see
            scripts/tpu_pf_batch_ablate_r5.py).  Outputs are WRONG with
            any knockout active - never set outside timing scripts.
        compact_cap: survivor cap of the compact-then-expand firing
            path (0 disables: always run the direct (P, P) interval
            expansion).  Another pure scheduling knob - outputs are
            bit-identical across values (overflowing filters take the
            full path).  On real hardware use a multiple of the
            128-lane tile: the one-hot compact matmul lowers to fully
            padded (P, cap-rounded-to-128) MXU tiles, so e.g. cap=64
            costs the same as cap=128 (sub-128 caps only make sense in
            interpret mode for tests).

    Returns:
        ``(next_state, PfBatchOut)``.
    """
    if compact_cap < 0:
        raise ValueError(f"compact_cap must be >= 0, got {compact_cap}")
    r = state.particles.shape[0] // 3  # packed row factor (1 = flat)
    P = _padded_p(cfg, r)
    p8 = P // r
    b = state.particles.shape[1] // p8
    g = (_auto_filters_per_cell(b) if filters_per_cell is None
         else filters_per_cell)
    if b % g:
        raise ValueError(f"filters_per_cell {g} must divide batch {b}")

    x_true = circular_step(state.x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
    lm = jnp.asarray(cfg.landmarks, jnp.float32)
    z0 = world_to_robot(x_true, lm)  # (L, 2)
    noise = jax.random.normal(key, (b,) + z0.shape, jnp.float32)
    z = z0[None] + noise * jnp.asarray(cfg.r_std, jnp.float32)
    # Observation components as (2L, B*P8) rows (filter f's values
    # broadcast across its column block) so the chunked kernel's
    # vectorized likelihood reads per-filter z by ROW slice; rows are
    # padded to a sublane multiple.
    zr = -(-2 * z0.shape[0] // 8) * 8
    z_rows = jnp.zeros((zr, b, 1), jnp.float32)
    z_rows = z_rows.at[:2 * z0.shape[0]].set(
        z.reshape(b, -1).T[:, :, None])
    z_rows = jnp.broadcast_to(z_rows, (zr, b, p8)).reshape(zr, b * p8)

    # --- gate from the carried normalizers (wide-kernel pattern) ------
    n = cfg.num_particles
    bad = ~(jnp.isfinite(state.lse) & jnp.isfinite(state.lse2))
    ess = jnp.where(bad, jnp.float32(n),
                    jnp.exp(2.0 * state.lse - state.lse2))
    fire = (~bad) & (ess < n * cfg.ess_threshold_frac)
    gate_rows = jnp.stack([fire.astype(jnp.float32),
                           jnp.where(bad, 0.0, state.lse),
                           bad.astype(jnp.float32)])  # (3, B)

    kernel = functools.partial(_pf_batch_kernel, cfg=cfg, P=P,
                               noise_on=noise_on, sub_rows=r, g=g,
                               compact_cap=compact_cap, ablate=_ablate)
    row3 = pl.BlockSpec((3 * r, g * p8), lambda c: (0, c),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((r, g * p8), lambda c: (0, c),
                        memory_space=pltpu.VMEM)
    row8 = pl.BlockSpec((8, g * p8), lambda c: (0, c),
                        memory_space=pltpu.VMEM)
    p_out, lw_out, part = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((zr, g * p8), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            row3, row1,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((3 * r, b * p8), jnp.float32),
            jax.ShapeDtypeStruct((r, b * p8), jnp.float32),
            jax.ShapeDtypeStruct((8, b * p8), jnp.float32),
        ),
        out_specs=(row3, row1, row8),
        scratch_shapes=[pltpu.VMEM((3 * r, g * p8), jnp.float32),
                        pltpu.VMEM((r, g * p8), jnp.float32),
                        pltpu.VMEM((3, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((4 * r, g * p8), jnp.float32)],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), gate_rows, z_rows,
      state.particles, state.log_w)

    lse_new, lse2_new, x_est = _combine_batch_stats(part, b, p8)
    out = PfBatchOut(
        x_true=x_true, x_est=x_est, ess=ess, lse=lse_new,
        resampled=fire, bad=bad)
    return PfBatchState(x_true=x_true, particles=p_out,
                        log_w=lw_out, lse=lse_new, lse2=lse2_new), out


def pf_batch_rollout(cfg: PfConfig, key, batch: int, n_steps: int,
                     noise_on: bool = True, interpret: bool = False,
                     sub_rows: int | None = None, seed0=1,
                     filters_per_cell: int | None = None,
                     compact_cap: int = 128, _ablate: tuple = ()):
    """``n_steps`` batched fused steps under ``lax.scan``.

    ``sub_rows=None`` auto-packs each filter's particle axis into 8
    vreg-sublane planes when the packed padding stays within 2x of the
    flat padding (the reference's 1000 particles pad to 1024 either
    way) - the flat (1, P) rows run the kernel's VPU work at 1/8 f32
    sublane occupancy (see ops/pf_pallas.py).

    Returns ``(final_state, outs)`` with outs stacked over steps
    (``x_est (T, B, 3)``, ``ess (T, B)``, ...).
    """
    if sub_rows is None:
        sub_rows = _auto_sub_rows(cfg)
    state0 = pf_batch_init(cfg, batch, sub_rows=sub_rows)
    keys = jax.random.split(key, n_steps)

    def body(carry, inp):
        st, seed = carry
        k = inp
        st, out = pf_batch_step(cfg, st, k, seed, noise_on=noise_on,
                                interpret=interpret,
                                filters_per_cell=filters_per_cell,
                                compact_cap=compact_cap, _ablate=_ablate)
        return (st, seed + 7919), out

    (final, _), outs = jax.lax.scan(
        body, (state0, jnp.asarray(seed0, jnp.int32)), keys)
    return final, outs


# ---------------------------------------------------------------------------
# Wide batched filters: B filters x W tiles each (beyond one tile/filter).
# ---------------------------------------------------------------------------

class PfBatchWideState(typing.NamedTuple):
    """Scan carry of the WIDE batched fused PF (many tiles per filter).

    The one-tile kernel above caps a filter at ~1-2k particles (its
    in-tile interval matmuls are P x P).  The wide path scales each
    filter across ``W`` 1024-lane tiles by reusing the single-filter
    merge machinery per filter: an exact-integer tiled prefix makes the
    in-tile boundary builds chain across tiles with no gap or overlap
    (:func:`tpuslam.ops.resample_pallas.tile_boundary_compact`), a
    compaction pass caps survivors per tile, and an expansion pass walks
    the filter's compacted window blocks (no skip table - W is small).

    ``particles``/``log_w`` hold filter f at lanes ``[f*Np, (f+1)*Np)``
    with ``Np = W * tile``; log weights are UNNORMALIZED with padding
    lanes pinned to ``-inf``; per-filter normalizers (``lse``, ``lse2``)
    ride as ``(B,)`` rows like the single-filter fused state.

    With the sublane-packed layout (``sub_rows`` = R > 1 at init) the
    buffers are ``(3R, B*Np/R)`` / ``(R, B*Np/R)`` in the
    :func:`pack_batch_rows` order: pass C (predict + weight + stats,
    every step) runs at full f32 vreg occupancy; the resample passes
    work on the flat order, reached by one XLA transpose inside the
    (gated) firing branch.
    """

    x_true: jax.Array  # (3,)
    particles: jax.Array  # (3R, B*Np/R)
    log_w: jax.Array  # (R, B*Np/R)
    lse: jax.Array  # (B,)
    lse2: jax.Array  # (B,)
    x_est: jax.Array  # (B, 3)


# Slot-key modulus for the wide kernel's boundary encoding: must
# exceed w_b (max window blocks, hence max distinct slots per pass-B
# window) and keep _SLOT_MOD * (np_ + 1) f32-exact (np_ <= ~1M).
_SLOT_MOD = 16


def _wide_dims(cfg: PfConfig, tile_n: int):
    n = cfg.num_particles
    w_tiles = -(-n // tile_n)
    return w_tiles, w_tiles * tile_n


def pf_batch_wide_init(cfg: PfConfig, batch: int, tile_n: int = 1024,
                       sub_rows: int = 1) -> PfBatchWideState:
    """All filters at x0 with uniform weights (particle_filter.py:77-84).

    ``sub_rows`` = R packs each filter's particle axis into R
    vreg-sublane planes (see :class:`PfBatchWideState`); R=1 is the
    flat layout the interpret-mode parity tests use."""
    r = sub_rows
    w_tiles, np_ = _wide_dims(cfg, tile_n)
    np8 = np_ // r
    n = cfg.num_particles
    x0 = jnp.asarray(cfg.x0, jnp.float32)
    valid = (jnp.arange(np_).reshape(r, np8) < n)
    p_blk = jnp.where(valid[None], x0[:, None, None], 0.0)
    p_blk = p_blk.reshape(3 * r, np8)
    lw_blk = jnp.where(valid, 0.0, -jnp.inf)
    lse = jnp.full((batch,), math.log(float(n)), jnp.float32)
    return PfBatchWideState(
        x_true=x0,
        particles=jnp.tile(p_blk, (1, batch)).astype(jnp.float32),
        log_w=jnp.tile(lw_blk, (1, batch)).astype(jnp.float32),
        lse=lse, lse2=lse, x_est=jnp.tile(x0[None], (batch, 1)))


def _wide_compact_kernel(fids_ref, inv_ref, offs_ref,
                         valid_ref, p_ref, wq_ref, cum_ref, out_ref,
                         cnt_ref, *, t_k: int, n: int, w_tiles: int,
                         g_a: int, tile_n: int):
    """Pass A, grid (CAP, W/G): per-firing-slot boundary + compact.

    The grid runs over compacted FIRING-FILTER SLOTS, not filters: slot
    ``c`` reads filter ``fids[c]``'s tiles through the prefetched index
    map, so non-firing filters cost nothing (the old (B, W) grid paid a
    grid step per filter-tile every step even when gated off - the
    dominant cost at B >= 1024).  Padded slots (``c >= n_fire``) read
    filter 0 harmlessly and write ``cnt = 0``, which excludes their
    window blocks from the skip table.

    Each cell covers ``g_a`` consecutive resample tiles (unrolled): the
    one-tile-per-cell grid paid ~1 us/cell of fixed cost x 10,240 cells
    at 1024x10k (scripts/tpu_wide_profile4.py stage 3, ~10.8 ms/step).
    The weight prefix arrives PRECOMPUTED from XLA (``cum_ref``, the
    exact integer cumsum of the quantized weights - bit-identical to
    any in-kernel build; integer partial sums < 2**24 are exact in any
    order).  Keeping it in-kernel was measured and lost: the
    hierarchical split-triangular build costs ~3 ms/step untiered and
    a lane-roll scan ~5 ms (scripts/tpu_passa_ablate.py, STATUS.md
    round 3), vs ~0.35 ms for the XLA cumsum.

    Boundaries are stored with a ``(c % _SLOT_MOD) * (np_ + 1)`` slot
    key (see :func:`tile_boundary_compact`'s ``key_offset``): a pass-B
    window of ``w_b`` consecutive COMPRESSED blocks spans at most
    ``w_b`` consecutive slots (every firing slot owns >= 1 nonempty
    block - its quantized weights sum to 2^20), so ``w_b + 1 <=
    _SLOT_MOD`` keys distinguish every block a window can read and a
    foreign slot's intervals can never cover this slot's output range.
    The spacing must exceed the PADDED per-filter lane count ``np_``,
    not ``n``: pass-B output lanes run over all ``np_`` local slots, so
    an ``n + 1`` spacing would let slot ``c``'s padding lanes
    (``i_loc > n``) alias into slot ``c + 1``'s keyed intervals and
    receive its particles instead of staying 0.
    """
    from tpuslam.ops.resample_pallas import tile_boundary_compact

    c = pl.program_id(0)
    wc = pl.program_id(1)
    koff = ((c % _SLOT_MOD).astype(jnp.float32)
            * jnp.float32(w_tiles * tile_n + 1))
    live = valid_ref[c] > 0
    # Tile-invariant one-hot row index, built once per cell.
    krow = (jax.lax.broadcasted_iota(jnp.int32, (t_k, tile_n), 0)
            .astype(jnp.float32))

    for u in range(g_a):
        w = wc * g_a + u
        sid = c * w_tiles + w
        sl = slice(u * tile_n, (u + 1) * tile_n)

        @pl.when(live)
        def _go(w=w, sid=sid, sl=sl, u=u):
            out, cnt = tile_boundary_compact(
                wq_ref[0:1, sl], p_ref[:, sl], None, inv_ref[c],
                offs_ref[c], w * tile_n, n, t_k, key_offset=koff,
                cum_in=cum_ref[0:1, sl], krow=krow)
            out_ref[:, u * t_k:(u + 1) * t_k] = out
            cnt_ref[0, sid] = cnt.astype(jnp.int32)

        @pl.when(jnp.logical_not(live))
        def _skip(sid=sid):
            cnt_ref[0, sid] = 0


def _wide_compact_seg_kernel(fids_ref, inv_ref, offs_ref,
                             valid_ref, x_ref, y_ref, yaw_ref, wq_ref,
                             cum_ref, out_ref, cnt_ref, *, t_k: int,
                             n: int, w_tiles: int, g_a: int,
                             tile_n: int):
    """Segment-packed pass A (:func:`tile_boundary_compact_seg`).

    Same grid/slot/key scheme as :func:`_wide_compact_kernel`, but the
    particle/weight/prefix planes arrive as free XLA ``(rows, 128)``
    bitcasts and the whole tile body runs at full sublane occupancy
    with zero in-kernel relayouts (the flat kernel's (1, tile_n) rows
    ran every VPU op at 1/8 occupancy and paid ~0.2 us per relayout -
    scripts/tpu_pf_ablate_r4d.py).  Selection and values bit-match the
    flat kernel (CPU interpret tests pin it).
    """
    from tpuslam.ops.resample_pallas import tile_boundary_compact_seg

    c = pl.program_id(0)
    wc = pl.program_id(1)
    koff = ((c % _SLOT_MOD).astype(jnp.float32)
            * jnp.float32(w_tiles * tile_n + 1))
    live = valid_ref[c] > 0
    s_tile = tile_n // 128
    krow = (jax.lax.broadcasted_iota(jnp.int32, (t_k, 128), 0)
            .astype(jnp.float32))

    for u in range(g_a):
        w = wc * g_a + u
        sid = c * w_tiles + w
        sl = slice(u * s_tile, (u + 1) * s_tile)

        @pl.when(live)
        def _go(w=w, sid=sid, sl=sl, u=u):
            out, cnt = tile_boundary_compact_seg(
                wq_ref[sl, :],
                (x_ref[sl, :], y_ref[sl, :], yaw_ref[sl, :]),
                None, inv_ref[c], offs_ref[c], w * tile_n, n, t_k,
                key_offset=koff, cum_in=cum_ref[sl, :], krow=krow)
            out_ref[:, u * t_k:(u + 1) * t_k] = out
            cnt_ref[0, sid] = cnt.astype(jnp.int32)

        @pl.when(jnp.logical_not(live))
        def _skip(sid=sid):
            cnt_ref[0, sid] = 0


def _wide_stats_kernel(*refs, cfg: PfConfig, noise_on: bool,
                       c_cells: int, np8: int, sub_rows: int,
                       fused: bool = False):
    """Pass C, grid (B, C): predict + weight + per-chunk partials.

    The wide twin of the single-filter ``_pf_stats_kernel``: each grid
    cell covers a CHUNK of consecutive packed lanes (several resample
    tiles - the per-cell fixed cost measured ~0.5 us on a v5e, so the
    old one-tile-per-cell (B, W) grid paid ~5 ms/step at 1024x10k's
    10240 cells) and writes 8 chunk-local partials (max, sum, sum2,
    best x/y/yaw) into its stride of ``part_ref``; the per-filter
    logsumexp/argmax combine over the C chunks runs in XLA
    (:func:`_combine_wide_stats`).

    ``fused`` adds the resample merge the XLA glue used to do: a
    prefetched per-filter slot map ``src`` routes each cell to its
    filter's block of the expand kernel's PACKED output (see
    :func:`tpuslam.ops.resample_pallas.expand_compacted` ``out3d``),
    and a per-filter fire flag selects expanded-vs-carried particles
    and resets weights in-register - replacing the take / fire-lane
    where / uniform-weight tile / re-pack transposes (each a full pass
    over the 126 MB particle set at 1024x10k).  Bit-exact: the same
    expanded values and the same uniform weights reach the same
    predict, in the same packed lane order.
    """
    if fused:
        (src_ref, seed_ref, flag_ref, fire_ref, z_ref, p_in_ref,
         lw_in_ref, exp_ref, p_out_ref, lw_out_ref, part_ref) = refs
    else:
        (seed_ref, flag_ref, z_ref, p_in_ref, lw_in_ref,
         p_out_ref, lw_out_ref, part_ref) = refs
        src_ref = fire_ref = exp_ref = None
    f = pl.program_id(0)
    g = pl.program_id(1)
    n = cfg.num_particles
    r = sub_rows
    c8 = lw_in_ref.shape[1]  # lanes per packed row per chunk
    if noise_on:
        pltpu.prng_seed(seed_ref[0] + f * c_cells + g)

    lw_in = lw_in_ref[:, :]  # (R, C8); R=1 is the flat layout
    px = p_in_ref[0:r, :]
    py = p_in_ref[r:2 * r, :]
    pyaw = p_in_ref[2 * r:3 * r, :]
    if fused:
        fire_f = fire_ref[f] > 0.0
        if r > 1:
            ex0, ex1, ex2 = exp_ref[0], exp_ref[1], exp_ref[2]
        else:
            ex0 = exp_ref[0:1, :]
            ex1 = exp_ref[1:2, :]
            ex2 = exp_ref[2:3, :]

        def fsel(a, b):
            # Explicit broadcast + select: a scalar-pred jnp.where here
            # trips a jax mlir closed_call lowering-cache KeyError when
            # the fused and unfused pass-C variants share one program.
            return jax.lax.select(jnp.broadcast_to(fire_f, a.shape),
                                  a, b)

        px = fsel(ex0, px)
        py = fsel(ex1, py)
        pyaw = fsel(ex2, pyaw)
        # Uniform restart: 0 on every lane; the lane-validity mask
        # below sends the padding lanes to -inf exactly like the old
        # XLA uniform row did before the add.
        lw_in = fsel(jnp.zeros_like(lw_in), lw_in)
    lw_in = jnp.where(flag_ref[f] > 0.0, 0.0, lw_in)

    zget = lambda li, c: z_ref[0, 2 * li + c]  # noqa: E731
    x, y, yaw, acc = _predict_loglik(
        cfg, z_ref, px, py, pyaw, noise_on, z_get=zget)
    lw = lw_in + acc

    # Flat per-filter particle index (pack_batch_rows order: plane row
    # s covers flat [s*Np/R, (s+1)*Np/R), chunk g its [g*C8, (g+1)*C8)
    # slice).
    idx = (jax.lax.broadcasted_iota(jnp.int32, lw.shape, 0)
           .astype(jnp.float32) * jnp.float32(np8)
           + jax.lax.broadcasted_iota(jnp.int32, lw.shape, 1)
           .astype(jnp.float32) + jnp.float32(c8) *
           g.astype(jnp.float32))
    lane_valid = idx < float(n)
    neg_inf = jnp.float32(-jnp.inf)
    lw_m = jnp.where(lane_valid, lw, neg_inf)

    p_out_ref[0:r, :] = x
    p_out_ref[r:2 * r, :] = y
    p_out_ref[2 * r:3 * r, :] = yaw
    lw_out_ref[:, :] = lw_m

    tile_max = jnp.max(lw_m)
    # All-padding tiles have tile_max = -inf; clamp the exp shift so e
    # underflows to 0 instead of exp(-inf + inf) = NaN.
    m_safe = jnp.maximum(tile_max, jnp.float32(-1e30))
    e = jnp.exp(lw_m - m_safe)
    tile_sum = jnp.sum(e)
    tile_sum2 = jnp.sum(e * e)
    best_idx = jnp.max(jnp.where(lw_m == tile_max, idx, neg_inf))
    sel = idx == best_idx
    bx = jnp.max(jnp.where(sel, x, neg_inf))
    by = jnp.max(jnp.where(sel, y, neg_inf))
    byaw = jnp.max(jnp.where(sel, yaw, neg_inf))

    base = (f * c_cells + g) * 8
    part_ref[0, base + 0] = tile_max
    part_ref[0, base + 1] = tile_sum
    part_ref[0, base + 2] = tile_sum2
    part_ref[0, base + 3] = bx
    part_ref[0, base + 4] = by
    part_ref[0, base + 5] = byaw
    part_ref[0, base + 6] = 0.0
    part_ref[0, base + 7] = 0.0


def _combine_wide_stats(parts, b: int, w_tiles: int):
    """XLA combine of the pass-C per-tile partials, batched over
    filters.

    Args:
        parts: ``(1, 8 * B * W)`` f32, 8-slot stride per (filter, tile)
            cell (see :func:`_wide_stats_kernel`).

    Returns:
        ``(B, 6)`` rows ``[lse, lse2, x_map, y_map, yaw_map, best_lw]``
        - the contract the old in-kernel accumulator chain produced.
    """
    p = parts.reshape(b, w_tiles, 8)
    m_g, s_g, s2_g = p[..., 0], p[..., 1], p[..., 2]
    m = jnp.max(m_g, axis=1)  # (B,)
    e = jnp.exp(m_g - jnp.maximum(m, jnp.float32(-1e30))[:, None])
    lse = m + jnp.log(jnp.sum(e * s_g, axis=1))
    lse2 = 2.0 * m + jnp.log(jnp.sum(e * e * s2_g, axis=1))
    i = jnp.argmax(m_g, axis=1)  # first max, like the old chain
    pick = jnp.take_along_axis(p, i[:, None, None], axis=1)[:, 0]
    return jnp.stack([lse, lse2, pick[:, 3], pick[:, 4], pick[:, 5], m],
                     axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "tile_n", "noise_on",
                                             "interpret", "fire_cap",
                                             "w_b", "fire_cap_small",
                                             "t_k", "pass2",
                                             "pass_a", "w_b_small",
                                             "_rs_stop"))
def pf_batch_wide_step(cfg: PfConfig, state: PfBatchWideState, key, seed,
                       tile_n: int = 1024, noise_on: bool = True,
                       interpret: bool = False,
                       fire_cap: int | None = None, w_b: int = 12,
                       fire_cap_small: int | None = None,
                       t_k: int | None = None, pass2: str = "windowed",
                       pass_a: str = "flat", w_b_small: int = 8,
                       _rs_stop: str = ""):
    """One step of B wide filters (main_pf order: resample -> predict ->
    observe -> weight -> estimate).

    The per-filter ESS gate reads the carried normalizers (no weight
    materialization).  Firing filters are COMPACTED into ``fire_cap``
    slots and only those slots run the two-pass in-kernel merge: pass A
    over ``(fire_cap, W)`` grid cells, pass B through the same skip-table
    expand as the single-filter merge kernel
    (:func:`tpuslam.ops.resample_pallas.expand_compacted`) over
    ``(fire_cap * W, w_b)`` cells in slot space.  The previous dense
    ``(B, W, W * nw)`` pass-B grid paid ~2e5 grid steps per step at
    1024x10k (measured 1.6e8 particle-steps/s, DOWN from 2.7e8 at
    128x10k - grid overhead, not compute) and ~1.2e6 at 64x100k.
    Selection is bit-identical per filter to the hist/merge law on the
    same quantized weights; a global ``lax.cond`` falls back to the
    vmapped XLA decode when ``n_fire > fire_cap`` or a tile/window cap
    overflows, and the whole resample is skipped when no filter fires.

    Args:
        fire_cap: static max simultaneously-firing filters served by the
            kernel path (overflow -> XLA fallback, correctness
            unaffected).  Default ``B``: firing is CORRELATED across
            filters - all clouds track the same truth, so observation
            quality (hence weight concentration) co-moves, and measured
            bursts reach 0.8 B (scripts/tpu_wide_profile2.py: n_fire
            per step at B=1024 hits 842 at the default 1% ESS gate;
            95-97 of 100 rollout steps fire at least one filter).
            Any cap below the burst size pays the all-filter XLA decode
            (~280 ms at 1024x10k) on burst steps, which dominated the
            rollout: cap=B/16 + w_b=4 measured 3.6e7 particle-steps/s
            over a 100-step 1024x10k rollout vs 2.6e8 with cap=B +
            w_b=12, and 4.0e8 with the two-tier dispatch (128x10k:
            4.3e7 -> 4.7e8; scripts/tpu_round2_measure2.py).
        w_b: skip-table window blocks per output tile (out tiles whose
            survivors span more fall back).  Default matches the
            single-filter :func:`merge_caps` choice; 4 overflowed on
            typical post-gate survivor spreads (see above).
        pass2: ``"windowed"`` = pass B fetches ``w_b`` window-block
            refs per output tile (:func:`expand_compacted`);
            ``"compressed"`` = XLA block-compression + two wide
            super-refs per tile (:func:`expand_compressed`) - same
            selection bit-for-bit, ~6x fewer pass-B DMAs.
        fire_cap_small: static slot count of the SMALL kernel tier
            (default ``max(8, B // 4)``, clipped to ``fire_cap``).  The
            resample cost is O(cap * N) per firing step regardless of
            the burst size, so a second tier sized for the TYPICAL
            burst (measured mean 215/1024 firing filters per step at
            the default gate) serves most steps at a quarter of the
            full-cap cost; bursts above it take the full-cap tier via
            a carried-state ``lax.cond``.  Set equal to ``fire_cap``
            to disable tiering.  Measured at 1024x10k (100 steps):
            B//8 -> 3.0e8, B//4 -> 4.0e8, B//2 -> 3.8e8 p-s/s
            (no-fire floor 1.05e9; untiered 2.6e8).
    """
    from tpuslam.ops.resample_pallas import (decode_indices,
                                             expand_compacted,
                                             inert_tail, skip_table,
                                             slot_boundaries)

    w_tiles, np_ = _wide_dims(cfg, tile_n)
    r = state.particles.shape[0] // 3  # packed row factor (1 = flat)
    np8 = np_ // r
    t8 = tile_n // r
    b = state.particles.shape[1] // np8
    n = cfg.num_particles
    if w_b + 1 > _SLOT_MOD:
        raise ValueError(f"w_b={w_b} needs > {_SLOT_MOD} slot keys; a "
                         "pass-B window may alias two filters")
    if _SLOT_MOD * (np_ + 1) >= 1 << 24:
        raise ValueError(f"n={n} (padded {np_}): slot-keyed boundaries "
                         "exceed f32 exactness (max ~1M particles per "
                         "filter)")
    # Pass-A survivor cap per resample tile.  The compact/expand one-hot
    # dots' FLOPs scale linearly with it (M is 128-sublane padded either
    # way); post-gate survivor rates are ~5%, so smaller caps are safe
    # for typical firings and overflow falls back to the XLA decode.
    t_k = min(256, tile_n) if t_k is None else min(t_k, tile_n)
    wb2 = min(128, t_k)
    nw = t_k // wb2
    cap = b if fire_cap is None else fire_cap
    cap_small = (min(cap, max(8, b // 4)) if fire_cap_small is None
                 else max(1, min(fire_cap_small, cap)))

    k_rs, k_obs = jax.random.split(key)
    x_true = circular_step(state.x_true, cfg.vel, cfg.yaw_rate, cfg.dt)
    lm = jnp.asarray(cfg.landmarks, jnp.float32)
    z0 = world_to_robot(x_true, lm)
    noise = jax.random.normal(k_obs, (b,) + z0.shape, jnp.float32)
    z = z0[None] + noise * jnp.asarray(cfg.r_std, jnp.float32)
    z_flat = jnp.zeros((b, 128), jnp.float32)
    z_flat = z_flat.at[:, :z0.size].set(z.reshape(b, -1))
    z_rows = z_flat.reshape(1, b * 128)

    # --- per-filter gate from carried normalizers ----------------------
    bad = ~(jnp.isfinite(state.lse) & jnp.isfinite(state.lse2))
    ess = jnp.where(bad, float(n),
                    jnp.exp(2.0 * state.lse - state.lse2))
    fire = (~bad) & (ess < n * cfg.ess_threshold_frac)
    offs = jax.random.uniform(k_rs, (b,), jnp.float32)

    fire_i = fire.astype(jnp.int32)
    pos = jnp.cumsum(fire_i) - fire_i  # firing slot of filter f
    n_fire = jnp.sum(fire_i)

    def fire_path(_):
        from tpuslam.filters.pf import quantize_weights_law

        # The resample passes work on the FLAT per-filter lane order;
        # the packed carry relayouts through one XLA transpose here,
        # inside the gated firing branch only.
        p_flat = (flat_batch_rows(state.particles, b, r) if r > 1
                  else state.particles)
        lw_flat = (flat_batch_rows(state.log_w, b, r) if r > 1
                   else state.log_w)
        lw2 = lw_flat.reshape(b, np_)

        def _trunc(dep):
            """Measurement-only stage truncation (``_rs_stop``): return
            the un-resampled particles with a live data dependence on
            the stage result so nothing upstream is DCE'd.  Outputs are
            WRONG; used only by scripts/tpu_wide_ablate_r5.py."""
            out = p_flat + dep.astype(jnp.float32) * 1e-30
            if r > 1:
                out = out.reshape(3, b * r, np8)
            return out, jnp.clip(pos, 0, b - 1)

        if _rs_stop == "transpose":
            return _trunc(jnp.sum(lw_flat[0:1, 0:1]))

        def xla_slots(_):
            # All-filter decode: the overflow fallback (cnt/w_b guard
            # failed).  O(B*N); correctness oracle for the kernel tiers.
            # FILTER-indexed output (src = identity), so no take needed.
            w_rows = jnp.exp(lw2 - state.lse[:, None])

            def one(wr, of):
                t_row = slot_boundaries(wr[None, :], n, of)
                idx = decode_indices(t_row, n)
                return idx
            idxs = jax.vmap(one)(w_rows, offs)  # (B, n)
            p3 = p_flat.reshape(3, b, np_)
            out = jnp.zeros((3, b, np_), jnp.float32)
            taken = jnp.take_along_axis(
                p3, idxs[None, :, :], axis=2)  # (3, B, n)
            out = out.at[:, :, :n].set(taken)
            out = (out.reshape(3, b * r, np8) if r > 1
                   else out.reshape(3, b * np_))
            return out, jnp.arange(b, dtype=jnp.int32)

        def fire_tier(cap_t: int):
            """Kernel resample serving <= cap_t firing slots.

            Everything here is O(cap_t * N), not O(B * N):
            ``quantize_weights_law`` is row-independent, so gathering
            the firing filters' weight rows FIRST and quantizing
            ``(cap_t, np_)`` is bit-identical per filter to quantizing
            all of ``(B, np_)`` and gathering after.
            """
            def go(_):
                # --- firing-filter slot compaction ----------------------
                tgt = jnp.where(fire, pos, cap_t)
                fids = jnp.zeros((cap_t,), jnp.int32).at[tgt].set(
                    jnp.arange(b, dtype=jnp.int32), mode="drop",
                    unique_indices=True)
                valid_slot = (jnp.arange(cap_t, dtype=jnp.int32)
                              < n_fire).astype(jnp.int32)

                # --- quantize the gathered firing rows ------------------
                w_sel = jnp.exp(lw2[fids] - state.lse[fids][:, None])
                total = jnp.sum(w_sel, axis=-1, keepdims=True)
                wq = quantize_weights_law(w_sel, total)  # (cap_t, np_)
                # Exact integer prefix (total 2^20 < 2^24: any-order
                # f32 sums are exact, bit-matching an in-kernel build).
                cum_in = jnp.cumsum(wq, axis=-1)
                q_tot = cum_in[:, -1]
                inv_slot = 1.0 / q_tot.astype(jnp.float32)
                offs_slot = offs[fids]
                wq_rows = wq.reshape(1, cap_t * np_)
                cum_rows = cum_in.reshape(1, cap_t * np_)
                if _rs_stop == "prologue":
                    return _trunc(cum_rows[0, -1] + jnp.sum(offs_slot))

                # --- pass A: compact (slots only), chunked cells --------
                # Wider cells than pass C (16k lanes vs 8k): pass A has
                # no r-packed carry blocks, so VMEM stays small and the
                # ~1 us/cell fixed cost halves again.
                g_a = 1
                for d in range(w_tiles, 0, -1):
                    if w_tiles % d == 0 and d * tile_n <= 16384:
                        g_a = d
                        break
                wcells = w_tiles // g_a
                out_specs = [
                    pl.BlockSpec(
                        (15, g_a * t_k),
                        lambda c, w, *_: (0, c * wcells + w),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ]
                out_shape = [
                    jax.ShapeDtypeStruct((15, cap_t * w_tiles * t_k),
                                         jnp.bfloat16),
                    jax.ShapeDtypeStruct((1, cap_t * w_tiles),
                                         jnp.int32),
                ]
                if pass_a == "seg" and tile_n % 256 == 0:
                    # Segment-packed pass A: free XLA bitcasts to
                    # (rows, 128) planes, full-occupancy tile body.
                    # NOT the default: the seg tile body runs s_tile
                    # small one-hot dots per tile where the flat body
                    # runs one wide dot, and at the wide kernel's tiny
                    # per-tile FLOPs the dot-count overhead outweighs
                    # the occupancy win (measured: 9.29 vs 8.7 ms/step
                    # at 1024x10k default gate).
                    s_tile = tile_n // 128
                    pseg = pl.BlockSpec(
                        (g_a * s_tile, 128),
                        lambda c, w, fids, *_: (
                            fids[c] * wcells + w, 0),
                        memory_space=pltpu.VMEM)
                    wseg = pl.BlockSpec(
                        (g_a * s_tile, 128),
                        lambda c, w, *_: (c * wcells + w, 0),
                        memory_space=pltpu.VMEM)
                    tc, cnt = pl.pallas_call(
                        functools.partial(
                            _wide_compact_seg_kernel, t_k=t_k, n=n,
                            w_tiles=w_tiles, g_a=g_a, tile_n=tile_n),
                        grid_spec=pltpu.PrefetchScalarGridSpec(
                            num_scalar_prefetch=4,
                            grid=(cap_t, wcells),
                            in_specs=[pseg, pseg, pseg, wseg, wseg],
                            out_specs=out_specs,
                        ),
                        out_shape=out_shape,
                        interpret=interpret,
                    )(fids, inv_slot, offs_slot, valid_slot,
                      p_flat[0].reshape(-1, 128),
                      p_flat[1].reshape(-1, 128),
                      p_flat[2].reshape(-1, 128),
                      wq_rows.reshape(-1, 128),
                      cum_rows.reshape(-1, 128))
                else:
                    tc, cnt = pl.pallas_call(
                        functools.partial(
                            _wide_compact_kernel, t_k=t_k, n=n,
                            w_tiles=w_tiles, g_a=g_a, tile_n=tile_n),
                        grid_spec=pltpu.PrefetchScalarGridSpec(
                            num_scalar_prefetch=4,
                            grid=(cap_t, wcells),
                            in_specs=[
                                pl.BlockSpec(
                                    (3, g_a * tile_n),
                                    lambda c, w, fids, *_: (
                                        0, fids[c] * wcells + w),
                                    memory_space=pltpu.VMEM),
                                pl.BlockSpec(
                                    (1, g_a * tile_n),
                                    lambda c, w, *_: (
                                        0, c * wcells + w),
                                    memory_space=pltpu.VMEM),
                                pl.BlockSpec(
                                    (1, g_a * tile_n),
                                    lambda c, w, *_: (
                                        0, c * wcells + w),
                                    memory_space=pltpu.VMEM),
                            ],
                            out_specs=out_specs,
                        ),
                        out_shape=out_shape,
                        interpret=interpret,
                    )(fids, inv_slot, offs_slot, valid_slot, p_flat,
                      wq_rows, cum_rows)
                cnt = cnt[0]
                if _rs_stop == "passA":
                    return _trunc(jnp.sum(cnt.astype(jnp.float32))
                                  + tc[0, 0].astype(jnp.float32))

                # --- skip table over slot space: the shared
                # resample_pallas.skip_table with slot_params, which
                # strips the per-slot key offset and stratifies the
                # searchsorted by (slot * stride) so one table serves
                # all firing filters ------------------------------------
                # Output tiles follow the PACKED plane rows (t_out =
                # np8) when the carry is packed, so pass C can fetch a
                # filter's whole plane as one block (fused merge).
                tc15t = jnp.concatenate([tc, inert_tail(n, w_b, wb2)],
                                        axis=1)
                stride = np_ + 1  # > any local slot id or boundary
                gp_w, tile_q = (r, np8) if r > 1 else (w_tiles, tile_n)
                ot = jnp.arange(cap_t * gp_w, dtype=jnp.int32)
                i0_loc = (ot % gp_w) * tile_q
                q0 = (ot // gp_w) * stride + i0_loc
                q1 = q0 + tile_q - 1
                valid_out = (ot // gp_w) < n_fire
                sb, span, need, blk_ids = skip_table(
                    cnt, tc15t, t_k, wb2, w_b, q0, q1, valid_out,
                    slot_params=(w_tiles * nw, stride, np_ + 1,
                                 _SLOT_MOD),
                    grid_params=(gp_w, tile_q, cap_t * gp_w))
                ok = ((n_fire <= cap_t) & (jnp.max(cnt) <= t_k)
                      & (jnp.max(need) <= w_b))
                if _rs_stop == "skip":
                    return _trunc(jnp.sum(span.astype(jnp.float32))
                                  + jnp.sum(sb.astype(jnp.float32))
                                  + ok.astype(jnp.float32))

                # --- pass B: skip-table expand in slot space ------------
                def kernel_path(_):
                    # Output indices carry the same slot key as the
                    # stored boundaries, so foreign-slot blocks
                    # self-mask.
                    i0_key = (((ot // gp_w) % _SLOT_MOD) * (np_ + 1)
                              + i0_loc)
                    if pass2 == "compressed":
                        from tpuslam.ops.resample_pallas import (
                            compress_blocks, expand_compressed)

                        comp = compress_blocks(tc15t, blk_ids, wb2, w_b)
                        out = expand_compressed(
                            comp, sb, span, i0_key, cap_t * np_, tile_q,
                            wb2, w_b, interpret=interpret,
                            n_alloc_pad=b * np_)
                    elif 0 < w_b_small < w_b:
                        # Two-tier window cap: most firing steps'
                        # survivor spans fit w_b_small refs/tile
                        # (measured +5% at 1024x10k with w_b=8,
                        # scripts/tpu_wide_ablate_r4.py); the rare
                        # wider span takes the full-w_b kernel via
                        # lax.cond at kernel speed instead of risking
                        # the ~280 ms all-filter XLA fallback.
                        n_blk_t = cnt.shape[0] * nw + w_b
                        le_t = sb + span - 1
                        sb_s = jnp.minimum(sb, n_blk_t - w_b_small)
                        span_s = jnp.clip(le_t - sb_s + 1, 1,
                                          w_b_small)

                        def exp_small(_):
                            return expand_compacted(
                                tc15t, sb_s, span_s, blk_ids, i0_key,
                                cap_t * np_, tile_q, wb2, w_b_small,
                                interpret=interpret,
                                n_alloc_pad=b * np_)

                        def exp_full(_):
                            return expand_compacted(
                                tc15t, sb, span, blk_ids, i0_key,
                                cap_t * np_, tile_q, wb2, w_b,
                                interpret=interpret,
                                n_alloc_pad=b * np_)

                        out = jax.lax.cond(
                            jnp.max(need) <= w_b_small, exp_small,
                            exp_full, 0)
                    else:
                        out = expand_compacted(
                            tc15t, sb, span, blk_ids, i0_key,
                            cap_t * np_, tile_q, wb2, w_b,
                            interpret=interpret, n_alloc_pad=b * np_)
                    if r > 1:
                        out = out.reshape(3, b * r, np8)  # free bitcast
                    return out, jnp.clip(pos, 0, b - 1)

                return jax.lax.cond(ok, kernel_path, xla_slots, 0)
            return go

        # Tiered dispatch: the typical burst fits cap_small and pays
        # O(cap_small * N); moderate bursts take a 2x middle tier; the
        # rare large burst (firing is correlated across filters) takes
        # the full-cap tier.  Measured at the 1024x10k default gate:
        # p50 burst 214, p90 289, max 845 - 17/95 firing steps exceed
        # cap_small=256 but only 2/95 exceed 512, so the middle tier
        # halves the tail cost (~1.9 ms/step).  All branches close over
        # CARRIED scan state only (particles / log_w / lse), which this
        # platform's lax.cond handles at full speed (CLAUDE.md: conds
        # over carried state are free; conds over large scan-invariant
        # captures are not).
        cap_mid = min(cap, 2 * cap_small)
        if cap_small < cap_mid < cap:
            def upper(a):
                return jax.lax.cond(n_fire <= cap_mid,
                                    fire_tier(cap_mid),
                                    fire_tier(cap), a)

            return jax.lax.cond(n_fire <= cap_small,
                                fire_tier(cap_small), upper, 0)
        if cap_small < cap:
            return jax.lax.cond(n_fire <= cap_small,
                                fire_tier(cap_small),
                                fire_tier(cap), 0)
        return fire_tier(cap)(0)

    flag = jnp.where(bad & ~fire, 1.0, 0.0)
    fire_arr = fire.astype(jnp.float32)
    seed_arr = jnp.asarray([seed], jnp.int32)

    # --- pass C: predict + weight + stats ------------------------------
    # Chunked grid: each cell covers G consecutive resample tiles (up
    # to ~8k particles) - the ~0.5 us per-cell fixed cost dominated the
    # old one-tile-per-cell grid (10240 cells ~ 5 ms/step at 1024x10k).
    g_tiles = 1
    for d in range(w_tiles, 0, -1):
        if w_tiles % d == 0 and d * tile_n <= 8192:
            g_tiles = d
            break
    c_cells = w_tiles // g_tiles
    c8 = g_tiles * t8
    out_shape = (
        jax.ShapeDtypeStruct((3 * r, b * np8), jnp.float32),
        jax.ShapeDtypeStruct((r, b * np8), jnp.float32),
        jax.ShapeDtypeStruct((1, 8 * b * c_cells), jnp.float32),
    )

    def run_stats(fire_in=None):
        """Pass C; with ``fire_in=(expanded, src)`` the resample merge
        happens in-kernel (fused) instead of via XLA glue."""
        kfn = functools.partial(
            _wide_stats_kernel, cfg=cfg, noise_on=noise_on,
            c_cells=c_cells, np8=np8, sub_rows=r,
            fused=fire_in is not None)
        if fire_in is None:
            return pl.pallas_call(
                kfn,
                grid=(b, c_cells),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 128), lambda f, g: (0, f),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((3 * r, c8),
                                 lambda f, g: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, c8),
                                 lambda f, g: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=out_shape,
                out_specs=(
                    pl.BlockSpec((3 * r, c8),
                                 lambda f, g: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, c8),
                                 lambda f, g: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ),
                input_output_aliases={3: 0, 4: 1},
                interpret=interpret,
            )(seed_arr, flag, z_rows, state.particles, state.log_w)
        expanded, src = fire_in
        if r > 1:
            exp_spec = pl.BlockSpec(
                (3, r, c8), lambda f, g, src: (0, src[f], g),
                memory_space=pltpu.VMEM)
        else:
            exp_spec = pl.BlockSpec(
                (3, c8), lambda f, g, src: (0, src[f] * c_cells + g),
                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kfn,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, c_cells),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 128), lambda f, g, src: (0, f),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((3 * r, c8),
                                 lambda f, g, src: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, c8),
                                 lambda f, g, src: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                    exp_spec,
                ],
                out_specs=(
                    pl.BlockSpec((3 * r, c8),
                                 lambda f, g, src: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, c8),
                                 lambda f, g, src: (0, f * c_cells + g),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ),
            ),
            out_shape=out_shape,
            input_output_aliases={5: 0, 6: 1},
            interpret=interpret,
        )(src, seed_arr, flag, fire_arr, z_rows, state.particles,
          state.log_w, expanded)

    def with_resample(_):
        expanded, src = fire_path(0)
        return run_stats((expanded, src))

    def without_resample(_):
        return run_stats()

    p_out, lw_out, st = jax.lax.cond(n_fire > 0, with_resample,
                                     without_resample, 0)

    st = _combine_wide_stats(st, b, c_cells)
    lse, lse2 = st[:, 0], st[:, 1]
    x_est = st[:, 2:5]
    out = PfBatchOut(x_true=x_true, x_est=x_est, ess=ess, lse=lse,
                     resampled=fire, bad=bad)
    return PfBatchWideState(x_true=x_true, particles=p_out,
                            log_w=lw_out, lse=lse, lse2=lse2,
                            x_est=x_est), out


def pf_batch_wide_rollout(cfg: PfConfig, key, batch: int, n_steps: int,
                          tile_n: int = 1024, noise_on: bool = True,
                          interpret: bool = False,
                          fire_cap: int | None = None, w_b: int = 12,
                          fire_cap_small: int | None = None,
                          sub_rows: int | None = None, seed0=1,
                          t_k: int | None = None,
                          pass2: str = "windowed",
                          pass_a: str = "flat", w_b_small: int = 8,
                          _rs_stop: str = ""):
    """``n_steps`` wide batched steps under ``lax.scan``.

    ``sub_rows=None`` auto-packs pass C into 8 vreg-sublane planes per
    filter whenever the tile splits evenly (tile_n >= 1024); the
    resample passes keep the flat order via one XLA transpose inside
    the gated firing branch."""
    if sub_rows is None:
        sub_rows = 8 if tile_n % (8 * 128) == 0 else 1
    state0 = pf_batch_wide_init(cfg, batch, tile_n, sub_rows=sub_rows)
    keys = jax.random.split(key, n_steps)
    # Per-step seed stride >= the per-step grid-cell count, or the
    # per-(filter, tile) on-core PRNG streams of consecutive steps
    # overlap and "independent" filters share noise bit-for-bit.
    w_tiles, _ = _wide_dims(cfg, tile_n)
    stride = max(7919, batch * w_tiles)

    def body(carry, k):
        st, seed = carry
        st, out = pf_batch_wide_step(cfg, st, k, seed, tile_n=tile_n,
                                     noise_on=noise_on,
                                     interpret=interpret,
                                     fire_cap=fire_cap, w_b=w_b,
                                     fire_cap_small=fire_cap_small,
                                     t_k=t_k, pass2=pass2,
                                     pass_a=pass_a,
                                     w_b_small=w_b_small,
                                     _rs_stop=_rs_stop)
        return (st, seed + stride), out

    (final, _), outs = jax.lax.scan(
        body, (state0, jnp.asarray(seed0, jnp.int32)), keys)
    return final, outs
