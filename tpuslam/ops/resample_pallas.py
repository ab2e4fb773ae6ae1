"""Systematic resampling as a two-pass Pallas TPU merge kernel.

The XLA path for the PF's systematic resample (particle_filter.py:200-224
in the reference; ``filters/pf.py::resample_indices(method="hist")`` here)
is floor-bound by gather/scatter: on a v5e, any 1M-index scatter costs
~5 ms, the index-decode cummax ~3 ms, and the (3, N) particle gather
~5 ms regardless of unique/sorted flags (scripts/tpu_resample_micro*.py),
so a 1M-particle resample pays ~14 ms while the fused PF step kernel
itself costs ~1.2 ms.

Both sides of the resample are SORTED - the slot boundaries
``t_j = ceil(N*cum_j - offs)`` are non-decreasing in j, and the output
slots are the ascending comb - so the index map is a merge, not a random
gather, and a merge has block-local structure a Pallas kernel can
exploit where XLA's scatter/gather lowering cannot:

  pass 1 (block compaction)  Each input tile pulls its survivors
      (particles with slot count ``c_j = t_j - t_{j-1} > 0``) to the
      front of a fixed ``t_k``-lane output block with a one-hot
      selection matmul (lane permutation on TPU *is* a matmul).
      Unused block lanes are filled with the tile's RUNNING boundary
      (``t`` at the tile's last lane) and zero values, which makes them
      cover an empty slot interval - inert by construction, and exactly
      the boundary the next real survivor needs on its left.  All
      offsets static: no DMA, no alignment constraints.

  pass 2 (expansion)   In block-compacted space the boundary row is
      still non-decreasing, so the survivors feeding one output tile
      live in a short contiguous run of 128-lane window blocks found by
      a tiny searchsorted over the tile corners.  A 2D grid walks
      ``w_b`` window blocks per output tile (input block index comes
      from a scalar-prefetch map, so Pallas pipelines the loads), each
      expanded with a boundary-interval one-hot matmul accumulated into
      the revisited output block; blocks past the needed span are
      skipped with ``pl.when``.

EXACTNESS AND COST.  The MXU pads the value-rows dimension of these
one-hot matmuls to 128 sublanes, so stacking more value rows is free -
and f32 matmul precision is NOT: on v5e, ``Precision.HIGHEST`` runs ~6
bf16 passes (measured ~6x DEFAULT).  Instead every f32 value row is
carried as THREE bf16 rows (hi/mid/lo Veltkamp-style splits: 8 mantissa
bits each, residuals exactly representable, ``hi+mid+lo == x`` in f32).
One DEFAULT-precision bf16 matmul then reproduces values BIT-EXACTLY:
each split row is selected by a 0/1 one-hot (products exact, true-zero
padding), and the f32 accumulator reassembles the splits exactly.
Selection is bit-identical to ``resample_indices(method="hist")``: both
decode the same slot-boundary tensor ``t`` (computed once, in XLA,
including the reference's trailing ``clip(idx, 0, n-1)`` semantics via a
forced ``t[n-1] = n``).

Static caps keep shapes compile-friendly: at most ``t_k`` survivors per
``t_in``-lane input tile and a ``w_b``-block survivor window per output
tile.  Both hold with large margin when the ESS gate fires (survivor
fraction well below t_k/t_in = 25%); if either fails (e.g. a
near-uniform resample with ~N survivors) the function falls back to the
XLA decode+gather path inside ``lax.cond`` - same result, old speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WB2 = 128  # pass-2 window block lanes (decoupled from pass-1's t_k)


def slot_boundaries(w_row, n: int, offs):
    """Slot-boundary tensor of the systematic comb (shared decode input).

    ``t_j = clip(ceil(n * cumsum(w)_j - offs), 0, n)`` with ``t[n-1]``
    forced to ``n``: particle j owns output slots ``[t_{j-1}, t_j)``.
    The forcing reproduces the reference's trailing ``clip(idx, 0, n-1)``
    (any slots past the last boundary select particle n-1) as plain
    interval coverage, so kernel and XLA decodes share one tensor.

    Args:
        w_row: ``(1, n_pad)`` normalized weights, padded lanes zero.
        n: valid particle count (static; must be < 2**24 so boundary
            values are exact in f32 for the kernel compares).
        offs: scalar comb offset in units of ``1/n`` (``U(0,1)`` draw).

    Returns:
        ``(1, n_pad)`` int32 non-decreasing boundaries in ``[0, n]``.
    """
    cum = jnp.cumsum(w_row.astype(jnp.float32), axis=-1)
    t = jnp.ceil(n * cum - offs).astype(jnp.int32)
    t = jnp.clip(t, 0, n)
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    return jnp.where(lane >= n - 1, n, t)


def decode_indices(t_row, n: int):
    """XLA decode of :func:`slot_boundaries` into gather indices.

    ``idx[i] = j`` with ``t_{j-1} <= i < t_j`` - the unique-scatter-set +
    running-max construction of ``filters/pf.py::resample_indices``
    (bit-identical selection), operating on the shared ``t`` tensor.
    """
    t = t_row[0, :n]
    last = jnp.concatenate([t[:-1] != t[1:], jnp.ones((1,), bool)])
    tgt = jnp.where(last, t, n)
    sparse = jnp.zeros((n,), jnp.int32).at[tgt].set(
        jnp.arange(1, n + 1, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    idx = jax.lax.associative_scan(jnp.maximum, sparse)
    return jnp.clip(idx, 0, n - 1)


def split3(x):
    """Exact 3-way bf16 split of f32: returns bf16 parts with
    ``hi + mid + lo == x`` exactly in f32 (24 = 3 x 8 mantissa bits;
    both residuals are exactly representable - bf16 shares f32's
    exponent range, so no underflow)."""
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _compact_kernel(vals_ref, g_ref, f_ref, out_ref, *, t_k: int):
    """Pass 1: one-hot-matmul block compaction (static output blocks).

    ``sel[k, j] = (j survives) & (local rank of j == k)``;
    ``vals @ sel^T`` pulls the tile's ``cnt <= t_k`` survivors (12 bf16
    split rows: x/y/yaw/boundary x hi/mid/lo) to the block's leading
    columns.  Trailing columns: values exact zero (empty sel), boundary
    = the tile's running boundary, so they cover an empty interval and
    hand the correct left boundary to the next block's first survivor.
    """
    t_in = g_ref.shape[1]
    base = g_ref[0, 0]
    cnt = g_ref[0, t_in - 1] + f_ref[0, t_in - 1] - base
    k_local = g_ref[0:1, :] - base  # (1, t_in) int32
    krow = jax.lax.broadcasted_iota(jnp.int32, (t_k, t_in), 0)
    sel = ((krow == k_local) & (f_ref[0:1, :] > 0)).astype(jnp.bfloat16)
    compact = jax.lax.dot_general(
        vals_ref[:, :], sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (12, t_k) f32, exact
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, t_k), 1)
    live = kcol < cnt
    # Garbage lanes replicate the tile's LAST input lane: the boundary
    # split rows (3/7/11) get the running boundary (empty interval, and
    # the correct left edge for the next block's first survivor); the
    # value rows get a finite don't-care (their M column is all-zero).
    out_ref[:, :] = jnp.where(live, compact.astype(jnp.bfloat16),
                              vals_ref[:, t_in - 1:t_in])


def _expand_kernel(sb_ref, span_ref, tc_ref, out_ref, carry, *,
                   t_out: int, wb2: int):
    """Pass 2: windowed run-length expansion, one window block per step.

    Window lane u (block-compacted lane ``(sb[b]+w)*128 + u``) covers
    output slots ``[t'[u-1], t'[u])``; ``M[i, u]`` selects it for slot
    ``i`` and ``vals @ M^T`` accumulates into the revisited output
    block (split rows recombined exactly in f32).  The left boundary of
    lane 0 crosses window blocks via the SMEM ``carry`` (+inf at w=0:
    lane 0 of the first window block is boundary-only by construction
    of ``sb``).  Inert lanes (garbage fills, survivors left of the
    window's first feeder) self-mask: their intervals are empty or end
    at/before the tile's first slot.
    """
    b = pl.program_id(0)
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _reset():
        carry[0] = jnp.inf
        out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(w < span_ref[b])
    def _accumulate():
        tw = (tc_ref[3:4, :].astype(jnp.float32)
              + tc_ref[7:8, :].astype(jnp.float32)
              + tc_ref[11:12, :].astype(jnp.float32))  # (1, wb2) exact
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, wb2), 1)
        t_lo = jnp.where(lane == 0, carry[0], pltpu.roll(tw, 1, 1))
        i = (jax.lax.broadcasted_iota(jnp.int32, (t_out, wb2), 0)
             + b * t_out).astype(jnp.float32)
        m = ((i >= t_lo) & (i < tw)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            tc_ref[:, :], m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (12, t_out) f32
        out_ref[:, :] += part[0:3, :] + part[4:7, :] + part[8:11, :]
        carry[0] = tw[0, wb2 - 1]


def _pick_tile(n_pad: int, want: int) -> int:
    t = min(want, n_pad)
    while n_pad % t:
        t //= 2
    if t < 8:
        raise ValueError(f"n_pad={n_pad} has no usable tile divisor")
    return t


@functools.partial(jax.jit, static_argnames=("n", "t_in", "t_k", "t_out",
                                             "w_b", "interpret"))
def merge_resample_rows(key, p_rows, w_row, n: int, t_in: int = 1024,
                        t_k: int = 256, t_out: int = 2048, w_b: int = 4,
                        interpret: bool = False):
    """Systematic resample of row-major particles, merge-kernel fast path.

    Drop-in replacement for the ``hist``-method index build + gather on
    the fused layout: same key consumption (one ``uniform`` draw), same
    selection, bit-exact values, zero padding lanes on output.

    Args:
        key: PRNG key for the comb offset (matches
            ``resample_indices``'s single ``uniform(key)`` draw).
        p_rows: ``(3, n_pad)`` particle rows (kernel layout).
        w_row: ``(1, n_pad)`` normalized weights, padded lanes zero.
        n: valid particle count; ``n < 2**24`` (f32-exact boundaries).
        t_in / t_k: input tile lanes / survivor block lanes (pass-1
            static cap: at most ``t_k`` survivors per ``t_in`` inputs;
            both multiples of 128 at production sizes).
        t_out / w_b: output tile lanes / 128-lane window blocks per
            output tile (pass-2 static cap on the survivor span).
        interpret: run kernels in interpret mode (CPU tests).

    Returns:
        ``(3, n_pad)`` resampled particles, padding lanes zero.
    """
    if n >= 1 << 24:
        raise ValueError("merge resample requires n < 2**24 (f32-exact "
                         f"slot boundaries); got {n}")
    n_pad = p_rows.shape[1]
    t_in = _pick_tile(n_pad, t_in)
    t_k = min(t_k, t_in)
    t_out = _pick_tile(n_pad, t_out)
    wb2 = min(_WB2, t_k)  # pass-2 window block lanes

    offs = jax.random.uniform(key, dtype=jnp.float32)
    t_row = slot_boundaries(w_row, n, offs)

    # Survivor flags / global exclusive ranks (cheap XLA row passes).
    tprev = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), t_row[:, :-1]], axis=-1)
    f_row = (t_row > tprev).astype(jnp.int32)
    g_row = jnp.cumsum(f_row, axis=-1) - f_row  # exclusive rank

    nt_in = n_pad // t_in
    cnt = f_row[0].reshape(nt_in, t_in).sum(axis=-1)
    ok_compact = jnp.max(cnt) <= t_k

    def xla_path(_):
        idx = decode_indices(t_row, n)
        return jnp.zeros_like(p_rows).at[:, :n].set(p_rows[:, :n][:, idx])

    def kernel_path(_):
        # 12 bf16 rows, grouped by split level: [x y yaw t]_hi, _mid, _lo.
        hml = split3(jnp.concatenate(
            [p_rows.astype(jnp.float32), t_row.astype(jnp.float32)],
            axis=0))
        vals12 = jnp.concatenate(hml, axis=0)
        row_in = lambda b: (0, b)  # noqa: E731
        bc = pl.pallas_call(
            functools.partial(_compact_kernel, t_k=t_k),
            grid=(nt_in,),
            in_specs=[
                pl.BlockSpec((12, t_in), row_in,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t_in), row_in, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t_in), row_in, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((12, t_k), row_in,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12, nt_in * t_k),
                                           jnp.bfloat16),
            interpret=interpret,
        )(vals12, g_row, f_row)

        # Sentinel block (boundary 0) in front - the first global
        # survivor's left boundary - and w_b inert trailing blocks
        # (boundary n, values 0) so clamped windows stay in range.
        lead = jnp.zeros((12, wb2), jnp.bfloat16)
        nh, nm, nl = split3(jnp.float32(n))
        tail = jnp.zeros((12, w_b * wb2), jnp.bfloat16)
        for r, v in ((3, nh), (7, nm), (11, nl)):
            tail = tail.at[r].set(v)
        tc12 = jnp.concatenate([lead, bc, tail], axis=1)
        n_blocks = tc12.shape[1] // wb2

        # Per-output-tile windows: searchsorted over tile corners (few
        # queries - ~linear in query count) on the still-sorted
        # block-compacted boundary row.  Garbage lanes duplicate their
        # survivor's boundary; side="right" lands on the survivor.
        nt_out = n_pad // t_out
        tc1 = (tc12[3].astype(jnp.float32)
               + tc12[7].astype(jnp.float32)
               + tc12[11].astype(jnp.float32))
        i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
        i_last = jnp.minimum(i0 + t_out, n) - 1
        lv = jnp.searchsorted(tc1, i0.astype(jnp.float32),
                              side="right").astype(jnp.int32)
        le = jnp.searchsorted(tc1, i_last.astype(jnp.float32),
                              side="right").astype(jnp.int32)
        sb = jnp.clip((lv - 1) // wb2, 0, n_blocks - w_b)
        span = jnp.clip(le // wb2 - sb + 1, 1, w_b)
        need = jnp.where(i0 < n, le // wb2 - (lv - 1) // wb2 + 1, 1)
        ok_window = jnp.max(need) <= w_b

        def expand(_):
            out = pl.pallas_call(
                functools.partial(_expand_kernel, t_out=t_out,
                                  wb2=wb2),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(nt_out, w_b),
                    in_specs=[pl.BlockSpec(
                        (12, wb2),
                        lambda b, w, sb, span: (0, sb[b] + w),
                        memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(
                        (3, t_out), lambda b, w, sb, span: (0, b),
                        memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
                interpret=interpret,
            )(sb, span, tc12)
            return out.astype(p_rows.dtype)

        return jax.lax.cond(ok_window, expand, xla_path, 0)

    return jax.lax.cond(ok_compact, kernel_path, xla_path, 0)
