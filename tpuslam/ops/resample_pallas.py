"""Systematic resampling as a two-pass Pallas TPU merge kernel.

The XLA path for the PF's systematic resample (particle_filter.py:200-224
in the reference; ``filters/pf.py::resample_indices(method="hist")`` here)
is floor-bound by gather/scatter: on a v5e, the boundary decode
(scatter + cummax) costs ~7.5 ms and the (3, N) particle gather ~5-12 ms
at N=1M regardless of unique/sorted flags (scripts/tpu_resample_micro*.py),
while the fused PF step kernel itself costs ~1.2 ms.

Both sides of the resample are SORTED - the slot boundaries
``t_j = ceil(N*cum_j - offs)`` are non-decreasing in j, and the output
slots are the ascending comb - so the index map is a merge, not a random
gather, and a merge has block-local structure a Pallas kernel can
exploit where XLA's scatter/gather lowering cannot:

  pass 1 (block compaction)  Each input tile pulls its survivors
      (particles with slot count ``c_j = t_j - t_{j-1} > 0``) to the
      front of a fixed ``t_k``-lane output block with a one-hot
      selection matmul (lane permutation on TPU *is* a matmul).  Each
      compacted lane carries its particle values AND its full slot
      interval ``[t_{j-1}, t_j)`` - the left boundary is compacted as
      ordinary value rows, so every lane self-describes its interval
      and pass 2 needs no cross-lane or cross-block boundary chaining.
      Unused block lanes are filled with empty intervals (left = right
      = the tile's running boundary) and zero values - inert by
      construction.  All offsets static: no DMA, no alignment
      constraints.

  pass 2 (expansion)   In block-compacted space the boundary rows are
      still non-decreasing, so the survivors feeding one output tile
      live in a short contiguous run of 128-lane window blocks.  The
      walk runs over a SKIP TABLE: the per-tile survivor counts (known
      in XLA from one cheap reduction) give each window block's
      occupancy, empty blocks are compressed away, and a searchsorted
      over the ~nt_in compressed block-end boundaries finds each output
      tile's feeder run - so the walked space is near-dense (the only
      dilution is the garbage tail of each tile's last partial block).
      A 2D grid walks ``w_b`` compressed blocks per output tile (block
      index from a scalar-prefetch map, so Pallas pipelines the loads);
      each visited block is expanded with a slot-interval one-hot
      matmul ``vals @ M`` accumulated into the revisited output block,
      where ``M[u, i] = (t_lo_u <= i < t_hi_u)`` is built directly in
      MXU-feed orientation (K=lanes, N=slots; no transpose, no carry,
      no roll - every lane's interval is local).  Blocks past the
      needed span are skipped with ``pl.when``.

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
``t_in``-lane input tile and a ``w_b``-compressed-block survivor window
per output tile.  Both hold with large margin when the ESS gate fires
(measured production profile at 1M particles: 4-8% survivors, max ~116
per 1024-lane tile - scripts/tpu_pf_survivors.py); if either fails
(e.g. a near-uniform resample with ~N survivors) the function falls
back to the XLA decode+gather path inside ``lax.cond`` - same result,
old speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WB2 = 128  # pass-2 window block lanes (decoupled from pass-1's t_k)

# Row layout of the compacted value stack: 5 variables (x, y, yaw,
# t_hi=right boundary, t_lo=left boundary) x 3 bf16 split rows each,
# variable-major: rows [3v, 3v+1, 3v+2] are variable v's hi/mid/lo.
_NV = 5
_ROWS = 3 * _NV


def slot_boundaries(w_row, n: int, offs):
    """Slot-boundary tensor of the systematic comb (shared decode input).

    ``t_j = clip(ceil(n * cum_j - offs), 0, n)`` with ``t[n-1]`` forced
    to ``n``: particle j owns output slots ``[t_{j-1}, t_j)``.  ``cum``
    is the QUANTIZED-EXACT weight cumsum
    (:func:`tpuslam.filters.pf.quantized_cum` - provably non-decreasing,
    which the interval expansion depends on; shared with the hist
    decode so selection stays bit-identical across paths).
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
    from tpuslam.filters.pf import boundary_law, quantized_cum

    cumq, q_tot = quantized_cum(w_row.astype(jnp.float32))
    t = boundary_law(cumq, 1.0 / q_tot, n, offs).astype(jnp.int32)
    t = jnp.clip(t, 0, n)
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    return jnp.where(lane >= n - 1, n, t)


def slot_boundaries_from_wq(wq_row, n: int, offs):
    """Slot boundaries from PRE-QUANTIZED integer weights.

    Same law as :func:`slot_boundaries` given the same integers: the
    cumsum of exact integers is order-independent, so a caller that
    quantized with a different (but replicated) total - e.g. the
    sharded path's psum-of-local-sums - gets boundaries bit-identical
    to any other evaluation of the same ``wq``.
    """
    from tpuslam.filters.pf import boundary_law

    cum = jnp.cumsum(wq_row, axis=-1)
    q_tot = cum[..., -1:]
    t = boundary_law(cum, 1.0 / q_tot, n, offs).astype(jnp.int32)
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
    exponent range, so no underflow).

    XLA-SIDE ONLY.  The rounding MUST go through
    ``lax.reduce_precision`` (bit-identical to the hardware f32->bf16
    RN-even convert), NOT an ``astype`` round-trip: XLA's
    excess-precision folding deletes f32->bf16->f32 convert pairs on
    TPU, which zeroes the residual rows and silently degrades every
    value carried through an XLA-side split stack to bf16 (measured on
    v5e: the unfused pass-1 stack's mid/lo rows came back all-zero and
    resampled particles were bf16-rounded - scripts/tpu_parity_probe2.py).
    ``reduce_precision`` is the barrier XLA guarantees never to fold.
    Inside Pallas kernels use :func:`split3_kernel` instead
    (``reduce_precision`` has no Mosaic lowering).
    """
    x = x.astype(jnp.float32)
    hi = jax.lax.reduce_precision(x, 8, 7)  # bf16 RN-even, in f32
    r = x - hi
    mid = jax.lax.reduce_precision(r, 8, 7)
    lo = r - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def split3_kernel(x):
    """Mosaic twin of :func:`split3` for use INSIDE Pallas kernels.

    ``reduce_precision`` has no Mosaic lowering; the ``astype``
    round-trip is safe here because Mosaic lowers each convert to the
    real hardware instruction and does not fold convert pairs (verified
    on v5e: the fused pass-1 stack carries correct nonzero mid/lo
    residual rows - scripts/tpu_parity_probe2.py - while the same
    astype form on the XLA side came back folded).  Both converts are
    RN-even, so the two functions produce bit-identical splits of the
    same input.
    """
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _compact_kernel(vals_ref, g_ref, f_ref, out_ref, *, t_k: int):
    """Pass 1: one-hot-matmul block compaction (static output blocks).

    ``sel[k, j] = (j survives) & (local rank of j == k)``;
    ``vals @ sel^T`` pulls the tile's ``cnt <= t_k`` survivors (15 bf16
    split rows: x/y/yaw/t_hi/t_lo x hi/mid/lo) to the block's leading
    columns.  Trailing columns get an INERT fill: values from the
    tile's last input lane (don't-care - their sel column is all-zero,
    so the matmul wrote exact zeros; the fill only overwrites those
    zeros), and an EMPTY slot interval - both boundary variables (rows
    9-14) set to the tile's running right boundary, which also keeps
    the block-end boundary row correct for the skip table.
    """
    t_in = g_ref.shape[1]
    base = g_ref[0, 0]
    cnt = g_ref[0, t_in - 1] + f_ref[0, t_in - 1] - base
    k_local = g_ref[0:1, :] - base  # (1, t_in) int32
    krow = jax.lax.broadcasted_iota(jnp.int32, (t_k, t_in), 0)
    sel = ((krow == k_local) & (f_ref[0:1, :] > 0)).astype(jnp.bfloat16)
    compact = jax.lax.dot_general(
        vals_ref[:, :], sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (15, t_k) f32, exact
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, t_k), 1)
    live = kcol < cnt
    # Inert fill: last input lane's rows, with the t_lo split rows
    # (12-14) replaced by the t_hi split rows (9-11) so garbage
    # intervals are empty ([t_run, t_run)).
    f = vals_ref[:, t_in - 1:t_in]  # (15, 1)
    fill = jnp.concatenate([f[0:12], f[9:12]], axis=0)
    out_ref[:, :] = jnp.where(live, compact.astype(jnp.bfloat16), fill)


def _expand_kernel(sb_ref, span_ref, blk_ref, i0_ref, *refs,
                   t_out: int, wb2: int, w_b: int):
    """Pass 2: windowed run-length expansion, ALL windows in one step.

    Window lane u covers output slots ``[t_lo_u, t_hi_u)`` (both read
    from the block's own rows - no cross-lane chaining, no carry, no
    roll: every lane's interval is local, so the grid has no sequential
    dependency).  ``M[i, u] = (t_lo_u <= i < t_hi_u)`` selects lane u
    for slot ``i`` and ``vals @ M^T`` accumulates into the output block
    (same dot orientation as pass 1), with the bf16 split rows
    recombined exactly in f32.  Inert lanes (garbage fills, survivors
    outside the tile's slot range) self-mask: their intervals are empty
    or disjoint from the tile.

    The ``w_b`` window blocks arrive as ``w_b`` SEPARATE input refs of
    the same compacted stack (index maps ``blk[sb[b] + w]``) so one
    grid step serves the whole output tile: the previous
    ``(nt_out, w_b)`` grid paid the ~0.15 us per-cell fixed cost on
    every (tile, window) pair - ~18 ms/step of pure grid overhead at
    the wide-PF 1024x10k scale (122,880 cells, most skipped;
    scripts/tpu_wide_profile4.py stage 5) - while the accumulation
    itself only runs for ``span[b]`` windows either way.
    """
    tc_refs, out_ref = refs[:-1], refs[-1]
    b = pl.program_id(0)

    def store(v, accum=False):
        if accum:
            out_ref[:, :] += v
        else:
            out_ref[:, :] = v

    store(jnp.zeros((3, t_out), out_ref.dtype))
    span = span_ref[b]
    i = (jax.lax.broadcasted_iota(jnp.int32, (t_out, wb2), 0)
         + i0_ref[b]).astype(jnp.float32)

    for w in range(w_b):

        @pl.when(span > w)
        def _accumulate(tc_ref=tc_refs[w]):
            t_hi = (tc_ref[9:10, :].astype(jnp.float32)
                    + tc_ref[10:11, :].astype(jnp.float32)
                    + tc_ref[11:12, :].astype(jnp.float32))  # (1, wb2)
            t_lo = (tc_ref[12:13, :].astype(jnp.float32)
                    + tc_ref[13:14, :].astype(jnp.float32)
                    + tc_ref[14:15, :].astype(jnp.float32))
            m = ((i >= t_lo) & (i < t_hi)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                tc_ref[0:9, :], m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (9, t_out) f32
            # Variable-major rows: x = 0+1+2, y = 3+4+5, yaw = 6+7+8.
            store(jnp.concatenate(
                [part[3 * v:3 * v + 1] + part[3 * v + 1:3 * v + 2]
                 + part[3 * v + 2:3 * v + 3] for v in range(3)], axis=0),
                accum=True)


def compact_particles(p_rows, t_row, tprev, f_row, g_row, t_in: int,
                      t_k: int, interpret: bool = False):
    """Pass-1 call: compact survivors per input tile (see module doc).

    Returns the ``(15, (n_pad // t_in) * t_k)`` bf16 compacted stack
    (variable-major split rows ``[x y yaw t_hi t_lo] x [hi mid lo]``).
    """
    n_pad = p_rows.shape[1]
    nt_in = n_pad // t_in
    stack5 = jnp.concatenate(
        [p_rows.astype(jnp.float32), t_row.astype(jnp.float32),
         tprev.astype(jnp.float32)], axis=0)
    hml = split3(stack5)  # 3 x (5, n_pad) bf16
    vals15 = jnp.stack(hml, axis=1).reshape(_ROWS, n_pad)
    row_in = lambda b: (0, b)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_compact_kernel, t_k=t_k),
        grid=(nt_in,),
        in_specs=[
            pl.BlockSpec((_ROWS, t_in), row_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_in), row_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_in), row_in, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, t_k), row_in,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, nt_in * t_k),
                                       jnp.bfloat16),
        interpret=interpret,
    )(vals15, g_row, f_row)


def inert_tail(n: int, w_b: int, wb2: int):
    """``(15, w_b*wb2)`` bf16 tail blocks with empty interval [n, n) and
    zero values: the safe target for padded skip-table entries and
    clamped windows."""
    nh, nm, nl = split3(jnp.float32(n))
    tail = jnp.zeros((_ROWS, w_b * wb2), jnp.bfloat16)
    for r, v in ((9, nh), (10, nm), (11, nl), (12, nh), (13, nm),
                 (14, nl)):
        tail = tail.at[r].set(v)
    return tail


def skip_table(cnt, tc15, t_k: int, wb2: int, w_b: int, i0, i_last,
               valid, slot_params=None, grid_params=None):
    """Build the compressed window-block table + per-output-tile runs.

    Window-block occupancy follows from the per-tile survivor counts:
    tile j's survivors fill its t_k block front-to-back, so window w of
    tile j holds ``clip(cnt_j - w*wb2, 0, wb2)`` survivors.  Empty
    blocks are compressed away; every compacted lane self-describes its
    slot interval, so skipping needs no boundary bookkeeping.

    Args:
        cnt: ``(nt_in_total,)`` per-input-tile survivor counts, in the
            same tile order as ``tc15``'s blocks.
        tc15: compacted stack WITH the inert tail appended.
        i0 / i_last: per-output-tile first / last global slot indices.
            With ``slot_params`` they are int32 keys in the caller's
            ``slot * stride + local_slot`` space instead.
        valid: per-output-tile bool - False for all-padding tiles
            (their ``need`` is forced to 1).
        slot_params: ``None`` for the single-filter path.  The wide
            batched-PF kernel (one boundary table serving many firing
            filters) passes ``(blocks_per_slot, stride, key_spacing,
            key_mod)``: stored boundaries carry a per-slot
            ``(slot % key_mod) * key_spacing`` offset which is stripped
            and replaced by the globally-sorted ``slot * stride`` key
            (int32 - exact past the f32 2^24 bound at large
            ``cap * np_``).
        grid_params: optional ``(w_tiles, tile_q, n_out)`` declaring
            the query arrays REGULAR: ``i0[i] = (i // w_tiles) * stride
            + (i % w_tiles) * tile_q`` and ``i_last = i0 + tile_q - 1``
            for ``i < n_out`` (requires ``slot_params``).  Then each
            key's rank among the queries has a CLOSED FORM, so the two
            ``searchsorted`` calls (linear in queries - ~2.8 ms at the
            wide-PF 1024x10k scale's 10,240 output tiles) collapse to
            per-key O(1) arithmetic + two small histogram scatter-adds,
            bit-identical to ``side="right"`` on the (sorted) keys.

    Returns:
        ``(sb, span, need, blk_ids)``: per-tile start index into
        ``blk_ids``, clipped span, unclipped need (for the fallback
        predicate), and the compressed block-id table.
    """
    nt_in = cnt.shape[0]
    nw = t_k // wb2
    n_comp_max = nt_in * nw  # total compacted window blocks
    n_blk = n_comp_max + w_b  # + padded entries -> first tail block
    occ_ne = (cnt[:, None]
              > jnp.arange(nw, dtype=cnt.dtype)[None, :] * wb2)
    nonempty = occ_ne.reshape(-1).astype(jnp.int32)  # ordered (j, w)
    pos = jnp.cumsum(nonempty) - nonempty  # exclusive rank
    tgt = jnp.where(nonempty > 0, pos, n_blk)  # drop empties
    blk_ids = jnp.full((n_blk,), n_comp_max, jnp.int32).at[tgt].set(
        jnp.arange(n_comp_max, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    # Block-end boundaries of the compressed blocks (exact ints in f32;
    # padded entries land in the tail, keeping the row non-decreasing).
    tc_hi = (tc15[9].astype(jnp.float32) + tc15[10].astype(jnp.float32)
             + tc15[11].astype(jnp.float32))
    tb_last = tc_hi[(blk_ids + 1) * wb2 - 1]  # (n_blk,)
    if slot_params is None:
        bkey = tb_last
        q0 = i0.astype(jnp.float32)
        q1 = i_last.astype(jnp.float32)
    else:
        blocks_per_slot, stride, key_spacing, key_mod = slot_params
        blk_slot = blk_ids // blocks_per_slot
        koff = jnp.where(blk_ids < n_comp_max,
                         (blk_slot % key_mod) * key_spacing, 0)
        bkey = blk_slot * stride + tb_last.astype(jnp.int32) - koff
        q0, q1 = i0, i_last
    if grid_params is not None:
        # #keys <= q (= searchsorted side="right" on the sorted keys)
        # via the duality rank[i] = #j: m_j <= i, where m_j = #queries
        # strictly below key j - O(1) per key on the regular grid.
        w_tiles_q, tile_q, n_out = grid_params
        stride = slot_params[1]

        def count_le(v):
            # #i in [0, n_out): q0[i] <= v (exact for any int32 v).
            slot = jnp.floor_divide(v, stride)
            loc = v - slot * stride
            wcnt = jnp.minimum(jnp.floor_divide(loc, tile_q) + 1,
                               w_tiles_q)
            return jnp.clip(slot * w_tiles_q + wcnt, 0, n_out)

        m0 = count_le(bkey - 1)       # #i: q0[i] <  k_j
        m1 = count_le(bkey - tile_q)  # #i: q1[i] <  k_j
        h0 = jnp.zeros((n_out + 1,), jnp.int32).at[m0].add(1)
        h1 = jnp.zeros((n_out + 1,), jnp.int32).at[m1].add(1)
        sb_raw = jnp.cumsum(h0)[:n_out]
        le = jnp.cumsum(h1)[:n_out]
    else:
        sb_raw = jnp.searchsorted(bkey, q0,
                                  side="right").astype(jnp.int32)
        le = jnp.searchsorted(bkey, q1,
                              side="right").astype(jnp.int32)
    sb = jnp.clip(sb_raw, 0, n_blk - w_b)
    span = jnp.clip(le - sb + 1, 1, w_b)
    need = jnp.where(valid, le - sb_raw + 1, 1)
    return sb, span, need, blk_ids


def expand_compacted(tc15, sb, span, blk_ids, i0, n_out_pad: int,
                     t_out: int, wb2: int, w_b: int,
                     interpret: bool = False,
                     n_alloc_pad: int | None = None):
    """Pass-2 call: expand the compacted stack into ``(3, n_out_pad)``
    f32 output slots, tile b covering ``[i0[b], i0[b] + t_out)`` in
    global slot space (slots outside every lane's interval stay 0).

    The same stack is passed ``w_b`` times so each grid step fetches
    its whole window run through per-ref index maps (see
    :func:`_expand_kernel` for why the grid has no window axis).

    When the caller picks ``t_out`` = the packed plane width (``np8``),
    tile b IS packed sublane row ``b % r`` of filter slot ``b // r``,
    so a downstream kernel can view the output as ``(3, nt, np8)``
    (free row-major reshape) and fetch a filter's whole packed plane as
    one ``(3, r, c8)`` block - the XLA take / where / re-pack glue
    between expand and the stats pass disappears (~1.2 ms/firing step
    at 1024x10k, tier-independent).

    ``n_alloc_pad`` (default ``n_out_pad``) sizes the ALLOCATED output
    past the written grid - tiers of different firing caps then share
    one output shape (unwritten blocks are garbage the caller must
    never select)."""
    nt_out = n_out_pad // t_out
    na = (n_alloc_pad if n_alloc_pad is not None else n_out_pad) // t_out

    def tc_spec(w):
        return pl.BlockSpec(
            (_ROWS, wb2),
            lambda b, sb, span, blk, i0, w=w: (0, blk[sb[b] + w]),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec(
        (3, t_out), lambda b, sb, span, blk, i0: (0, b),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((3, na * t_out), jnp.float32)

    return pl.pallas_call(
        functools.partial(_expand_kernel, t_out=t_out, wb2=wb2, w_b=w_b),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nt_out,),
            in_specs=[tc_spec(w) for w in range(w_b)],
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(sb, span, blk_ids, i0, *([tc15] * w_b))


def _expand_compressed_kernel(sb_ref, span_ref, i0_ref, tca_ref, tcb_ref,
                              out_ref, *, t_out: int, wb2: int, w_b: int):
    """Pass 2 over a pre-compressed stack: two WIDE window fetches.

    Same expansion math as :func:`_expand_kernel`, but the compacted
    stack was block-compressed in XLA first (:func:`compress_blocks`),
    so an output tile's feeder run ``[sb, sb + span)`` is CONTIGUOUS:
    two aligned ``w_b``-block super-refs (``tca`` = super ``sb // w_b``,
    ``tcb`` = the next) always cover it.  That replaces ``w_b`` separate
    ``(15, wb2)`` ref fetches per output tile (~12k small DMAs per
    firing at 2M, the pass-2 floor - scripts/tpu_pf_ablate_r4d.py) with
    two ``(15, w_b * wb2)`` fetches.  The per-block dots stay ``wb2``
    wide and gated on the run, so MXU work is unchanged; accumulation
    order over blocks is the global block order, and every output slot
    receives exactly one lane's (exactly reconstructed) value, so the
    result is bit-identical to :func:`expand_compacted`.
    """
    b = pl.program_id(0)

    def store(v, accum=False):
        if accum:
            out_ref[:, :] += v
        else:
            out_ref[:, :] = v

    store(jnp.zeros((3, t_out), out_ref.dtype))
    sb = sb_ref[b]
    span = span_ref[b]
    sup0 = (sb // w_b) * w_b  # first block id held by tca
    i = (jax.lax.broadcasted_iota(jnp.int32, (t_out, wb2), 0)
         + i0_ref[b]).astype(jnp.float32)

    for w in range(2 * w_b):
        g = sup0 + w
        ref = tca_ref if w < w_b else tcb_ref
        off = (w % w_b) * wb2

        @pl.when((g >= sb) & (g < sb + span))
        def _accumulate(ref=ref, off=off):
            t_hi = (ref[9:10, off:off + wb2].astype(jnp.float32)
                    + ref[10:11, off:off + wb2].astype(jnp.float32)
                    + ref[11:12, off:off + wb2].astype(jnp.float32))
            t_lo = (ref[12:13, off:off + wb2].astype(jnp.float32)
                    + ref[13:14, off:off + wb2].astype(jnp.float32)
                    + ref[14:15, off:off + wb2].astype(jnp.float32))
            m = ((i >= t_lo) & (i < t_hi)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                ref[0:9, off:off + wb2], m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (9, t_out) f32
            store(jnp.concatenate(
                [part[3 * v:3 * v + 1] + part[3 * v + 1:3 * v + 2]
                 + part[3 * v + 2:3 * v + 3] for v in range(3)], axis=0),
                accum=True)


def compress_blocks(tc15, blk_ids, wb2: int, w_b: int):
    """XLA block-compression of the compacted stack (one ``take``).

    Gathers the nonempty ``(15, wb2)`` window blocks (ids from
    :func:`skip_table`) to the front, padded with inert tail blocks to
    a ``w_b``-aligned length + one spare super-block so the expansion
    kernel's second wide ref never reads out of range.

    Returns the ``(15, n_cblk * wb2)`` compressed stack.
    """
    rows, lanes = tc15.shape
    n_blk = lanes // wb2
    n_comp_max = blk_ids.shape[0] - w_b  # skip_table's id-table length
    # Cover super blocks 0 .. (max sb)//w_b + 1 inclusive: max sb is
    # n_comp_max (skip_table clips to n_blk - w_b), so the last lane
    # touched is < (n_comp_max // w_b + 2) * w_b.
    n_cblk = (n_comp_max // w_b + 2) * w_b
    ids = jnp.concatenate([
        blk_ids,
        jnp.full((n_cblk - blk_ids.shape[0],), n_comp_max, jnp.int32),
    ]) if n_cblk > blk_ids.shape[0] else blk_ids[:n_cblk]
    blocks = tc15.reshape(rows, n_blk, wb2)
    return jnp.take(blocks, ids, axis=1).reshape(rows, n_cblk * wb2)


def expand_compressed(comp, sb, span, i0, n_out_pad: int, t_out: int,
                      wb2: int, w_b: int, interpret: bool = False,
                      n_alloc_pad: int | None = None):
    """Pass-2 call over a :func:`compress_blocks` stack.

    Output contract matches :func:`expand_compacted` bit-for-bit (same
    dots in the same block order); only the fetch pattern differs (two
    wide super-refs per output tile instead of ``w_b`` block refs).
    ``sb``/``span`` address COMPRESSED block ids - i.e. exactly the
    :func:`skip_table` outputs, which already live in compressed space.
    """
    nt_out = n_out_pad // t_out
    na = (n_alloc_pad if n_alloc_pad is not None else n_out_pad) // t_out
    wide = pl.BlockSpec(
        (_ROWS, w_b * wb2), lambda b, sb, span, i0: (0, sb[b] // w_b),
        memory_space=pltpu.VMEM)
    wide_next = pl.BlockSpec(
        (_ROWS, w_b * wb2),
        lambda b, sb, span, i0: (0, sb[b] // w_b + 1),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (3, t_out), lambda b, sb, span, i0: (0, b),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_expand_compressed_kernel, t_out=t_out,
                          wb2=wb2, w_b=w_b),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt_out,),
            in_specs=[wide, wide_next],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((3, na * t_out), jnp.float32),
        interpret=interpret,
    )(sb, span, i0, comp, comp)


def _hprefix_exact(parts, t_in: int):
    """Strict (exclusive) prefix of one row of exact integers.

    ``parts`` are ``(1, t_in)`` bf16 split parts whose f32 sum is the
    row - a single 0/1 flag row, or a :func:`split3_kernel` hi/mid/lo
    triple.  When ``t_in`` is a multiple of 128 the prefix runs
    hierarchically: reshape to ``(t_in//128, 128)`` sublane rows
    (row-major - bit-identical lane order), one 128-wide triangular
    matmul per split part, then a Hillis-Steele log-step prefix over
    the sublane axis (full-lane ``(s, 128)`` concats only - Mosaic
    rejects concats of scalar slices, and a lane-roll scan measured
    SLOWER than this: 10.6 vs 8.8 ms/step on the 1024x10k wide PF,
    scripts/tpu_passa_ablate.py / STATUS.md round 3).  Bit-exact vs
    the flat triangular: every partial sum of integers < 2**24 is
    exact in f32 in any order.

    Returns the ``(1, t_in)`` f32 exclusive prefix.
    """
    k = len(parts)
    if t_in % 128 == 0 and t_in > 128:
        sub = t_in // 128
        p8 = [p.reshape(sub, 128) for p in parts]
        lt = _strict_lt(128)
        exs = jax.lax.dot_general(
            jnp.concatenate(p8, axis=0), lt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (k*sub, 128)
        ex = exs[0:sub]
        for j in range(1, k):
            ex = ex + exs[j * sub:(j + 1) * sub]
        last = p8[0][:, 127:128].astype(jnp.float32)
        for j in range(1, k):
            last = last + p8[j][:, 127:128].astype(jnp.float32)
        # Inclusive row totals, replicated across lanes (f32 exact
        # integers), then the log-step prefix over the sublane axis.
        rt = jnp.broadcast_to(ex[:, 127:128] + last, (sub, 128))
        acc = rt
        s = 1
        while s < sub:
            acc = acc + jnp.concatenate(
                [jnp.zeros((s, 128), jnp.float32), acc[:sub - s]],
                axis=0)
            s *= 2
        roff = acc - rt  # exclusive row offsets (exact integer sums)
        return (ex + roff).reshape(1, t_in)
    lt = _strict_lt(t_in)
    exs = jax.lax.dot_general(
        jnp.concatenate(parts, axis=0), lt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ex = exs[0:1]
    for j in range(1, k):
        ex = ex + exs[j:j + 1]
    return ex


def _strict_lt(t_in: int, dtype=jnp.bfloat16):
    """(t_in, t_in) strict lower-triangular ones: M[r, c] = (r < c)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (t_in, t_in), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (t_in, t_in), 1)
    return (r < c).astype(dtype)


def tile_boundary_compact(wq, p3, base, inv_tot, offs, lane0, n: int,
                          t_k: int, key_offset=None, cum_in=None,
                          krow=None):
    """Shared tile body: boundaries from an exact prefix + compaction.

    Pure function of in-kernel values (usable from any grid layout - the
    single-filter pass 1 and the batched wide kernel share it).

    Args:
        wq: ``(1, t_in)`` exact integer quantized weights.
        p3: ``(3, t_in)`` particle rows.
        base: scalar exclusive integer prefix of all earlier tiles
            (within this tile's filter).
        inv_tot: XLA-computed reciprocal of the filter's exact total
            (see :func:`tpuslam.filters.pf.boundary_law` - the kernel
            must NOT divide; it multiplies by this shared scalar).
        offs: the filter's comb offset.
        lane0: first global (within-filter) lane id of this tile.
        n: the filter's valid particle count.
        key_offset: optional scalar added to the STORED boundary rows
            (after clipping/forcing).  Multi-filter callers (the wide
            batched kernel) pass a per-filter slot key so a pass-2
            window that strays into a NEIGHBORING filter's blocks
            self-masks: without it, a foreign block's LOCAL intervals
            can overlap this filter's local output slots and its
            particles get silently SUMMED in (the expand kernel has no
            other notion of block ownership).  The offset must keep
            ``key_offset + n`` exactly representable in f32 and is a
            common shift of ``t_lo``/``t_hi`` - survivor flags and
            counts are unaffected.  ``None`` = 0 (single-filter paths).
        cum_in: optional ``(1, t_in)`` INCLUSIVE prefix of the filter's
            quantized weights at this tile's lanes, precomputed in XLA
            (``jnp.cumsum`` of exact integers totalling < 2^24 is exact
            in any order, so it bit-matches the in-kernel build).
            Skips the in-kernel prefix entirely; ``base`` is ignored.
        krow: optional ``(t_k, t_in)`` f32 iota over the one-hot row
            axis, hoisted by callers whose cells unroll several tiles
            (tile-invariant - rebuilding it per tile is pure waste).

    Returns:
        ``(out_block (15, t_k) bf16, cnt scalar f32)``.
    """
    t_in = wq.shape[1]
    if cum_in is None:
        wh, wm, wl = split3_kernel(wq)
        cum_ex = _hprefix_exact([wh, wm, wl], t_in) + base
        cum_in = cum_ex + wq  # inclusive prefix, exact
    else:
        cum_ex = cum_in - wq  # exact: both are integers < 2^24

    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, t_in), 1) + lane0)
    nf = jnp.float32(n)

    def bound(cum, force_ge):
        from tpuslam.filters.pf import boundary_law

        t = boundary_law(cum, inv_tot, nf, offs)
        t = jnp.clip(t, 0.0, nf)
        return jnp.where(lane >= force_ge, nf, t)

    t_hi = bound(cum_in, n - 1)  # slot_boundaries forcing: t[n-1] = n
    t_lo = bound(cum_ex, n)  # previous lane's t_hi, incl. its forcing

    f = (t_hi > t_lo).astype(jnp.float32)  # (1, t_in) 0/1
    if key_offset is not None:
        t_hi = t_hi + key_offset
        t_lo = t_lo + key_offset
    rank = _hprefix_exact([f.astype(jnp.bfloat16)],
                          t_in)  # exclusive survivor rank
    cnt = rank[0, t_in - 1] + f[0, t_in - 1]

    if krow is None:
        # Mosaic's iota is integer-only; cast after.
        krow = (jax.lax.broadcasted_iota(jnp.int32, (t_k, t_in), 0)
                .astype(jnp.float32))
    # Fold the survivor flag into the rank (-1 never matches a row),
    # saving one (t_k, t_in) AND per tile.
    rank_m = jnp.where(f > 0, rank, jnp.float32(-1.0))
    sel = (krow == rank_m).astype(jnp.bfloat16)

    # Value stack built in-kernel: [x y yaw t_hi t_lo] x [hi mid lo].
    stack5 = jnp.concatenate([p3, t_hi, t_lo], axis=0)
    hml = split3_kernel(stack5)  # 3 x (5, t_in) bf16
    vals = jnp.stack(hml, axis=1).reshape(_ROWS, t_in)
    compact = jax.lax.dot_general(
        vals, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (15, t_k) f32, exact
    kcol = (jax.lax.broadcasted_iota(jnp.int32, (1, t_k), 1)
            .astype(jnp.float32))
    live = kcol < cnt
    fill_src = vals[:, t_in - 1:t_in]  # (15, 1) last input lane
    fill = jnp.concatenate([fill_src[0:12], fill_src[9:12]], axis=0)
    return jnp.where(live, compact.astype(jnp.bfloat16), fill), cnt


def _hprefix_exact_seg(parts):
    """Segment-shaped twin of :func:`_hprefix_exact`'s hierarchical
    branch: ``parts`` are ``(S, 128)`` exact-integer split parts in
    row-major flat order; returns the ``(S, 128)`` f32 exclusive prefix.

    Identical op sequence (per-128-lane triangular matmul + log-step
    sublane prefix) minus the ``(1, S*128) <-> (S, 128)`` reshapes,
    which cost ~0.2 us each as in-kernel relayout shuffles (CLAUDE.md)
    - the dominant cost of the flat pass-1 boundary build at 2M
    (scripts/tpu_pf_ablate_r4d.py: boundary-only 1.7 ms/call).
    Bit-exact: every partial sum of integers < 2**24 is exact in f32 in
    any order.
    """
    k = len(parts)
    s_rows = parts[0].shape[0]
    lt = _strict_lt(128)
    exs = jax.lax.dot_general(
        jnp.concatenate(parts, axis=0), lt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (k*S, 128)
    ex = exs[0:s_rows]
    for j in range(1, k):
        ex = ex + exs[j * s_rows:(j + 1) * s_rows]
    last = parts[0][:, 127:128].astype(jnp.float32)
    for j in range(1, k):
        last = last + parts[j][:, 127:128].astype(jnp.float32)
    rt = jnp.broadcast_to(ex[:, 127:128] + last, (s_rows, 128))
    acc = rt
    s = 1
    while s < s_rows:
        acc = acc + jnp.concatenate(
            [jnp.zeros((s, 128), jnp.float32), acc[:s_rows - s]],
            axis=0)
        s *= 2
    return ex + (acc - rt)


def tile_boundary_compact_seg(wq, p3, base, inv_tot, offs, lane0, n: int,
                              t_k: int, key_offset=None, cum_in=None,
                              krow=None):
    """Segment-packed twin of :func:`tile_boundary_compact`.

    Same math per flat lane ``j = s * 128 + l`` - the boundary law,
    clip/forcing, survivor flag, and exact-integer prefixes are
    elementwise or order-exact, so selection and values are
    bit-identical to the flat form - but every operand is ``(S, 128)``
    (``S = t_in // 128`` sublane segments): full f32 vreg occupancy
    (the flat ``(1, t_in)`` rows ran at 1/8) and ZERO in-kernel
    relayouts (inputs arrive as free XLA bitcast reshapes).  The
    compaction matmul runs as ``S`` per-segment ``(15, 128) @
    (128, t_k)`` one-hot dots accumulated in f32: ranks are globally
    unique one-hots, so every output element receives exactly one
    nonzero product and the segmented sum is exact in any order.

    Args:
        wq: ``(S, 128)`` exact integer quantized weights.
        p3: tuple of three ``(S, 128)`` particle planes (x, y, yaw).
        krow: optional hoisted ``(t_k, 128)`` f32 iota (dim 0).
        Everything else as :func:`tile_boundary_compact`.

    Returns:
        ``(out_block (15, t_k) bf16, cnt scalar f32)``.
    """
    from tpuslam.filters.pf import boundary_law

    s_rows = wq.shape[0]
    if cum_in is None:
        wh, wm, wl = split3_kernel(wq)
        cum_ex = _hprefix_exact_seg([wh, wm, wl]) + base
        cum_in = cum_ex + wq  # inclusive prefix, exact
    else:
        cum_ex = cum_in - wq  # exact: both are integers < 2^24

    lane = (jax.lax.broadcasted_iota(jnp.int32, (s_rows, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (s_rows, 128), 1)
            + lane0)
    nf = jnp.float32(n)

    def bound(cum, force_ge):
        t = boundary_law(cum, inv_tot, nf, offs)
        t = jnp.clip(t, 0.0, nf)
        return jnp.where(lane >= force_ge, nf, t)

    t_hi = bound(cum_in, n - 1)  # slot_boundaries forcing: t[n-1] = n
    t_lo = bound(cum_ex, n)  # previous lane's t_hi, incl. its forcing

    f = (t_hi > t_lo).astype(jnp.float32)  # (S, 128) 0/1
    if key_offset is not None:
        t_hi = t_hi + key_offset
        t_lo = t_lo + key_offset
    rank = _hprefix_exact_seg([f.astype(jnp.bfloat16)])
    cnt = rank[s_rows - 1, 127] + f[s_rows - 1, 127]

    if krow is None:
        krow = (jax.lax.broadcasted_iota(jnp.int32, (t_k, 128), 0)
                .astype(jnp.float32))
    rank_m = jnp.where(f > 0, rank, jnp.float32(-1.0))

    # Per-variable exact bf16 splits, still (S, 128).
    splits = []
    for v in (p3[0], p3[1], p3[2], t_hi, t_lo):
        splits.extend(split3_kernel(v))  # variable-major [hi mid lo]

    compact = None
    vals_s = None
    for s in range(s_rows):
        sel_s = (krow == rank_m[s:s + 1, :]).astype(jnp.bfloat16)
        vals_s = jnp.concatenate([v[s:s + 1, :] for v in splits],
                                 axis=0)  # (15, 128) bf16
        part = jax.lax.dot_general(
            vals_s, sel_s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (15, t_k)
        compact = part if compact is None else compact + part

    kcol = (jax.lax.broadcasted_iota(jnp.int32, (1, t_k), 1)
            .astype(jnp.float32))
    live = kcol < cnt
    fill_src = vals_s[:, 127:128]  # (15, 1) last input lane
    fill = jnp.concatenate([fill_src[0:12], fill_src[9:12]], axis=0)
    return jnp.where(live, compact.astype(jnp.bfloat16), fill), cnt


def _boundary_compact_seg_kernel(base_ref, par_ref, lane0_ref, x_ref,
                                 y_ref, yaw_ref, wq_ref, out_ref,
                                 cnt_ref, *, t_k: int, n: int, t_in: int,
                                 g_p1: int):
    """Segment-packed fused pass 1 (see :func:`tile_boundary_compact_seg`).

    Inputs arrive pre-bitcast from XLA as ``(n_pad // 128, 128)`` f32
    planes (row-major = flat lane order, so the reshape is free);
    blocks cover ``g_p1`` tiles = ``g_p1 * t_in // 128`` segment rows.
    """
    c = pl.program_id(0)
    s_tile = t_in // 128
    krow = (jax.lax.broadcasted_iota(jnp.int32, (t_k, 128), 0)
            .astype(jnp.float32))
    for u in range(g_p1):
        b = c * g_p1 + u
        sl = slice(u * s_tile, (u + 1) * s_tile)
        out, cnt = tile_boundary_compact_seg(
            wq_ref[sl, :], (x_ref[sl, :], y_ref[sl, :], yaw_ref[sl, :]),
            base_ref[b], par_ref[0], par_ref[1], lane0_ref[b], n, t_k,
            krow=krow)
        out_ref[:, u * t_k:(u + 1) * t_k] = out
        cnt_ref[0, b] = cnt.astype(jnp.int32)


def _boundary_compact_kernel(base_ref, par_ref, lane0_ref, p_ref, wq_ref,
                             out_ref, cnt_ref, *, t_k: int, n: int,
                             t_in: int, g_p1: int):
    """Fused pass 1: in-tile boundary build + survivor compaction.

    Replaces the XLA glue of the unfused path (global ``quantized_cum``
    cumsum over all lanes, boundary/flag/rank tensors, 15-row bf16 split
    stack - together ~1.6 ms/firing-step at 1M particles on v5e) with
    in-tile work: the only XLA prerequisites are the quantized integer
    weights ``wq`` (one fused elementwise pass) and the ``nt_in``-length
    exclusive prefix of their per-tile sums.

    Exactness: ``wq`` are integers with total < 2**24, so every partial
    sum is exact in f32 in any order.  The in-tile cumsum runs as a
    strict-lower-triangular matmul over exact 3-way bf16 splits (all
    split parts of integers are integers, products with a 0/1 matrix are
    exact, the f32 accumulator sums integers exactly), so
    ``base + in-tile cumsum`` reproduces the global cumsum bit-for-bit.
    The boundary law (:func:`tpuslam.filters.pf.boundary_law`) is the
    same multiply-only f32 expression the XLA hist decode evaluates on
    the same exact integers and the same XLA-computed reciprocal ->
    identical selection.  (The original in-kernel ``cum / q_tot`` form
    was NOT: Mosaic's f32 division rounds differently from XLA's on
    ~1e-3 of lanes - measured on v5e, scripts/tpu_parity_probe.py.)

    Each grid cell covers ``g_p1`` consecutive input tiles (unrolled):
    the one-tile-per-cell grid paid the ~0.5-1 us fixed per-cell cost
    on every tile (the same floor the wide pass A / pass C chunking
    removed - scripts/tpu_wide_profile4.py); the per-tile math is
    unchanged, so selection is bit-identical for any ``g_p1``.

    Outputs: the compacted ``(15, t_k)`` bf16 blocks (same layout and
    inert-fill convention as :func:`_compact_kernel`) and the per-tile
    survivor counts (SMEM, feed the skip table + cap predicate).
    """
    c = pl.program_id(0)
    # Cell-invariant one-hot row index, built once per cell.
    krow = (jax.lax.broadcasted_iota(jnp.int32, (t_k, t_in), 0)
            .astype(jnp.float32))
    for u in range(g_p1):
        b = c * g_p1 + u
        sl = slice(u * t_in, (u + 1) * t_in)
        out, cnt = tile_boundary_compact(
            wq_ref[0:1, sl], p_ref[:, sl], base_ref[b], par_ref[0],
            par_ref[1], lane0_ref[b], n, t_k, krow=krow)
        out_ref[:, u * t_k:(u + 1) * t_k] = out
        # cnt rides an UNBLOCKED SMEM output (whole (1, nt_in) row
        # visible, one slot written per step): Mosaic rejects
        # (1, 1)-blocked output specs on hardware (block dims must
        # divide (8, 128)).
        cnt_ref[0, b] = cnt.astype(jnp.int32)


def quantize_weights(w_row, n: int, t_in: int):
    """XLA prerequisites of the fused pass 1 (the only O(N) XLA work).

    Quantizes weights exactly as :func:`tpuslam.filters.pf.quantized_cum`
    (same scale expression -> same integers) but WITHOUT the global
    cumsum: returns the ``(1, n_pad)`` integer weights, the
    ``(nt_in,)`` exclusive prefix of their per-tile sums, and the exact
    total.  All sums of integers < 2**24 are order-independent in f32,
    so ``base[j] + in-tile prefix`` equals the global cumsum exactly.
    """
    from tpuslam.filters.pf import quantize_weights_law

    n_pad = w_row.shape[1]
    total_w = jnp.sum(w_row, axis=-1, keepdims=True)
    wq = quantize_weights_law(w_row, total_w)
    tile_sums = wq.reshape(n_pad // t_in, t_in).sum(axis=-1)
    cum_tiles = jnp.cumsum(tile_sums)
    base = cum_tiles - tile_sums  # exclusive
    return wq, base, cum_tiles[-1]


def _pick_chunk(nt: int, t_lanes: int, budget: int = 16384,
                sublane8: bool = False) -> int:
    """Largest divisor ``g`` of ``nt`` with ``g * t_lanes <= budget``.

    With ``sublane8``, additionally require ``g * t_lanes // 128`` to be
    a multiple of 8 — the seg kernel's ``(S, 128)`` input blocks must
    have a sublane count Mosaic accepts on hardware (partial blocks with
    S % 8 != 0 are rejected); returns 0 when no divisor qualifies so the
    caller can fall back to the flat kernel.
    """
    for d in range(nt, 0, -1):
        if nt % d or d * t_lanes > budget:
            continue
        if sublane8 and (d * t_lanes // 128) % 8:
            continue
        return d
    return 0 if sublane8 else 1


def boundary_compact_particles(p_rows, w_row, n: int, offs, t_in: int,
                               t_k: int, interpret: bool = False,
                               precomputed=None, packed: bool = True):
    """Fused pass-1 call: quantize (XLA) + boundary/compact (kernel).

    Selection is bit-identical to :func:`boundary_decode` +
    :func:`compact_particles`; returns ``(tc, cnt)`` where ``tc`` is the
    ``(15, (n_pad // t_in) * t_k)`` bf16 compacted stack and ``cnt`` the
    ``(nt_in,)`` int32 per-tile survivor counts.

    Args:
        precomputed: optional ``(wq, base, q_tot, lane0)`` when the
            caller already quantized - the sharded survivor-exchange
            path, where ``p_rows``/``wq`` are one device's slab, ``base``
            the GLOBAL exclusive tile prefixes of that slab's tiles,
            ``q_tot`` the global total, and ``lane0`` each tile's global
            first-lane id (all exact integers, so the distributed prefix
            reproduces the global cumsum bit-for-bit).
        packed: run the segment-packed kernel
            (:func:`tile_boundary_compact_seg`: full sublane occupancy,
            no in-kernel relayouts) when ``t_in`` is a multiple of 256.
            Bit-identical selection and values; False keeps the flat
            kernel (A/B measurement).
    """
    n_pad = p_rows.shape[1]
    nt_in = n_pad // t_in
    if precomputed is None:
        wq, base, q_tot = quantize_weights(w_row, n, t_in)
        lane0 = jnp.arange(nt_in, dtype=jnp.int32) * t_in
    else:
        wq, base, q_tot, lane0 = precomputed
    # The shared reciprocal: computed HERE (XLA), multiplied inside the
    # kernel - see filters/pf.py::boundary_law for why dividing in the
    # kernel breaks bit-parity with the XLA decode.
    inv_tot = 1.0 / q_tot.astype(jnp.float32)
    params = jnp.stack([inv_tot, offs.astype(jnp.float32)])
    # The seg path needs an 8-sublane-aligned chunk (see _pick_chunk);
    # when none exists (e.g. nt_in with only odd divisors at t_in=256)
    # fall back to the flat kernel rather than hand Mosaic a partial
    # block it rejects on hardware.
    g_seg = (_pick_chunk(nt_in, t_in, sublane8=True)
             if packed and t_in % 256 == 0 else 0)
    g_p1 = g_seg if g_seg else _pick_chunk(nt_in, t_in)
    common = dict(t_k=t_k, n=n, t_in=t_in, g_p1=g_p1)
    out_specs = [
        pl.BlockSpec((_ROWS, g_p1 * t_k), lambda b, *_: (0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((_ROWS, nt_in * t_k), jnp.bfloat16),
        jax.ShapeDtypeStruct((1, nt_in), jnp.int32),
    ]
    if g_seg:
        # Free bitcast reshapes: (1, n_pad) / (3, n_pad) row-major ->
        # (n_pad // 128, 128) segment planes in the same linear order.
        p32 = p_rows.astype(jnp.float32)
        seg = lambda row: row.reshape(n_pad // 128, 128)  # noqa: E731
        s_blk = g_p1 * t_in // 128
        seg_spec = pl.BlockSpec((s_blk, 128), lambda b, *_: (b, 0),
                                memory_space=pltpu.VMEM)
        tc, cnt = pl.pallas_call(
            functools.partial(_boundary_compact_seg_kernel, **common),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nt_in // g_p1,),
                in_specs=[seg_spec] * 4,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(base.astype(jnp.float32), params, lane0.astype(jnp.int32),
          seg(p32[0]), seg(p32[1]), seg(p32[2]), seg(wq))
        return tc, cnt[0]
    tc, cnt = pl.pallas_call(
        functools.partial(_boundary_compact_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt_in // g_p1,),
            in_specs=[
                pl.BlockSpec((3, g_p1 * t_in), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_p1 * t_in), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(base.astype(jnp.float32), params,
      lane0.astype(jnp.int32), p_rows.astype(jnp.float32), wq)
    return tc, cnt[0]


def _pick_tile(n_pad: int, want: int) -> int:
    t = min(want, n_pad)
    while n_pad % t:
        t //= 2
    if t < 8:
        raise ValueError(f"n_pad={n_pad} has no usable tile divisor")
    return t


def merge_caps(n_lanes: int, t_in: int = 1024, t_k: int = 256,
               t_out: int = 2048, w_b: int = 12):
    """Resolve the merge kernel's static tile caps for ``n_lanes``.

    Single source of the cap derivation for both the single-device
    kernel and the sharded survivor-exchange path (their selection
    bit-parity depends on deriving identical caps).

    Returns ``(t_in, t_k, t_out, w_b, wb2)``.
    """
    t_in = _pick_tile(n_lanes, t_in)
    t_k = min(t_k, t_in)
    t_out = _pick_tile(n_lanes, t_out)
    wb2 = min(_WB2, t_k)
    while t_k % wb2:
        wb2 //= 2
    return t_in, t_k, t_out, w_b, wb2


def boundary_decode(w_row, n: int, offs, t_in: int, t_k: int):
    """Shared survivor decode: boundaries, flags, ranks, tile counts.

    The one construction both resample paths must agree on bit-for-bit
    (see :func:`merge_caps`).

    Returns ``(t_row, tprev, f_row, g_row, cnt, ok_compact)`` where
    ``cnt`` is the per-``t_in``-tile survivor count and ``ok_compact``
    the pass-1 cap predicate.
    """
    t_row = slot_boundaries(w_row, n, offs)
    tprev = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), t_row[:, :-1]], axis=-1)
    f_row = (t_row > tprev).astype(jnp.int32)
    g_row = jnp.cumsum(f_row, axis=-1) - f_row  # exclusive rank
    cnt = f_row[0].reshape(f_row.shape[1] // t_in, t_in).sum(axis=-1)
    ok_compact = jnp.max(cnt) <= t_k
    return t_row, tprev, f_row, g_row, cnt, ok_compact


@functools.partial(jax.jit, static_argnames=("n", "t_in", "t_k", "t_out",
                                             "w_b", "interpret", "fused",
                                             "pass2", "w_b_small",
                                             "t_k_small"))
def merge_resample_rows(key, p_rows, w_row, n: int, t_in: int = 2048,
                        t_k: int = 512, t_out: int = 2048, w_b: int = 12,
                        interpret: bool = False, fused: bool = True,
                        pass2: str = "windowed", w_b_small: int = 0,
                        t_k_small: int = 256):
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
        t_out / w_b: output tile lanes / compressed window blocks per
            output tile (pass-2 static cap on the survivor span).
        interpret: run kernels in interpret mode (CPU tests).
        fused: build boundaries inside the pass-1 kernel
            (:func:`boundary_compact_particles`) instead of in XLA -
            identical selection, no O(N) cumsums or split-stack
            materialization outside the kernel.  False keeps the
            original XLA boundary build (A/B parity testing).
        pass2: ``"windowed"`` = per-block window refs
            (:func:`expand_compacted`); ``"compressed"`` = XLA
            block-compression + two wide super-refs per output tile
            (:func:`expand_compressed`) - bit-identical outputs, ~6x
            fewer pass-2 DMAs.
        w_b_small: if ``0 < w_b_small < w_b``, dispatch the windowed
            pass 2 through a small tier fetching only ``w_b_small``
            window refs per tile when every tile's survivor span fits
            (typical post-gate spans are 2-3 blocks); wider spans take
            the full-``w_b`` kernel via ``lax.cond``.  Selection is
            span-cap-invariant, so tiers are pure scheduling.
        t_k_small: if ``0 < t_k_small < t_k`` (fused windowed path
            only), run the whole merge at the SMALL survivor cap first
            - the compact one-hot dot's FLOPs scale with ``t_k`` - and
            on a per-tile cap overflow re-run pass 1 at the full
            ``t_k`` via ``lax.cond`` (kernel speed) instead of paying
            the ~22 ms XLA decode.  Selection is cap-invariant.

    Returns:
        ``(3, n_pad)`` resampled particles, padding lanes zero.
    """
    if n >= 1 << 24:
        raise ValueError("merge resample requires n < 2**24 (f32-exact "
                         f"slot boundaries); got {n}")
    n_pad = p_rows.shape[1]
    t_in, t_k, t_out, w_b, wb2 = merge_caps(n_pad, t_in, t_k, t_out, w_b)

    offs = jax.random.uniform(key, dtype=jnp.float32)

    def xla_path(_):
        t_row = slot_boundaries(w_row, n, offs)
        idx = decode_indices(t_row, n)
        return jnp.zeros_like(p_rows).at[:, :n].set(p_rows[:, :n][:, idx])

    if fused and pass2 == "windowed" and not w_b_small \
            and 0 < t_k_small < t_k:
        nt_out = n_pad // t_out
        i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
        i_last = jnp.minimum(i0 + t_out, n) - 1

        def run_at(t_k_eff: int):
            wb2_eff = min(_WB2, t_k_eff)
            bc, cnt = boundary_compact_particles(p_rows, w_row, n, offs,
                                                 t_in, t_k_eff,
                                                 interpret)
            tc15 = jnp.concatenate([bc, inert_tail(n, w_b, wb2_eff)],
                                   axis=1)
            sb, span, need, blk_ids = skip_table(
                cnt, tc15, t_k_eff, wb2_eff, w_b, i0, i_last, i0 < n)
            ok = ((jnp.max(cnt) <= t_k_eff)
                  & (jnp.max(need) <= w_b))

            def expand(_):
                out = expand_compacted(tc15, sb, span, blk_ids, i0,
                                       n_pad, t_out, wb2_eff, w_b,
                                       interpret)
                return out.astype(p_rows.dtype)

            return ok, expand

        ok_s, expand_s = run_at(t_k_small)

        def full_tier(_):
            ok_f, expand_f = run_at(t_k)
            return jax.lax.cond(ok_f, expand_f, xla_path, 0)

        return jax.lax.cond(ok_s, expand_s, full_tier, 0)

    # Pass 1 runs unconditionally (cheap vs the gather it replaces; its
    # output is discarded on fallback).
    if fused:
        bc, cnt = boundary_compact_particles(p_rows, w_row, n, offs,
                                             t_in, t_k, interpret)
        ok_compact = jnp.max(cnt) <= t_k
    else:
        t_row, tprev, f_row, g_row, cnt, ok_compact = boundary_decode(
            w_row, n, offs, t_in, t_k)
        bc = compact_particles(p_rows, t_row, tprev, f_row, g_row, t_in,
                               t_k, interpret)
    tc15 = jnp.concatenate([bc, inert_tail(n, w_b, wb2)], axis=1)

    nt_out = n_pad // t_out
    i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
    i_last = jnp.minimum(i0 + t_out, n) - 1
    sb, span, need, blk_ids = skip_table(cnt, tc15, t_k, wb2, w_b, i0,
                                         i_last, i0 < n)
    ok_window = jnp.max(need) <= w_b
    ok = ok_compact & ok_window

    def expand_full(_):
        out = expand_compacted(tc15, sb, span, blk_ids, i0, n_pad,
                               t_out, wb2, w_b, interpret)
        return out.astype(p_rows.dtype)

    if pass2 == "compressed":

        def expand_c(_):
            # compress_blocks (a full-stack gather) lives INSIDE the
            # kernel branch so the XLA fallback never pays it.
            comp = compress_blocks(tc15, blk_ids, wb2, w_b)
            out = expand_compressed(comp, sb, span, i0, n_pad, t_out,
                                    wb2, w_b, interpret)
            return out.astype(p_rows.dtype)

        return jax.lax.cond(ok, expand_c, xla_path, 0)

    if 0 < w_b_small < w_b:
        n_blk = cnt.shape[0] * (t_k // wb2) + w_b
        le = sb + span - 1
        sb_s = jnp.minimum(sb, n_blk - w_b_small)
        span_s = jnp.clip(le - sb_s + 1, 1, w_b_small)

        def expand_small(_):
            out = expand_compacted(tc15, sb_s, span_s, blk_ids, i0,
                                   n_pad, t_out, wb2, w_b_small,
                                   interpret)
            return out.astype(p_rows.dtype)

        def tiers(_):
            return jax.lax.cond(jnp.max(need) <= w_b_small,
                                expand_small, expand_full, 0)

        return jax.lax.cond(ok, tiers, xla_path, 0)

    return jax.lax.cond(ok, expand_full, xla_path, 0)
