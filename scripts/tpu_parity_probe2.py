"""Bisect the n=5000 fused!=unfused merge-resample divergence (v5e).

tpu_parity_probe.py showed: the isolated boundary laws (div AND mul)
bit-match XLA on hardware, and the 1M fused path now matches, but
n=5000 (padded, non-tile-multiple) diverges deterministically.  This
probe compares the two pass-1 constructions stage by stage:

  A. per-tile survivor counts (kernel cnt vs XLA f_row sums)
  B. compacted stacks tc15 (bit compare per row group)
  C. skip tables (sb/span/need/blk_ids)
  D. final outputs + which lanes differ
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def probe(n, n_pad, seed):
    from tpuslam.ops.resample_pallas import (
        boundary_compact_particles, boundary_decode, compact_particles,
        inert_tail, merge_caps, skip_table, merge_resample_rows)

    rng = np.random.default_rng(seed)
    lw = rng.normal(size=n_pad) * 8.0
    lw[n:] = -np.inf
    w = np.exp(lw - lw[:n].max())
    w /= w.sum()
    w[n:] = 0
    w_row = jnp.asarray(w, jnp.float32)[None]
    p = jnp.asarray(rng.normal(size=(3, n_pad)), jnp.float32)
    key = jax.random.key(seed)
    offs = jax.random.uniform(key, dtype=jnp.float32)

    t_in, t_k, t_out, w_b, wb2 = merge_caps(n_pad)
    print(f"n={n} n_pad={n_pad} t_in={t_in} t_k={t_k} t_out={t_out} "
          f"w_b={w_b} wb2={wb2}", flush=True)

    # fused pass 1
    bc_f, cnt_f = jax.jit(
        lambda p, w, o: boundary_compact_particles(p, w, n, o, t_in, t_k)
    )(p, w_row, offs)
    # unfused pass 1
    def unfused(p, w, o):
        t_row, tprev, f_row, g_row, cnt, okc = boundary_decode(
            w, n, o, t_in, t_k)
        bc = compact_particles(p, t_row, tprev, f_row, g_row, t_in, t_k)
        return bc, cnt, okc
    bc_u, cnt_u, okc_u = jax.jit(unfused)(p, w_row, offs)

    cnt_f = np.asarray(cnt_f)
    cnt_u = np.asarray(cnt_u)
    print("A. cnt equal:", bool((cnt_f == cnt_u).all()),
          "fused:", cnt_f.tolist(), "unfused:", cnt_u.tolist(),
          flush=True)

    bf = np.asarray(bc_f, np.float32)
    bu = np.asarray(bc_u, np.float32)
    neq = (bf != bu)
    print("B. tc15 mismatched entries:", int(neq.sum()), flush=True)
    if neq.any():
        rows, cols = np.nonzero(neq)
        for r, c in list(zip(rows, cols))[:12]:
            blk, lane = divmod(c, t_k)
            print(f"   row {r} blk {blk} lane {lane}: fused={bf[r, c]} "
                  f"unfused={bu[r, c]}", flush=True)
        # recombined boundary values on first mismatching block
        blk = cols[0] // t_k
        s = slice(blk * t_k, (blk + 1) * t_k)
        thf = bf[9, s] + bf[10, s] + bf[11, s]
        thu = bu[9, s] + bu[10, s] + bu[11, s]
        tlf = bf[12, s] + bf[13, s] + bf[14, s]
        tlu = bu[12, s] + bu[13, s] + bu[14, s]
        bad = np.nonzero((thf != thu) | (tlf != tlu))[0][:8]
        for i in bad:
            print(f"   blk {blk} lane {i}: t_hi f/u {thf[i]}/{thu[i]} "
                  f"t_lo f/u {tlf[i]}/{tlu[i]}", flush=True)

    # C: skip tables from each stack
    def table(bc, cnt):
        tc15 = jnp.concatenate([bc, inert_tail(n, w_b, wb2)], axis=1)
        nt_out = n_pad // t_out
        i0 = jnp.arange(nt_out, dtype=jnp.int32) * t_out
        i_last = jnp.minimum(i0 + t_out, n) - 1
        return skip_table(cnt, tc15, t_k, wb2, w_b, i0, i_last, i0 < n)
    tf = jax.jit(table)(bc_f, cnt_f)
    tu = jax.jit(table)(bc_u, cnt_u)
    names = ["sb", "span", "need", "blk_ids"]
    for nm, a, b in zip(names, tf, tu):
        a = np.asarray(a); b = np.asarray(b)
        if (a != b).any():
            print(f"C. {nm} differs: fused {a.tolist()[:16]} unfused "
                  f"{b.tolist()[:16]}", flush=True)
        else:
            print(f"C. {nm} equal", flush=True)
    print("   ok_window need max f/u:", int(np.asarray(tf[2]).max()),
          int(np.asarray(tu[2]).max()), "w_b:", w_b, flush=True)
    print("   ok_compact f/u:", bool(cnt_f.max() <= t_k), bool(okc_u),
          flush=True)

    # D: final outputs
    a = merge_resample_rows(key, p, w_row, n, fused=True)
    b = merge_resample_rows(key, p, w_row, n, fused=False)
    a = np.asarray(a); b = np.asarray(b)
    neq = (a != b)
    print("D. final mismatched lanes:", int(neq.any(0).sum()), flush=True)
    if neq.any():
        lanes = np.nonzero(neq.any(0))[0]
        print("   first lanes:", lanes[:10].tolist(),
              "of n =", n, flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    for seed in range(2):
        probe(5000, 8192, seed)


if __name__ == "__main__":
    main()
