"""Super-block tridiagonal solver: the MXU-shaped path for banded H.

The banded solvers in ``large.py``/``cholesky.py`` operate on 3x3 blocks -
correct, but at 10k poses their inner loops are thousands of tiny VPU ops
(CG) or a 10k-step scan (Cholesky), both latency-bound on TPU.  This
module re-tiles the same block-banded matrix into a block-TRIDIAGONAL
system of dense ``S``-block super-blocks (3S x 3S scalars, S >= band): the
entire band fits inside the diagonal + one coupling block, so a block-
Thomas elimination needs only ``T1/S`` sequential steps, each a dense
3S x 3S factor/solve that XLA maps straight onto the MXU.

For band 40 at 10k poses: 250 scan steps of 120x120 algebra versus 10,000
steps of 3x3 algebra - the sequential depth drops 40x and every op is
MXU-shaped.  This is the production solver for BASELINE config 5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuslam.core.precision import highest_matmul_precision


def band_to_tridiag(h_band, super_size: int):
    """Re-tile block-banded storage into super-block tridiagonal form.

    Args:
        h_band: ``(D, T1, 3, 3)`` upper-band storage (``D - 1 <= S``).
        super_size: S, number of 3x3 blocks per super-block; T1 must be a
            multiple of S (pad the trajectory if needed).

    Returns:
        ``(diag (N, 3S, 3S), upper (N-1, 3S, 3S))`` where N = T1 // S;
        ``upper[k] = H[super k, super k+1]``.
    """
    d1, t1 = h_band.shape[0], h_band.shape[1]
    band = d1 - 1
    if band > super_size:
        raise ValueError(f"band {band} exceeds super block size "
                         f"{super_size}")
    if t1 % super_size:
        raise ValueError(f"T1 {t1} not a multiple of {super_size}")
    n = t1 // super_size
    s3 = 3 * super_size

    # Dense per-pair scalar matrix entries from the band:
    # H[i, i+d] = h_band[d, i].  Build a (T1, D, 3, 3) view then scatter
    # into (N, S, S+S, 3, 3) local coordinates: row r in super k is global
    # i = k*S + r; column i + d lands in super k at c = r + d (c < S ->
    # diag block; c >= S -> upper block at c - S).
    r = jnp.arange(super_size)
    d = jnp.arange(d1)
    # cols[r, d] = r + d in [0, S + band)
    cols = r[:, None] + d[None, :]

    hb = jnp.swapaxes(h_band, 0, 1)  # (T1, D, 3, 3)
    hb = hb.reshape(n, super_size, d1, 3, 3)

    # wide[k, r, c] = H[k*S + r, k*S + c] for c in [0, S + band)
    wide = jnp.zeros((n, super_size, super_size + band, 3, 3),
                     h_band.dtype)
    wide = wide.at[:, r[:, None], cols].set(hb)

    diag_u = wide[:, :, :super_size]  # upper triangle of diagonal blocks
    upper = wide[:, :, super_size:]  # coupling into the next super block

    # Densify: diag = diag_u + strict-lower from transpose.
    def to_dense(x):  # (n, S, C, 3, 3) -> (n, 3S, 3C)
        nn, ss, cc = x.shape[0], x.shape[1], x.shape[2]
        return x.transpose(0, 1, 3, 2, 4).reshape(nn, 3 * ss, 3 * cc)

    # Mirror the strictly-upper BLOCKS (the (r, r) blocks are already
    # full 3x3 matrices; mirroring at scalar level would double their
    # lower scalars).
    strict_mask = (jnp.arange(super_size)[:, None]
                   < jnp.arange(super_size)[None, :])
    diag_d = to_dense(diag_u)
    mirror = to_dense(diag_u * strict_mask[None, :, :, None, None])
    diag = diag_d + mirror.swapaxes(-1, -2)

    up_d = to_dense(upper)  # (n, 3S, 3*band) -> embed into (n, 3S, 3S)
    up = jnp.zeros((n, s3, s3), h_band.dtype)
    up = up.at[:, :, :up_d.shape[2]].set(up_d)
    return diag, up[:-1]


def block_thomas_solve(diag, upper, b):
    """Solve the symmetric block-tridiagonal system via block Thomas.

    System: ``diag[k] x_k + upper[k] x_{k+1} + upper[k-1]^T x_{k-1} = b_k``.

    Forward elimination with pivoted LU per super-block (dense MXU work;
    LU rather than Cholesky because the f32 Schur recursion can push a
    marginally-conditioned S_k out of strict PD range on TPU), then back
    substitution; both are ``lax.scan`` of length N.

    Args:
        diag: ``(N, M, M)``; upper: ``(N-1, M, M)``; b: ``(N, M)``.

    Returns:
        ``(N, M)`` solution.
    """
    n, m = diag.shape[0], diag.shape[1]
    up = jnp.concatenate([upper, jnp.zeros((1, m, m), diag.dtype)], axis=0)
    eye = jnp.eye(m, dtype=diag.dtype)

    # TPU matmuls default to bf16 accumulation; the Schur-complement
    # recursion needs full f32 or it loses positive-definiteness and the
    # solve accuracy GN depends on.
    with jax.default_matmul_precision("highest"):
        def fwd(carry, inputs):
            chol_prev, y_prev, u_prev = carry
            a_k, u_k, b_k = inputs
            # W = S_{k-1}^{-1} U_{k-1} via the cached Cholesky factor.
            w = jax.scipy.linalg.cho_solve((chol_prev, True), u_prev)
            s_k = a_k - u_prev.T @ w
            s_k = 0.5 * (s_k + s_k.T)
            rhs = b_k - w.T @ y_prev
            chol_k = jnp.linalg.cholesky(s_k)
            return (chol_k, rhs, u_k), (chol_k, rhs)

        init = (eye, jnp.zeros((m,), diag.dtype),
                jnp.zeros((m, m), diag.dtype))
        _, (chols, ys) = jax.lax.scan(fwd, init, (diag, up, b))

        def bwd(x_next, inputs):
            chol_k, y_k, u_k = inputs
            rhs = y_k - u_k @ x_next
            x_k = jax.scipy.linalg.cho_solve((chol_k, True), rhs)
            return x_k, x_k

        _, xs_rev = jax.lax.scan(
            bwd, jnp.zeros((m,), diag.dtype),
            (chols[::-1], ys[::-1], up[::-1]))
        return xs_rev[::-1]


def pad_band(h_band, b, multiple: int):
    """Pad the trajectory axis to a multiple with decoupled identity
    blocks (their solution is exactly 0 for the zero RHS padding)."""
    d1, t1 = h_band.shape[0], h_band.shape[1]
    pad = (-t1) % multiple
    if pad:
        eye_tail = jnp.zeros((d1, pad, 3, 3), h_band.dtype)
        eye_tail = eye_tail.at[0].set(jnp.eye(3, dtype=h_band.dtype))
        h_band = jnp.concatenate([h_band, eye_tail], axis=1)
        b = jnp.concatenate([b, jnp.zeros((pad, 3), b.dtype)], axis=0)
    return h_band, b


def jacobi_prescale(h_band, b):
    """Symmetric Jacobi scaling s_i = 1/sqrt(H_ii) per scalar row.

    The graph's 1e4 gauge anchor otherwise pushes the f32 Schur
    recursions out of PD range.  Returns ``(h_scaled, b_scaled, s)``;
    un-scale a solution with ``x * s``.
    """
    d1, t1 = h_band.shape[0], h_band.shape[1]
    diag_scal = jnp.diagonal(h_band[0], axis1=-2, axis2=-1)  # (T1, 3)
    s = jax.lax.rsqrt(jnp.maximum(diag_scal, 1e-30))  # (T1, 3)
    # hb'[d, i, a, bcol] = hb * s[i, a] * s[i+d, bcol]
    idx = jnp.minimum(jnp.arange(t1)[None, :] + jnp.arange(d1)[:, None],
                      t1 - 1)
    s_col = s[idx]  # (D, T1, 3)
    h_scaled = h_band * s[None, :, :, None] * s_col[:, :, None, :]
    return h_scaled, b * s, s


@highest_matmul_precision
def banded_solve_tridiag(h_band, b, super_size: int | None = None):
    """One-shot H x = b via super-block tridiagonalization + block Thomas.

    Pads the trajectory axis to a super-block multiple (see
    :func:`pad_band`) and symmetrically Jacobi-prescales the system
    (:func:`jacobi_prescale`).
    """
    d1, t1 = h_band.shape[0], h_band.shape[1]
    band = d1 - 1
    if super_size is None:
        super_size = max(band, 1)
    h_band, b = pad_band(h_band, b, super_size)
    t_pad = h_band.shape[1]
    n = t_pad // super_size

    h_scaled, b_scaled, s = jacobi_prescale(h_band, b)
    diag, upper = band_to_tridiag(h_scaled, super_size)
    x = block_thomas_solve(diag, upper,
                           b_scaled.reshape(n, 3 * super_size))
    return (x.reshape(t_pad, 3) * s)[:t1]
