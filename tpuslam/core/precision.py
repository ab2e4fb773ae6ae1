"""Matmul-precision control.

TPU matmuls/einsums default to bf16 accumulation, which is fine for the
elementwise-dominated filter math but catastrophic inside linear-algebra
recursions (Schur complements lose positive-definiteness, CG stalls, GN
keeps bouncing above its convergence threshold).  Decorate any function
whose numerics depend on full f32 products with
:func:`highest_matmul_precision`.
"""

from __future__ import annotations

import functools

import jax


def highest_matmul_precision(fn):
    """Run ``fn`` (tracing included) under full-precision matmuls."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
