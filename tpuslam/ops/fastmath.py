"""Polynomial transcendentals for Pallas TPU kernels.

Mosaic's vector ``cos``/``sin`` are the single most expensive VPU ops in
this codebase's kernels - measured ~10x the cost of ``log``/``sqrt`` and
~40x an FMA (scripts/tpu_ekf_rng_micro.py: 6 builtin trigs cost 1.09 s
over a 2M x 400 rollout vs 0.09 s for 6 PRNG draws + scale; a
quadrant-folded polynomial pair costs ~0.2 s).  The Box-Muller noise
transform needs a (cos, sin) pair of a UNIFORMLY RANDOM angle, where a
1e-7-accurate polynomial is distributionally indistinguishable from the
builtin - so the hot kernels use these instead.

``sincos_turns`` evaluates degree-(9,10) least-squares-fit polynomials
on the quarter turn (coefficients fit on Chebyshev nodes; max f32 error
~1.8e-7 over the full turn, verified in tests/test_ops.py) and returns
BOTH cos and sin for one folding - half the work of two builtin calls
even before the per-op speedup.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * math.pi

# sin(h) = h * P(h^2), cos(h) = Q(h^2) on h in [0, pi/2); fit on
# Chebyshev nodes (see module docstring).
_SIN_C = (0.9999999812130134, -0.16666649688716711,
          0.008332926736968374, -0.00019802254676520736,
          2.592816210455618e-06)
_COS_C = (0.9999999999054029, -0.4999999950367743,
          0.04166664009947133, -0.0013888400245756864,
          2.476182880839003e-05, -2.607709311324439e-07)


def sincos_turns(u):
    """``(cos, sin)`` of ``2*pi*u`` for ``u`` in ``[0, 1)``.

    Quadrant fold + quarter-turn polynomials; max abs error ~1.8e-7 in
    f32.  One call produces both values.
    """
    t = u * 4.0
    q = jnp.floor(t)
    h = (t - q) * (math.pi / 2.0)
    h2 = h * h
    sp = _SIN_C[-1]
    for c in _SIN_C[-2::-1]:
        sp = sp * h2 + c
    sp = h * sp
    cp = _COS_C[-1]
    for c in _COS_C[-2::-1]:
        cp = cp * h2 + c
    q1 = q == 1.0
    q2 = q == 2.0
    q3 = q == 3.0
    cos_v = jnp.where(q1, -sp, jnp.where(q2, -cp, jnp.where(q3, sp, cp)))
    sin_v = jnp.where(q1, cp, jnp.where(q2, -sp, jnp.where(q3, -cp, sp)))
    return cos_v, sin_v


def sincos_rad(theta):
    """``(cos, sin)`` of an angle in radians (any magnitude; folded to
    turns first)."""
    u = theta * (1.0 / _TWO_PI)
    u = u - jnp.floor(u)
    return sincos_turns(u)


def normals(shape, count):
    """``count`` independent standard-normal rows via Box-Muller.

    The radius uses the builtin ``log``/``sqrt`` (cheap on this VPU);
    the angle pair uses :func:`sincos_turns` (the builtin trig pair is
    the dominant cost of the noise block otherwise).  Pairs share
    draws; the stream is ``pltpu.prng_random_bits`` - seed before
    calling.  TPU-only (no CPU interpret lowering for the PRNG):
    callers must keep a ``noise_on=False`` path.
    """
    out = []
    for _ in range((count + 1) // 2):
        b1 = pltpu.prng_random_bits(shape)
        b2 = pltpu.prng_random_bits(shape)
        # 24 high bits -> (0, 1); +0.5 ulp keeps u1 strictly positive.
        u1 = (jax.lax.shift_right_logical(b1, 8).astype(jnp.float32)
              + 0.5) * (1.0 / (1 << 24))
        u2 = jax.lax.shift_right_logical(b2, 8).astype(jnp.float32) * (
            1.0 / (1 << 24))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        c, s = sincos_turns(u2)
        out.append(r * c)
        out.append(r * s)
    return out[:count]
