#!/usr/bin/env python
"""Micro-bench: where does the EKF kernel's RNG time go?

The fused EKF rollout runs 5.5e9 steps/s noise-free but 1.07e9 with
noise - the 6-draw Box-Muller block is ~81% of the kernel.  This times
a stripped kernel running ONLY the noise block (+ a trivial consumer)
for variants:

  draws6     6x prng_random_bits + convert/scale (no transform)
  draws3     3x prng_random_bits, split 32 -> 2x16-bit uniforms
  bm         full Box-Muller on 6 draws (the current production block)
  bm16       full Box-Muller on 3 split draws
  bm_poly    Box-Muller with bit-trick log2 + quadrant-poly sincos
  logs       draws6 + 3x jnp.log only
  trigs      draws6 + 3x cos + 3x sin only
  sqrts      draws6 + 3x jnp.sqrt only
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, TILE = 2 * 1024 * 1024, 400, 2048
TWO_PI = 2.0 * np.pi


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *a, reps=3):
    float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def u24(bits):
    return (jax.lax.shift_right_logical(bits, 8).astype(jnp.float32)
            + 0.5) * (1.0 / (1 << 24))


def split16(bits):
    hi = (jax.lax.shift_right_logical(bits, 16).astype(jnp.float32)
          + 0.5) * (1.0 / (1 << 16))
    lo = ((bits & 0xFFFF).astype(jnp.float32) + 0.5) * (1.0 / (1 << 16))
    return hi, lo


def poly_log(u_bits):
    """-ln(u) for u = (r+0.5)*2^-24, via exponent extraction + deg-4
    mantissa poly (r = 24 random bits as int32)."""
    r = jax.lax.shift_right_logical(u_bits, 8)
    # f = r + 0.5 in [0.5, 2^24); as float, decompose via bitcast.
    f = r.astype(jnp.float32) + 0.5
    ib = jax.lax.bitcast_convert_type(f, jnp.int32)
    e = jax.lax.shift_right_logical(ib, 23) - 127  # unbiased exponent
    m = jax.lax.bitcast_convert_type(
        (ib & 0x007FFFFF) | 0x3F800000, jnp.float32)  # [1, 2)
    # ln(m), m in [1,2): minimax-ish via ln(1+x) Horner, x in [0,1)
    x = m - 1.0
    ln_m = x * (0.9999964239 + x * (-0.4998741238 + x * (
        0.3317990258 + x * (-0.2407338084 + x * 0.1676540711))))
    ln_u = e.astype(jnp.float32) * 0.6931471805599453 + ln_m \
        - 24.0 * 0.6931471805599453
    return -ln_u


def poly_sincos(u):
    """(cos, sin) of 2*pi*u for u in [0,1): quadrant fold + deg-5 polys
    in the quarter-turn variable."""
    t = u * 4.0
    q = jnp.floor(t)
    f = t - q  # [0,1) within quadrant
    # within quadrant: angle = (pi/2)*f
    h = f * (np.pi / 2.0)
    h2 = h * h
    # cos/sin polys on [0, pi/2): standard Taylor-ish (good to ~1e-7)
    c = 1.0 + h2 * (-0.5 + h2 * (1.0 / 24.0 + h2 * (-1.0 / 720.0)))
    s = h * (1.0 + h2 * (-1.0 / 6.0 + h2 * (1.0 / 120.0
                                            + h2 * (-1.0 / 5040.0))))
    q0 = q == 0.0
    q1 = q == 1.0
    q2 = q == 2.0
    cos_v = jnp.where(q0, c, jnp.where(q1, -s, jnp.where(q2, -c, s)))
    sin_v = jnp.where(q0, s, jnp.where(q1, c, jnp.where(q2, -s, -c)))
    return cos_v, sin_v


def make_kernel(mode):
    def kern(seed_ref, out_ref, *, n_steps):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        shape = (1, out_ref.shape[1])

        def step(_, acc):
            if mode in ("draws3", "bm16"):
                bs = [pltpu.prng_random_bits(shape) for _ in range(3)]
                us = []
                for b_ in bs:
                    h, l_ = split16(b_)
                    us += [h, l_]
            else:
                bs = [pltpu.prng_random_bits(shape) for _ in range(6)]
                us = [u24(b_) for b_ in bs]

            if mode in ("draws6", "draws3"):
                vals = us
            elif mode in ("bm", "bm16"):
                vals = []
                for i in range(3):
                    r = jnp.sqrt(-2.0 * jnp.log(us[2 * i]))
                    a = TWO_PI * us[2 * i + 1]
                    vals += [r * jnp.cos(a), r * jnp.sin(a)]
            elif mode == "bm_poly":
                vals = []
                for i in range(3):
                    r = jnp.sqrt(2.0 * poly_log(bs[2 * i]))
                    c, s = poly_sincos(us[2 * i + 1])
                    vals += [r * c, r * s]
            elif mode == "logs":
                vals = us[:3] + [jnp.log(u) for u in us[3:]]
            elif mode == "sqrts":
                vals = us[:3] + [jnp.sqrt(u) for u in us[3:]]
            elif mode == "trigs":
                vals = [jnp.cos(TWO_PI * u) for u in us[:3]] + \
                       [jnp.sin(TWO_PI * u) for u in us[3:]]
            acc = acc
            for v_ in vals:
                acc = acc + v_
            return acc

        out_ref[0:1, :] = jax.lax.fori_loop(
            0, n_steps, step, jnp.zeros(shape, jnp.float32))
    return kern


def run(mode):
    kern = functools.partial(make_kernel(mode), n_steps=T)

    @jax.jit
    def fn(seed):
        out = pl.pallas_call(
            kern,
            grid=(B // TILE,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        )(jnp.asarray([seed], jnp.int32))
        return jnp.sum(out)

    dt = timed(fn, 1)
    log(f"{mode:8s}: {dt:.3f} s ({B * T / dt:.3e} lane-steps/s)")
    return dt


def main():
    log(f"devices: {jax.devices()}  B={B} T={T}")
    # sanity: poly log/sincos accuracy, pure numpy (no extra TPU work)
    rng = np.random.default_rng(0)
    u = (rng.integers(0, 1 << 24, 65536).astype(np.float64) + 0.5) \
        / (1 << 24)
    f32 = u.astype(np.float32) * (1 << 24)  # r + 0.5 as f32
    ib = f32.view(np.int32)
    e = (ib >> 23) - 127
    m = ((ib & 0x007FFFFF) | 0x3F800000).view(np.float32) \
        .astype(np.float64)
    x = m - 1.0
    ln_m = x * (0.9999964239 + x * (-0.4998741238 + x * (
        0.3317990258 + x * (-0.2407338084 + x * 0.1676540711))))
    nl = -(e * 0.6931471805599453 + ln_m - 24 * 0.6931471805599453)
    err_l = np.max(np.abs(nl - (-np.log(u))) / np.maximum(
        np.abs(np.log(u)), 1e-3))
    uu = rng.random(65536)
    t = uu * 4.0
    q = np.floor(t)
    h = (t - q) * (np.pi / 2.0)
    h2 = h * h
    c = 1.0 + h2 * (-0.5 + h2 * (1.0 / 24.0 + h2 * (-1.0 / 720.0)))
    s = h * (1.0 + h2 * (-1.0 / 6.0 + h2 * (1.0 / 120.0
                                            + h2 * (-1.0 / 5040.0))))
    cos_v = np.select([q == 0, q == 1, q == 2], [c, -s, -c], s)
    sin_v = np.select([q == 0, q == 1, q == 2], [s, c, -s], -c)
    err_c = np.max(np.abs(cos_v - np.cos(TWO_PI * uu)))
    err_s = np.max(np.abs(sin_v - np.sin(TWO_PI * uu)))
    log(f"poly acc: relerr(ln)={err_l:.2e} abserr(cos)={err_c:.2e} "
        f"abserr(sin)={err_s:.2e}")

    for mode in ("draws6", "draws3", "bm", "bm16", "bm_poly", "logs",
                 "sqrts", "trigs"):
        run(mode)
    log("ALL DONE")


if __name__ == "__main__":
    main()
