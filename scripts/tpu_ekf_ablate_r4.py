#!/usr/bin/env python
"""Round-4 EKF kernel ablation (VERDICT r3 item 6): where do the last
25% of the roofline go at 8M x 400?

Variants of ops/ekf_pallas.py::_ekf_kernel's step with stages ablated
(measurement only; the production kernel is untouched):

  full          the production math (baseline; expect ~8.7e9 steps/s)
  no-nees       skip the NEES accumulator (a per-step divide + 8 FMAs
                that the bench path never reads - with_nees=False)
  no-noise      Box-Muller zeroed (keeps poly trig): noise-block cost
  no-dr         dead-reckoning chain removed (display-only state: 1
                sincos + 3 draws per step)
  builtin-trig  jnp.cos/sin instead of the quadrant-folded polys
  algebra-only  no trig, no noise: the bare 3x3 covariance recursion
  carry-only    degenerate step (state pass-through + accumulator):
                loop/carry floor
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.filters.ekf import EkfConfig
from tpuslam.ops.fastmath import normals as _normals
from tpuslam.ops.fastmath import sincos_rad

BATCH = int(os.environ.get("EKF_B", 8 * 1024 * 1024))
STEPS = int(os.environ.get("EKF_STEPS", 400))
R = 8
TILE = 1024
_TWO_PI = 2.0 * math.pi


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


def _wrap(a):
    mag = jnp.abs(a)
    k = jnp.maximum(jnp.ceil((mag - math.pi) / _TWO_PI), 0.0)
    w = mag - _TWO_PI * k
    return jnp.where(a < 0, -w, w)


def make_kernel(cfg, *, nees=True, noise=True, dr=True, poly=True,
                algebra=True, carry_only=False):
    def kern(seed_ref, tbl_ref, state_in_ref, cov_in_ref, state_ref,
             cov_ref, err_ref):
        if noise:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt
        q0, q1, q2 = (s * s for s in cfg.q_std)
        r0sq, r1sq = (s * s for s in cfg.r_std)
        qa0, qa1, qa2 = cfg.q_act_std
        ra0, ra1 = cfg.r_act_std
        r = R
        lane_shape = (r, state_ref.shape[1])

        def step(i, c):
            (xd0, xd1, xd2, xh0, xh1, xh2,
             p00, p01, p02, p10, p11, p12, p20, p21, p22, acc, acc_n) = c
            if carry_only:
                acc = acc + xh0 * 1e-9
                return (xd0, xd1, xd2, xh0, xh1, xh2, p00, p01, p02,
                        p10, p11, p12, p20, p21, p22, acc, acc_n)
            n = (_normals(lane_shape, 6) if noise
                 else [jnp.zeros(lane_shape, jnp.float32)] * 6)
            xt0 = tbl_ref[i, 0]
            xt1 = tbl_ref[i, 1]
            c_t = tbl_ref[i, 3]
            s_t = tbl_ref[i, 4]
            wx = n[0] * ra0
            wy = n[1] * ra1
            z0 = s_t * wx + c_t * wy + xt0
            z1 = -c_t * wx + s_t * wy + xt1
            if dr:
                if poly:
                    c_d, s_d = sincos_rad(xd2)
                else:
                    c_d, s_d = jnp.cos(xd2), jnp.sin(xd2)
                xd0 = xd0 + v * dt * c_d + n[2] * qa0
                xd1 = xd1 + v * dt * s_d + n[3] * qa1
                xd2 = _wrap(xd2 + w * dt + n[4] * qa2)
            if algebra:
                if poly:
                    c_h, s_h = sincos_rad(xh2)
                else:
                    c_h, s_h = jnp.cos(xh2), jnp.sin(xh2)
            else:
                c_h = jnp.zeros(lane_shape, jnp.float32) + 0.6
                s_h = jnp.zeros(lane_shape, jnp.float32) + 0.8
            xp0 = xh0 + v * dt * c_h
            xp1 = xh1 + v * dt * s_h
            xp2 = _wrap(xh2 + w * dt)
            a = -dt * v * s_h
            b = dt * v * c_h
            m00 = p00 + a * p20
            m01 = p01 + a * p21
            m02 = p02 + a * p22
            m10 = p10 + b * p20
            m11 = p11 + b * p21
            m12 = p12 + b * p22
            p00n = m00 + a * m02 + q0
            p01n = m01 + b * m02
            p02n = m02
            p10n = m10 + a * m12
            p11n = m11 + b * m12 + q1
            p12n = m12
            p20n = p20 + a * p22
            p21n = p21 + b * p22
            p22n = p22 + q2
            s00 = p00n + r0sq
            s01 = p01n
            s10 = p10n
            s11 = p11n + r1sq
            det = s00 * s11 - s01 * s10
            inv = 1.0 / det
            i00 = s11 * inv
            i01 = -s01 * inv
            i10 = -s10 * inv
            i11 = s00 * inv
            g00 = p00n * i00 + p01n * i10
            g01 = p00n * i01 + p01n * i11
            g10 = p10n * i00 + p11n * i10
            g11 = p10n * i01 + p11n * i11
            g20 = p20n * i00 + p21n * i10
            g21 = p20n * i01 + p21n * i11
            e0 = z0 - xp0
            e1 = z1 - xp1
            xh0 = xp0 + g00 * e0 + g01 * e1
            xh1 = xp1 + g10 * e0 + g11 * e1
            xh2 = _wrap(xp2 + g20 * e0 + g21 * e1)
            n00 = p00n - (g00 * p00n + g01 * p10n)
            n01 = p01n - (g00 * p01n + g01 * p11n)
            n02 = p02n - (g00 * p02n + g01 * p12n)
            n10 = p10n - (g10 * p00n + g11 * p10n)
            n11 = p11n - (g10 * p01n + g11 * p11n)
            n12 = p12n - (g10 * p02n + g11 * p12n)
            n20 = p20n - (g20 * p00n + g21 * p10n)
            n21 = p21n - (g20 * p01n + g21 * p11n)
            n22 = p22n - (g20 * p02n + g21 * p12n)
            d0 = xh0 - xt0
            d1 = xh1 - xt1
            acc = acc + d0 * d0 + d1 * d1
            if nees:
                det_n = n00 * n11 - n01 * n10
                acc_n = acc_n + (n11 * d0 * d0 - (n01 + n10) * d0 * d1
                                 + n00 * d1 * d1) / det_n
            return (xd0, xd1, xd2, xh0, xh1, xh2,
                    n00, n01, n02, n10, n11, n12, n20, n21, n22, acc,
                    acc_n)

        init = tuple(state_in_ref[i * R:(i + 1) * R, :]
                     for i in range(3, 9)) + tuple(
            cov_in_ref[i * R:(i + 1) * R, :] for i in range(9)) + (
                state_in_ref[0:R, :] * 0.0, state_in_ref[0:R, :] * 0.0)
        out = jax.lax.fori_loop(0, STEPS, step, init)
        zero_row = state_in_ref[0:R, :] * 0.0
        for i in range(3):
            state_ref[i * R:(i + 1) * R, :] = zero_row + tbl_ref[STEPS - 1,
                                                                 i]
        for i in range(6):
            state_ref[(i + 3) * R:(i + 4) * R, :] = out[i]
        for i in range(9):
            cov_ref[i * R:(i + 1) * R, :] = out[6 + i]
        err_ref[0:R, :] = out[15]
        err_ref[R:2 * R, :] = out[16]
    return kern


def run(name, **kw):
    cfg = EkfConfig()
    n8 = BATCH // R
    grid = n8 // TILE
    x0 = jnp.asarray(cfg.x0, jnp.float32)
    v, w, dt = cfg.vel, cfg.yaw_rate, cfg.dt

    def _truth(carry, _):
        t0, t1, t2 = carry
        t0 = t0 + v * dt * jnp.cos(t2)
        t1 = t1 + v * dt * jnp.sin(t2)
        t2 = _wrap(t2 + w * dt)
        return (t0, t1, t2), jnp.stack(
            [t0, t1, t2, jnp.cos(t2), jnp.sin(t2)])

    _, tbl = jax.lax.scan(_truth, (x0[0], x0[1], x0[2]), None,
                          length=STEPS)
    kern = make_kernel(cfg, **kw)
    row_spec = pl.BlockSpec((9 * R, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def fn(seed):
        # Inits built INSIDE jit: closed-over host arrays are baked as
        # constants into the remote-compile POST (288 MB -> HTTP 413).
        state0 = jnp.tile(jnp.asarray(cfg.x0, jnp.float32)[:, None],
                          (3, BATCH)).reshape(9 * R, n8)
        p0d = jnp.diag(jnp.square(jnp.asarray(cfg.p0_std, jnp.float32)))
        cov0 = jnp.tile(p0d.reshape(9, 1), (1, BATCH)).reshape(9 * R, n8)
        state, cov, err = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      row_spec, row_spec],
            out_shape=(
                jax.ShapeDtypeStruct((9 * R, n8), jnp.float32),
                jax.ShapeDtypeStruct((9 * R, n8), jnp.float32),
                jax.ShapeDtypeStruct((2 * R, n8), jnp.float32),
            ),
            out_specs=(row_spec, row_spec,
                       pl.BlockSpec((2 * R, TILE), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
        )(jnp.asarray([seed], jnp.int32), tbl, state0, cov0)
        return jnp.sum(err[0])

    dt_s = timed(fn, 1)
    log(f"{name:18s}: {BATCH * STEPS / dt_s:.3e} steps/s "
        f"({dt_s * 1e3:.1f} ms total)")


def main():
    log(f"devices: {jax.devices()}  B={BATCH} steps={STEPS} tile={TILE}")
    run("full")
    run("no-nees", nees=False)
    run("no-noise", noise=False)
    run("no-dr", dr=False)
    run("builtin-trig", poly=False)
    run("algebra-only", noise=False, dr=False, algebra=False)
    run("carry-only", carry_only=True)
    log("ALL DONE")


if __name__ == "__main__":
    main()
