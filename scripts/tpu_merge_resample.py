#!/usr/bin/env python
"""Validate + bench the Pallas merge-resample kernel on the real TPU.

Checks on-device agreement with the XLA decode path (selection is
bit-identical by construction; values go through f32 one-hot MXU
matmuls, so allow tiny tolerance on TPU), then times resample-only and
full fused-rollout paths, hist vs merge, at 100k and 1M particles.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def degenerate_weights(key, n, n_pad, scale):
    """Log-normal-ish weights; scale ~8 gives ESS/N ~ 1% (gate regime)."""
    lw = jax.random.normal(key, (n_pad,), jnp.float32) * scale
    lw = jnp.where(jnp.arange(n_pad) < n, lw, -jnp.inf)
    w = jnp.exp(lw - jnp.max(lw))
    w = w / jnp.sum(w)
    return w[None, :]


def main():
    log(f"devices: {jax.devices()}")
    from tpuslam.ops.resample_pallas import (decode_indices,
                                             merge_resample_rows,
                                             slot_boundaries)

    # ---- on-device exactness at 100k ----------------------------------
    n = 100_000
    n_pad = -(-n // 2048) * 2048
    key = jax.random.key(0)
    w_row = degenerate_weights(jax.random.fold_in(key, 1), n, n_pad, 8.0)
    ess = float(1.0 / jnp.sum(jnp.square(w_row)))
    log(f"check weights: ESS={ess:.1f} ({ess/n*100:.2f}% of N)")
    p = jax.random.normal(jax.random.fold_in(key, 2), (3, n_pad),
                          jnp.float32)
    kr = jax.random.fold_in(key, 3)

    out = merge_resample_rows(kr, p, w_row, n)

    @jax.jit
    def oracle(kr, p, w_row):
        offs = jax.random.uniform(kr, dtype=jnp.float32)
        idx = decode_indices(slot_boundaries(w_row, n, offs), n)
        return jnp.zeros_like(p).at[:, :n].set(p[:, :n][:, idx])

    ref = oracle(kr, p, w_row)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    log(f"on-device vs decode: max|d|={d.max():.3e} "
        f"mismatched={(d > 0).sum()}")
    assert d.max() < 1e-5, "merge kernel disagrees with decode on TPU"

    # also exercise survivor-dense fallback on device
    w_u = jnp.where(jnp.arange(n_pad) < n, 1.0 / n, 0.0)[None, :]
    out_u = merge_resample_rows(kr, p, w_u, n)
    ref_u = oracle(kr, p, w_u)
    du = np.abs(np.asarray(out_u) - np.asarray(ref_u))
    log(f"fallback (uniform w) vs decode: max|d|={du.max():.3e}")
    assert du.max() == 0.0

    # ---- resample-only latency ----------------------------------------
    from tpuslam.filters.pf import resample_indices

    for nn, scale in ((100_000, 8.0), (1_000_000, 8.0),
                      (1_000_000, 3.2)):
        npad = -(-nn // 2048) * 2048
        wr = degenerate_weights(jax.random.fold_in(key, 10), nn, npad,
                                scale)
        t0 = np.asarray(jnp.cumsum(wr[0]) * nn)
        surv = int((np.ceil(t0[1:]) > np.ceil(t0[:-1])).sum())
        print(f"# N={nn} scale={scale}: survivors~{surv} "
              f"({surv/nn*100:.1f}%)", flush=True)
        pp = jax.random.normal(jax.random.fold_in(key, 11), (3, npad),
                               jnp.float32)
        steps = 20

        @jax.jit
        def hist_only(k0):
            def body(p, k):
                w = wr[0, :nn]
                idx = resample_indices(k, w, method="hist")
                p2 = jnp.zeros_like(p).at[:, :nn].set(p[:, :nn][:, idx])
                return p2, None
            p, _ = jax.lax.scan(body, pp, jax.random.split(k0, steps))
            return jnp.sum(p)

        @jax.jit
        def merge_only(k0):
            def body(p, k):
                return merge_resample_rows(k, p, wr, nn), None
            p, _ = jax.lax.scan(body, pp, jax.random.split(k0, steps))
            return jnp.sum(p)

        dt_h = timed(hist_only, jax.random.key(5))
        log(f"N={nn}: hist resample  {dt_h/steps*1e3:.3f} ms")
        dt_m = timed(merge_only, jax.random.key(5))
        log(f"N={nn}: merge resample {dt_m/steps*1e3:.3f} ms "
            f"({dt_h/dt_m:.2f}x)")

    # ---- full fused rollout, hist vs merge ----------------------------
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout

    for nn in (100_000, 1_000_000):
        for method in ("hist", "merge"):
            cfg = PfConfig(num_particles=nn, weight_mode="log",
                           resample_method=method)

            @jax.jit
            def roll(k):
                final, _ = pf_fused_rollout(cfg, k, 100)
                return jnp.sum(final.particles) + jnp.sum(final.weights)

            dt = timed(roll, jax.random.key(0))
            log(f"N={nn} fused rollout [{method}]: "
                f"{nn*100/dt:.3e} p-steps/s ({dt/100*1e3:.3f} ms/step)")

    log("ALL DONE")


if __name__ == "__main__":
    main()
