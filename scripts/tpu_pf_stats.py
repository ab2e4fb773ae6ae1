#!/usr/bin/env python
"""TPU validation of the stats-fused PF kernel (one serial process).

Run detached:  nohup python scripts/tpu_pf_stats.py > /tmp/pf_stats.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")

    from tpuslam.filters import PfConfig
    from tpuslam.ops import (pf_fused_predict_weight,
                             pf_fused_predict_weight_stats,
                             pf_fused_rollout)

    # --- numeric check vs the plain kernel + XLA reductions on TPU -----
    rng = np.random.default_rng(0)
    n = 4096
    cfg = PfConfig(num_particles=n, weight_mode="log")
    particles = jnp.asarray(rng.normal(size=(n, 3)) * 0.3
                            + np.array([10.0, 0.0, np.pi / 2]), jnp.float32)
    log_w = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(5, 2)) + [0.0, 10.0], jnp.float32)
    p2, lw2, stats = pf_fused_predict_weight_stats(
        cfg, 0, 0.0, particles, log_w, z, tile_n=1024, noise_on=False)
    p_ref, lw_ref = pf_fused_predict_weight(
        cfg, 0, particles, log_w, z, tile_n=1024, noise_on=False)
    err_p = float(jnp.max(jnp.abs(p2 - p_ref)))
    err_lw = float(jnp.max(jnp.abs(lw2 - lw_ref)))
    lse = float(jax.scipy.special.logsumexp(lw2))
    lse2 = float(jax.scipy.special.logsumexp(2.0 * lw2))
    idx = int(jnp.argmax(lw2))
    log(f"particles max|d|={err_p:.2e} lw max|d|={err_lw:.2e}")
    log(f"lse: kernel={float(stats[0]):.6f} xla={lse:.6f}")
    log(f"lse2: kernel={float(stats[1]):.6f} xla={lse2:.6f}")
    log(f"map: kernel={np.asarray(stats[2:5])} xla={np.asarray(p2[idx])}")
    ok = (err_p < 1e-5 and err_lw < 1e-4
          and abs(float(stats[0]) - lse) < 1e-3
          and abs(float(stats[1]) - lse2) < 1e-3
          and np.allclose(np.asarray(stats[2:5]), np.asarray(p2[idx]),
                          atol=1e-5))
    log(f"numeric check: {'OK' if ok else 'MISMATCH'}")

    # --- rollout throughput at 100k and 1M particles --------------------
    for np_count, steps in ((100_000, 100), (1_000_000, 100)):
        cfg = PfConfig(num_particles=np_count, weight_mode="log",
                       resample_method="hist")

        @jax.jit
        def fused(k):
            final, (xt, xe) = pf_fused_rollout(cfg, k, steps)
            return jnp.sum(jnp.square(xe[:, :2] - xt[:, :2])) / steps

        t0 = time.time()
        mse = float(fused(jax.random.key(0)))
        log(f"NP={np_count}: compile+first {time.time() - t0:.1f}s "
            f"rmse={mse ** 0.5:.3f}")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fused(jax.random.key(1)))
            ts.append(time.perf_counter() - t0)
        log(f"NP={np_count}: {np_count * steps / min(ts):.3e} "
            f"particle-steps/s  (step={min(ts)/steps*1e3:.3f} ms)")

    log("ALL DONE")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
