#!/usr/bin/env python
"""Validate + measure the fused EKF rollout with the sublane-packed
carry (sub_rows=8) vs the flat carry on the real chip.

The kernel is pure lane-elementwise VPU work; the flat (1, tile) rows
run every vector op at 1/8 f32-sublane occupancy, so packing each state
variable into an (8, B/8) plane should approach 8x arithmetic
throughput at identical vreg pressure (same trick measured 2.5-3.2x on
the PF stats kernel, scripts/tpu_pf_profile4.py).

Sweeps tile_b for the packed layout (the per-tile carry footprint is
17 rows x (R, tile_b); smaller tiles cut vreg spill pressure), then
times the bench headline shapes (2M / 8M x 400) both ways.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run(batch, steps, sub_rows, tile_b, label, reps=3):
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_rollout

    cfg = EkfConfig()

    def fn(seed):
        final, err = ekf_fused_rollout(cfg, seed, batch=batch,
                                       n_steps=steps, tile_b=tile_b,
                                       sub_rows=sub_rows)
        return jnp.sum(err)

    jfn = jax.jit(fn, static_argnums=())
    sse = float(jfn(1))  # compile + warm
    rmse = (sse / batch / steps) ** 0.5
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(1))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    log(f"{label:34s}: {dt*1e3:8.1f} ms  "
        f"({batch*steps/dt:.3e} steps/s)  rmse={rmse:.3f}")
    if not (0.02 < rmse < 2.0):
        log(f"  !! RMSE {rmse} out of range")
    return batch * steps / dt


def main():
    log(f"device: {jax.devices()[0]}")

    # Tile sweep at 2M x 400 packed.
    b, steps = 2 * 1024 * 1024, 400
    for tile in (512, 1024, 2048, 4096):
        run(b, steps, 8, tile, f"2M x400 packed R=8 tile={tile}")
    run(b, steps, 1, 2048, "2M x400 flat   R=1 tile=2048")

    # Headline shape: 8M x 400.
    b = 8 * 1024 * 1024
    best = 0.0
    for tile in (1024, 2048):
        best = max(best, run(b, steps, 8, tile,
                             f"8M x400 packed R=8 tile={tile}"))
    flat = run(b, steps, 1, 2048, "8M x400 flat   R=1 tile=2048")
    log(f"packed/flat at 8M: {best/flat:.2f}x")

    # Latency-bound sweep config (64 x 8192 in one program).
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_sweeps

    cfg = EkfConfig()

    def sw(seed):
        _, rmse = ekf_fused_sweeps(cfg, seed, n_sweeps=64, batch=8192,
                                   n_steps=400)
        return jnp.sum(rmse)

    float(sw(1))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(sw(1))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    log(f"{'64x8192 sweeps (auto pack)':34s}: {dt*1e3:8.1f} ms  "
        f"({64*8192*400/dt:.3e} steps/s)")


if __name__ == "__main__":
    main()
