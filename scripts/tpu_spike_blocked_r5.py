#!/usr/bin/env python
"""Round 5: does the blocked (closed-form 3x3) batched inverse unlock
the partitioned Thomas factor at 1M poses?

STATUS round 5 floor statement: <1 s at 1M "requires an XLA
batched-Cholesky lowering that vectorizes over batch inside scans (the
SPIKE factor then runs at ~N/C depth and the whole solve lands at
~0.6 s)".  tridiag._batched_inv_spd_blocked IS that lowering, written
by hand: closed-form 3x3 Cholesky chains + panel dot_generals, no
lax.linalg.  This script measures the partitioned factor across C with
inv_impl="blocked" vs the sequential factor on the real chip, same 1M
system as scripts/tpu_graph1m_phases_r5.py.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_POSES = int(os.environ.get("N_POSES", 1_000_000))
PARTS = tuple(int(p) for p in
              os.environ.get("PARTS", "32,128,512").split(","))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *a, reps=3):
    def fence(r):
        float(jax.tree.leaves(r)[0].ravel()[0])

    fence(fn(*a))
    ts = []
    r = None
    for _ in range(reps):
        r = None
        t0 = time.perf_counter()
        r = fn(*a)
        fence(r)
        ts.append(time.perf_counter() - t0)
    r = None
    return min(ts)


def main():
    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)
    from tpuslam.slam.large import (add_odometry_chain_flat,
                                    assemble_banded_flat,
                                    build_edge_blocks)
    from tpuslam.slam.tridiag import (banded_factor_tridiag_flat,
                                      banded_resolve_tridiag_flat)

    n_lm, window = 100, 40
    log(f"devices: {jax.devices()}  N={N_POSES}  parts={PARTS}")
    cache = f"/tmp/spike_h1m_{N_POSES}"
    if os.path.exists(cache + "_h.npy"):
        t0 = time.perf_counter()
        h_flat = jnp.asarray(np.load(cache + "_h.npy"))
        b_flat = jnp.asarray(np.load(cache + "_b.npy"))
        log(f"loaded cached system in {time.perf_counter()-t0:.1f}s")
    else:
        cfg = GraphConfig(
            max_times=N_POSES, num_landmarks=n_lm, max_gn_iters=10,
            scan=ScanConfig(range_m=15.0,
                            angle_rad=math.radians(80.0),
                            dist_gain=0.05,
                            dir_sigma=math.radians(2.0),
                            orient_sigma=math.radians(2.0)),
            exact_jacobians=True)
        t0 = time.perf_counter()
        pt, po, obs = make_large_scene(cfg, jax.random.key(0), N_POSES,
                                       n_lm, radius=0.05 * N_POSES,
                                       odom_noise=0.1,
                                       scan_chunk=10_000)
        el = window_pairs(np.asarray(obs.valid), window=window)
        log(f"scene + {el.t_b.shape[0]} edges in "
            f"{time.perf_counter()-t0:.1f}s")
        rel_odom = po[1:] - po[:-1]
        rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

        @jax.jit
        def assemble(p, obs, el, rel_odom):
            blocks = build_edge_blocks(cfg, p, obs, el, omega_poses=p)
            h_flat, b_flat, kept = assemble_banded_flat(
                cfg, blocks, el, N_POSES, window)
            h_flat, b_flat = add_odometry_chain_flat(
                h_flat, b_flat, p, rel_odom, (100.0, 100.0, 100.0))
            return h_flat, b_flat

        h_flat, b_flat = assemble(po, obs, el, rel_odom)
        float(h_flat.ravel()[0])
        del obs, el, po, pt, rel_odom
        np.save(cache + "_h.npy", np.asarray(h_flat))
        np.save(cache + "_b.npy", np.asarray(b_flat))
        log("cached system to /tmp")

    resolve = jax.jit(
        lambda f, b: banded_resolve_tridiag_flat(f, -b, window))

    factor = jax.jit(lambda h: banded_factor_tridiag_flat(h, window))
    dt = timed(factor, h_flat)
    log(f"sequential factor: {dt:.3f} s")
    fac = factor(h_flat)
    dt = timed(resolve, fac, b_flat)
    log(f"sequential resolve: {dt:.3f} s")
    x_seq = resolve(fac, b_flat)
    del fac

    for n_parts in PARTS:
        try:
            factor_p = jax.jit(lambda h: banded_factor_tridiag_flat(
                h, window, n_parts=n_parts))
            t0 = time.perf_counter()
            # timed() keeps at most ONE factor alive at a time (two
            # 4.3 GB factors + the 1.5 GB system OOM HBM at 1M).
            dt = timed(factor_p, h_flat)
            log(f"  C={n_parts} warm+3 reps in "
                f"{time.perf_counter()-t0:.1f} s wall")
            fac_p = factor_p(h_flat)
            dt2 = timed(resolve, fac_p, b_flat)
            x_par = resolve(fac_p, b_flat)
            err = float(jnp.max(jnp.abs(x_par - x_seq)))
            scale = float(jnp.max(jnp.abs(x_seq)))
            log(f"partitioned-blocked C={n_parts}: factor {dt:.3f} s, "
                f"resolve {dt2:.3f} s, max|dx| vs sequential {err:.2e} "
                f"(scale {scale:.2e})")
            del fac_p, x_par
        except Exception as e:
            log(f"partitioned-blocked C={n_parts} FAILED: "
                f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
