#!/usr/bin/env python
"""Phase split of the 1M-pose solve (VERDICT r4 item 5).

BENCH_r04: 1.393 s end-to-end at 1M poses / 77k edges, 4 GN iters,
factor-reuse.  This script times the phases separately on the real chip
so the <1 s attack targets the right one:

  assemble   build_edge_blocks + assemble_banded_flat + odometry chain
  factor     pad + Jacobi prescale + super-block densify + Thomas factor
  resolve    one rhs substitution (the per-GN-iteration cost after the
             first; the sweep measured 0.183 s/GN iter INCLUDING
             relinearize+assemble per iteration)
  e2e        graph_solve_banded with the bench flags (reference point)
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *a, reps=3):
    def fence(r):
        # transfer-fence: pull one scalar (block_until_ready is a no-op
        # through the tunnel)
        float(jax.tree.leaves(r)[0].ravel()[0])

    fence(fn(*a))
    ts = []
    r = None
    for _ in range(reps):
        r = None  # never hold two multi-GB results at once
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
    cfg = GraphConfig(
        max_times=N_POSES, num_landmarks=n_lm, max_gn_iters=10,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    log(f"devices: {jax.devices()}  N={N_POSES}")
    t0 = time.perf_counter()
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), N_POSES,
                                   n_lm, radius=0.05 * N_POSES,
                                   odom_noise=0.1, scan_chunk=10_000)
    el = window_pairs(np.asarray(obs.valid), window=window)
    log(f"scene + {el.t_b.shape[0]} edges in {time.perf_counter()-t0:.1f}s")
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    # Big tensors ride as jit ARGUMENTS: closed-over arrays are baked
    # into the program as constants and shipped with the remote-compile
    # POST (bench.py learned this the hard way at 100k+ scale).
    @jax.jit
    def assemble(p, obs, el, rel_odom):
        blocks = build_edge_blocks(cfg, p, obs, el, omega_poses=p)
        h_flat, b_flat, kept = assemble_banded_flat(cfg, blocks, el,
                                                    N_POSES, window)
        h_flat, b_flat = add_odometry_chain_flat(
            h_flat, b_flat, p, rel_odom, (100.0, 100.0, 100.0))
        return h_flat, b_flat

    dt = timed(assemble, po, obs, el, rel_odom)
    log(f"assemble: {dt:.3f} s")
    h_flat, b_flat = assemble(po, obs, el, rel_odom)

    def e2e(p, obs, el, rel_odom):
        res = graph_solve_banded(cfg, p, obs, el, band=window,
                                 rel_odom=rel_odom,
                                 odom_info=(100.0, 100.0, 100.0),
                                 solver="tridiag", stall_ratio=0.5,
                                 delta_tol=1e-6 * N_POSES)
        return res.delta_sum, res.gn_iters

    jfn = jax.jit(e2e)
    s, it = jfn(po, obs, el, rel_odom)
    float(s)
    t0 = time.perf_counter()
    s, it = jfn(po, obs, el, rel_odom)
    float(s)
    log(f"e2e graph_solve_banded: {time.perf_counter()-t0:.3f} s "
        f"({int(it)} GN iters)")

    # Free the scene before the factor phases: obs (~1.3 GB) + the
    # factor's diag/upper temps + two live factors would overflow HBM.
    del obs, el, po, pt, rel_odom, s, it
    jfn = None

    factor = jax.jit(lambda h: banded_factor_tridiag_flat(h, window))
    dt = timed(factor, h_flat)
    log(f"factor (prescale + densify + Thomas factor): {dt:.3f} s")
    fac = factor(h_flat)

    resolve = jax.jit(
        lambda f, b: banded_resolve_tridiag_flat(f, -b, window))
    dt = timed(resolve, fac, b_flat)
    log(f"resolve (one rhs substitution): {dt:.3f} s")
    x_seq = resolve(fac, b_flat)
    del fac

    # Partitioned (single-chip SPIKE): depth N/S/C batched chunks.
    for n_parts in (8, 32, 128):
        factor_p = jax.jit(lambda h: banded_factor_tridiag_flat(
            h, window, n_parts=n_parts))
        dt = timed(factor_p, h_flat)
        fac_p = factor_p(h_flat)
        dt2 = timed(resolve, fac_p, b_flat)
        x_par = resolve(fac_p, b_flat)
        err = float(jnp.max(jnp.abs(x_par - x_seq)))
        scale = float(jnp.max(jnp.abs(x_seq)))
        log(f"partitioned C={n_parts}: factor {dt:.3f} s, resolve "
            f"{dt2:.3f} s, max|dx| vs sequential {err:.2e} "
            f"(scale {scale:.2e})")
        del fac_p


if __name__ == "__main__":
    main()
