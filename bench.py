#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): batched EKF-SLAM sim steps/sec on one
chip, target >= 1e6.  ``vs_baseline`` is the ratio against that target.
Secondary numbers (PF particle-step throughput, graph-SLAM solve latency)
go to stderr so stdout stays a single JSON line for the driver.

Timing note: each benchmarked function returns a SCALAR which is pulled to
the host inside the timed region - on this image's remote-tunneled TPU
platform ``block_until_ready`` returns before execution completes, so a
device->host transfer is the only reliable completion fence.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from tpuslam.utils import roofline


def _time_scalar(fn, *args, reps=5):
    """Median wall time of float(fn(*args)) - transfer-fenced."""
    float(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def bench_ekf_scan(batch=8192, steps=400):
    """XLA lax.scan path."""
    from tpuslam.filters import EkfConfig, ekf_rollout_batch

    cfg = EkfConfig()
    keys = jax.random.split(jax.random.key(0), batch)

    @jax.jit
    def fn(k):
        final, _ = ekf_rollout_batch(cfg, k, steps)
        return jnp.sum(final.x_hat) + jnp.sum(final.cov)

    dt = _time_scalar(fn, keys)
    return batch * steps / dt


def bench_ekf_pallas(batch=8388608, steps=1600):
    """Fused Pallas kernel path (the framework's fast path).

    8M rollouts x sublane-packed carry (sub_rows=8 auto) x tile 1024 is
    the measured throughput peak on one v5e chip
    (scripts/tpu_ekf_packed_validate.py: 9.0e9 steps/s vs 3.0e9 for the
    flat carry; packing each state variable into an (8, B/8) plane runs
    the VPU at full f32 sublane occupancy).  1600 steps amortize this
    platform's ~25 ms per-jit-call dispatch (7% of wall at 400 steps -
    measured, scripts/tpu_pf_ablate_r4h.py) to under 2%: the number is
    the kernel's steady-state throughput, not the tunnel's."""
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_rollout

    cfg = EkfConfig()

    def fn(seed):
        final, err = ekf_fused_rollout(cfg, seed, batch=batch,
                                       n_steps=steps, tile_b=1024)
        return jnp.sum(err)

    dt = _time_scalar(fn, 1)
    return batch * steps / dt


def bench_ekf_sweeps(n_sweeps=64, batch=8192, steps=400):
    """Latency-bound BASELINE config (8192 rollouts) amortized: K sweeps
    in ONE program (ops/ekf_pallas.py::ekf_fused_sweeps) so the ~25 ms
    per-call tunnel dispatch is paid once, not per sweep."""
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_sweeps

    cfg = EkfConfig()

    def fn(seed):
        _, rmse = ekf_fused_sweeps(cfg, seed, n_sweeps=n_sweeps,
                                   batch=batch, n_steps=steps)
        return jnp.sum(rmse)

    dt = _time_scalar(fn, 1)
    return n_sweeps * batch * steps / dt


def bench_pf(particles=100_000, steps=100):
    from tpuslam.filters import PfConfig, pf_rollout

    cfg = PfConfig(num_particles=particles, weight_mode="log")

    @jax.jit
    def fn(k):
        final, _ = pf_rollout(cfg, k, steps)
        return jnp.sum(final.particles) + jnp.sum(final.weights)

    dt = _time_scalar(fn, jax.random.key(0))
    return particles * steps / dt


def bench_pf_pallas(particles=100_000, steps=400, resample="merge"):
    """400 steps amortize the ~25 ms/call tunnel dispatch (at 100k
    particles a 100-step call was ~90% dispatch; see
    scripts/tpu_pf_ablate_r4h.py and STATUS.md round 4b)."""
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_fused_rollout

    cfg = PfConfig(num_particles=particles, weight_mode="log",
                   resample_method=resample)

    @jax.jit
    def fn(k):
        final, _ = pf_fused_rollout(cfg, k, steps)
        return jnp.sum(final.particles) + jnp.sum(final.weights)

    dt = _time_scalar(fn, jax.random.key(0))
    return particles * steps / dt


def bench_pf_batch(batch=1024, particles=1000, steps=400):
    """B independent reference-scale filters, one per kernel tile
    (in-tile resample; ops/pf_batch_pallas.py).  400 steps amortize the
    ~25 ms/call tunnel dispatch (STATUS.md round 4b)."""
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_rollout

    cfg = PfConfig(num_particles=particles, weight_mode="log")

    @jax.jit
    def fn(k):
        final, outs = pf_batch_rollout(cfg, k, batch=batch,
                                       n_steps=steps)
        return jnp.sum(final.particles) + jnp.sum(outs.x_est)

    dt = _time_scalar(fn, jax.random.key(0), reps=3)
    return batch * particles * steps / dt


def bench_pf_batch_wide(batch=128, particles=10_000, steps=100):
    """B reference-style filters at 10k particles each, multiple kernel
    tiles per filter (ops/pf_batch_pallas.py wide path).  The flagship
    1024-filter call uses 400 steps to amortize the ~25 ms/call tunnel
    dispatch (scripts/tpu_pf_ablate_r4h.py) below 1%."""
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_wide_rollout

    cfg = PfConfig(num_particles=particles, weight_mode="log")

    @jax.jit
    def fn(k):
        final, outs = pf_batch_wide_rollout(cfg, k, batch=batch,
                                            n_steps=steps)
        return jnp.sum(final.particles) + jnp.sum(outs.x_est)

    dt = _time_scalar(fn, jax.random.key(0), reps=3)
    return batch * particles * steps / dt


def bench_graph(n_steps=18, guard="full"):
    """The reference demo course itself: 18 frames, per-frame GN
    re-estimation of the whole trajectory (graph_based_slam.py runs this
    at 0.5 Hz = 36 s wall).

    ``guard="full"`` matches reference semantics (true det + SVD cond
    every updateEstPose, graph_based_slam.py:494-495); "cheap" uses
    slogdet + a diagonal bound (reported separately).
    """
    from tpuslam.slam import (SlamSceneConfig, reference_course_config,
                              slam_rollout)

    cfg = reference_course_config(n_steps, guard=guard)
    scene = SlamSceneConfig()

    @jax.jit
    def fn(k):
        traj, poses_est, frames = slam_rollout(scene, cfg, k, n_steps)
        return jnp.sum(poses_est) + jnp.sum(frames.delta_sum)

    dt = _time_scalar(fn, jax.random.key(0))
    return dt


def bench_graph_large(n_poses=10000, n_landmarks=1000, window=40,
                      scan_chunk=None, radius_frac=0.3, n_parts=None):
    """BASELINE config 5 and its scale-ups: banded solve latency.

    Defaults = the 10k-pose / 1k-landmark BASELINE config; the flagship
    scale-ups reuse it with ``scan_chunk`` (the scan's (chunk, L, 2)
    intermediates exhaust HBM past ~1e8 pose-landmark pairs) and the
    geometry of scripts/tpu_100k_solve.py / tpu_graph_1m.py.
    """
    import math

    import numpy as np

    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    cfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_landmarks, max_gn_iters=10,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses,
                                   n_landmarks,
                                   radius=radius_frac * n_poses,
                                   odom_noise=0.1, scan_chunk=scan_chunk)
    el = window_pairs(np.asarray(obs.valid), window=window)
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    # Big tensors ride as jit ARGUMENTS: closed-over arrays are baked
    # into the program as constants and shipped with the remote-compile
    # POST (breaks the tunnel at 100k+ scale, wasteful here).
    def fn(p, obs, el, rel_odom):
        # tridiag + auto factor-reuse (exact Jacobians + frozen Omega ->
        # H constant: factor once, substitute per GN iteration) +
        # stall stop at the f32 refinement floor.
        res = graph_solve_banded(cfg, p, obs, el, band=window,
                                 rel_odom=rel_odom,
                                 odom_info=(100.0, 100.0, 100.0),
                                 solver="tridiag", stall_ratio=0.5,
                                 delta_tol=1e-6 * n_poses,
                                 n_parts=n_parts)
        return jnp.sum(res.poses) + res.delta_sum, res.gn_iters

    jfn = jax.jit(fn)
    iters_box = [0]

    def scalar_call(*a):  # one compiled program; iters rides along
        s, it = jfn(*a)
        iters_box[0] = int(it)
        return s

    dt = _time_scalar(scalar_call, po, obs, el, rel_odom, reps=3)
    return dt, el.t_b.shape[0], iters_box[0], n_poses


# ---------------------------------------------------------------------------
# On-chip parity gates (VERDICT r4 item 1): cheap correctness asserts that
# run on the REAL device before the throughput benches, so the captured
# BENCH output itself certifies kernel correctness (SURVEY.md §4.5's golden
# regression applied to hardware).  Every check prints one "# parity: OK"
# line; any failure raises and the bench exits rc != 0.  The pytest suite
# only ever exercises kernels in CPU interpret mode - a Mosaic lowering
# that made a kernel fast-but-wrong on hardware is exactly what these
# catch.
# ---------------------------------------------------------------------------

def parity_ekf_noise_free():
    """Fused EKF kernel vs the XLA scan oracle, noise off: the kernel's
    state recursion (trig, 3x3 covariance chain, gain solve) must
    reproduce the scan path on hardware, not just under interpret mode."""
    import numpy as np

    from tpuslam.filters import EkfConfig, ekf_init, ekf_step_with_noise
    from tpuslam.ops import ekf_fused_rollout

    cfg = EkfConfig()
    steps = 50
    final, err = jax.jit(lambda: ekf_fused_rollout(
        cfg, 0, batch=1024, n_steps=steps, tile_b=1024,
        noise_on=False))()

    @jax.jit
    def oracle():
        def body(s, _):
            s, _ = ekf_step_with_noise(cfg, s, jnp.zeros(2), jnp.zeros(3))
            return s, None
        s, _ = jax.lax.scan(body, ekf_init(cfg), None, length=steps)
        return s

    ref = oracle()
    for name, got, want in (("x_hat", final.x_hat[0], ref.x_hat),
                            ("x_true", final.x_true[0], ref.x_true),
                            ("cov", final.cov[0], ref.cov)):
        g, w = np.asarray(got), np.asarray(want)
        assert np.allclose(g, w, atol=1e-4), (
            f"EKF fused {name} diverges from XLA scan on-chip: "
            f"{g} vs {w}")
    assert float(jnp.max(jnp.abs(err))) < 1e-6
    print("# parity: OK ekf_fused noise-free == XLA scan "
          f"({steps} steps, atol 1e-4)", file=sys.stderr)


def parity_ekf_noise_bands():
    """Noise ON: on-core PRNG + polynomial sincos produce a filter whose
    RMSE and NEES sit in the live-reference distributional bands
    (tests/fixtures/ref_distributions.json: rmse 0.360+-0.056,
    nees 1.18+-0.35 over 100 reference seeds)."""
    from tpuslam.filters import EkfConfig
    from tpuslam.ops import ekf_fused_rollout

    cfg = EkfConfig()
    steps = 400
    final, err, nees = jax.jit(lambda: ekf_fused_rollout(
        cfg, 12345, batch=8192, n_steps=steps, tile_b=1024,
        with_nees=True))()
    rmse = float(jnp.mean(jnp.sqrt(err / steps)))
    mean_nees = float(jnp.mean(nees / steps))
    assert 0.25 < rmse < 0.50, f"EKF fused on-chip RMSE {rmse} off-band"
    assert 0.7 < mean_nees < 2.5, (
        f"EKF fused on-chip NEES {mean_nees} off-band")
    print(f"# parity: OK ekf_fused noise bands (rmse {rmse:.3f} in "
          f"[0.25,0.50], nees {mean_nees:.2f} in [0.7,2.5])",
          file=sys.stderr)


def parity_merge_resample():
    """Pallas merge-resample selection bit-equal to the hist decode ON
    CHIP at 64k particles - including the t_k_small->t_k cap-overflow
    tier and the bf16 Veltkamp-split value reconstruction, whose
    real-Mosaic behavior interpret mode cannot certify."""
    import numpy as np

    from tpuslam.filters.pf import resample_indices
    from tpuslam.ops import merge_resample_rows

    n = n_pad = 65536
    key = jax.random.key(99)
    kp, kw = jax.random.split(key)
    p_rows = jax.random.normal(kp, (3, n_pad), jnp.float32)

    # Profile A: heavy-tailed weights (the post-gate regime; survivor
    # counts land under t_k_small -> small tier).
    lw = 4.0 * jax.random.normal(kw, (n_pad,))
    w_a = jax.nn.softmax(lw)[None, :]
    # Profile B: tile 0 holds 400 equal-weight survivors (> t_k_small
    # 256, <= t_k 512 -> exercises the kernel-speed overflow re-run),
    # plus 128 per other tile.
    wb = np.zeros(n_pad, np.float32)
    wb[:400] = 1.0
    for j in range(1, n_pad // 2048):
        wb[j * 2048:j * 2048 + 128] = 1.0
    w_b = jnp.asarray(wb / wb.sum())[None, :]

    @jax.jit
    def run(w_row):
        out = merge_resample_rows(key, p_rows, w_row, n)
        idx = resample_indices(key, w_row[0], method="hist")
        ref = p_rows[:, idx]
        return out, ref

    for name, w_row in (("heavy-tail", w_a), ("cap-overflow", w_b)):
        out, ref = run(w_row)
        same = bool(jnp.all(out == ref))
        assert same, (
            f"merge resample != hist decode on-chip ({name} profile)")
    print("# parity: OK merge_resample bit == hist decode on-chip "
          "(64k, heavy-tail + t_k overflow tiers)", file=sys.stderr)


def parity_graph_solvers():
    """Banded solve: tridiag (production) poses within tolerance of the
    independent CG path, both on-chip, and both beat odometry.  4k poses
    keeps the two solver compiles + the CG run inside the gate budget
    (the 10k configs are benched below; solver algebra is scale-free)."""
    import math

    import numpy as np

    from tpuslam.core.angles import wrap_angle
    from tpuslam.models.scan_sensor import ScanConfig
    from tpuslam.slam import (GraphConfig, graph_solve_banded,
                              make_large_scene, window_pairs)

    n_poses, n_lm, window = 4096, 512, 40
    cfg = GraphConfig(
        max_times=n_poses, num_landmarks=n_lm, max_gn_iters=10,
        scan=ScanConfig(range_m=15.0, angle_rad=math.radians(80.0),
                        dist_gain=0.05, dir_sigma=math.radians(2.0),
                        orient_sigma=math.radians(2.0)),
        exact_jacobians=True)
    # radius 0.05*n (the tpu_verify_quick geometry): landmark sightings
    # dense relative to the course, so the solve corrects global drift
    # and the "beats odometry by 2x" bound below is meaningful.  (The
    # bench's BASELINE geometry, radius 0.3*n, spreads sightings so thin
    # that odometry RMSE is dominated by uncorrectable global drift.)
    pt, po, obs = make_large_scene(cfg, jax.random.key(0), n_poses, n_lm,
                                   radius=0.05 * n_poses, odom_noise=0.1)
    el = window_pairs(np.asarray(obs.valid), window=window)
    rel_odom = po[1:] - po[:-1]
    rel_odom = rel_odom.at[:, 2].set(wrap_angle(rel_odom[:, 2]))

    # --- cross-solver check on ONE assembled linear system ------------
    # Post-GN poses are a fragile comparison (CG's stall stop can end GN
    # at a different iterate with similar rmse); the kernel-correctness
    # claim is about the LINEAR solvers, so assemble H,b once and check
    # tridiag/CR (direct, must agree tightly) + CG (iterative, residual
    # gate) against the independent flat matvec.
    from tpuslam.slam.cyclic import banded_solve_cr_flat
    from tpuslam.slam.large import (add_odometry_chain_flat,
                                    assemble_banded_flat,
                                    build_edge_blocks, cg_solve_flat,
                                    make_banded_matvec_flat)
    from tpuslam.slam.tridiag import banded_solve_tridiag_flat

    @jax.jit
    def solvers():
        blocks = build_edge_blocks(cfg, po, obs, el, omega_poses=po)
        h_flat, b_flat, kept = assemble_banded_flat(cfg, blocks, el,
                                                    n_poses, window)
        h_flat, b_flat = add_odometry_chain_flat(
            h_flat, b_flat, po, rel_odom, (100.0, 100.0, 100.0))
        d_t = banded_solve_tridiag_flat(h_flat, -b_flat, window)
        d_r = banded_solve_cr_flat(h_flat, -b_flat, window)
        d_c, _ = cg_solve_flat(h_flat, -b_flat, window, 400, 1e-10)
        mv = make_banded_matvec_flat(h_flat, window)

        def relres(x):
            r = mv(x.T) + b_flat
            return jnp.sqrt(jnp.sum(r * r) / jnp.sum(b_flat * b_flat))

        scale = jnp.max(jnp.abs(d_t))
        return (jnp.max(jnp.abs(d_t - d_r)) / scale,
                jnp.max(jnp.abs(d_t - d_c)) / scale,
                relres(d_t), relres(d_r), relres(d_c), d_t)

    dtr, dtc, r_t, r_r, r_c, d_t = solvers()
    assert float(dtr) < 1e-3, (
        f"tridiag vs CR direct solves diverge on-chip: {float(dtr)}")
    assert float(r_t) < 1e-3 and float(r_r) < 1e-3, (
        f"direct-solver residuals off: tridiag {float(r_t)}, "
        f"cr {float(r_r)}")
    assert float(r_c) < 1e-2, f"CG residual off: {float(r_c)}"
    # Solution-space distance between CG and the direct solve is bounded
    # only by cond(H) * relres (measured ~0.16 on this system) - the
    # residual above is the honest CG gate; this catches gross layout /
    # sign bugs only.
    assert float(dtc) < 0.5, (
        f"tridiag vs CG solutions diverge: {float(dtc)}")

    # --- and the full GN course still beats odometry ------------------
    res = jax.jit(lambda: graph_solve_banded(
        cfg, po, obs, el, band=window, rel_odom=rel_odom,
        odom_info=(100.0, 100.0, 100.0), solver="tridiag",
        stall_ratio=0.5, delta_tol=1e-6 * n_poses))()
    err_t = float(jnp.sqrt(jnp.mean(
        jnp.sum((res.poses[:, :2] - pt[:, :2]) ** 2, -1))))
    err_o = float(jnp.sqrt(jnp.mean(
        jnp.sum((po[:, :2] - pt[:, :2]) ** 2, -1))))
    assert err_t < 0.5 * err_o, (
        f"{n_poses} solve rmse {err_t} not beating odometry {err_o}")
    print(f"# parity: OK graph {n_poses} solvers on-chip (tridiag==cr "
          f"{float(dtr):.1e}, vs cg {float(dtc):.1e}, relres "
          f"{float(r_t):.1e}/{float(r_r):.1e}/{float(r_c):.1e}; GN rmse "
          f"{err_t:.3f} vs odom {err_o:.3f})", file=sys.stderr)


def parity_pf_bands():
    """Fused / batched / wide PF kernels with noise + resample ON track
    the truth inside reference-derived RMSE bands on-chip."""
    from tpuslam.filters import PfConfig
    from tpuslam.ops import (pf_batch_rollout, pf_batch_wide_rollout,
                             pf_fused_rollout)

    cfg = PfConfig(num_particles=100_000, weight_mode="log",
                   resample_method="merge")
    _, (x_true, x_est) = jax.jit(
        lambda k: pf_fused_rollout(cfg, k, 100))(jax.random.key(3))
    rmse = float(jnp.sqrt(jnp.mean(
        jnp.sum((x_est[:, :2] - x_true[:, :2]) ** 2, -1))))
    assert 0.02 < rmse < 0.40, f"PF fused 100k on-chip RMSE {rmse}"

    bcfg = PfConfig(num_particles=1000, weight_mode="log")
    _, outs = jax.jit(lambda k: pf_batch_rollout(
        bcfg, k, batch=256, n_steps=100))(jax.random.key(4))
    e = outs.x_est[..., :2] - outs.x_true[:, None, :2]
    rmse_b = float(jnp.sqrt(jnp.mean(jnp.sum(e ** 2, -1))))
    assert 0.02 < rmse_b < 0.50, f"PF batch on-chip RMSE {rmse_b}"

    wcfg = PfConfig(num_particles=10_000, weight_mode="log")
    _, wouts = jax.jit(lambda k: pf_batch_wide_rollout(
        wcfg, k, batch=32, n_steps=100))(jax.random.key(5))
    ew = wouts.x_est[..., :2] - wouts.x_true[:, None, :2]
    rmse_w = float(jnp.sqrt(jnp.mean(jnp.sum(ew ** 2, -1))))
    assert 0.02 < rmse_w < 0.50, f"PF wide on-chip RMSE {rmse_w}"
    print(f"# parity: OK pf kernels noise bands (fused 100k {rmse:.3f}, "
          f"batch 256x1k {rmse_b:.3f}, wide 32x10k {rmse_w:.3f}; all in "
          "[0.02,0.5])", file=sys.stderr)


def run_parity_checks():
    import os

    if os.environ.get("BENCH_SKIP_PARITY"):
        print("# parity: SKIPPED (BENCH_SKIP_PARITY set)", file=sys.stderr)
        return
    if jax.devices()[0].platform == "cpu":
        print("# parity: SKIPPED (cpu backend; gates certify the real "
              "chip's Mosaic lowerings)", file=sys.stderr)
        return
    t0 = time.perf_counter()
    parity_ekf_noise_free()
    parity_ekf_noise_bands()
    parity_merge_resample()
    parity_pf_bands()
    parity_graph_solvers()
    print(f"# parity: all gates passed in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform})", file=sys.stderr)
    # Hard gate: a failure here aborts the bench (rc != 0) - the
    # throughput lines below are only evidence if these pass.
    run_parity_checks()

    try:
        ekf_rate = bench_ekf_pallas()
        path = "pallas fused kernel"
    except Exception as e:
        print(f"# pallas 1600-step bench failed ({e}); trying 400",
              file=sys.stderr)
        try:
            ekf_rate = bench_ekf_pallas(steps=400)
            path = "pallas fused kernel (400 steps)"
        except Exception as e2:  # fall back to the scan path
            print(f"# pallas bench failed ({e2}); using scan path",
                  file=sys.stderr)
            ekf_rate = bench_ekf_scan()
            path = "xla scan"
    print(f"# EKF ({path}): {ekf_rate:.3e} steps/s/chip", file=sys.stderr)
    if path.startswith("pallas"):
        print(roofline.EKF_FUSED.analyze(ekf_rate), file=sys.stderr)
    try:
        sw_rate = bench_ekf_sweeps()
        one_rate = bench_ekf_pallas(batch=8192, steps=400)
        print(f"# EKF latency-bound config (8192x400): {one_rate:.3e} "
              f"steps/s one sweep/call, {sw_rate:.3e} amortized "
              f"(64 sweeps/program)", file=sys.stderr)
    except Exception as e:
        print(f"# EKF sweep-amortized bench failed: {e}", file=sys.stderr)
    try:
        scan_rate = bench_ekf_scan()
        print(f"# EKF (xla scan): {scan_rate:.3e} steps/s/chip",
              file=sys.stderr)
    except Exception as e:
        print(f"# scan bench failed: {e}", file=sys.stderr)
    try:
        pf_rate = bench_pf_pallas()
        print(f"# PF (pallas fused, 100k x 400): {pf_rate:.3e} "
              f"particle-steps/s/chip", file=sys.stderr)
    except Exception as e:
        print(f"# PF pallas bench failed: {e}", file=sys.stderr)
    try:
        pf_rate = bench_pf_pallas(particles=1_000_000)
        print(f"# PF (pallas fused, 1M x 400): {pf_rate:.3e} "
              f"particle-steps/s/chip", file=sys.stderr)
    except Exception as e:
        print(f"# PF pallas 1M bench failed: {e}", file=sys.stderr)
    try:
        # 2M particles is the PF throughput peak (tpu_round3_measure.py);
        # 400 steps amortize the ~25 ms/call tunnel dispatch (19% of a
        # 100-step rollout's wall - scripts/tpu_pf_ablate_r4h.py) to
        # ~5%: steady-state throughput, not call overhead.
        pf_rate = bench_pf_pallas(particles=2_097_152, steps=400)
        print(f"# PF (pallas fused, 2M x 400): {pf_rate:.3e} "
              f"particle-steps/s/chip", file=sys.stderr)
        print(roofline.PF_FUSED.analyze(pf_rate), file=sys.stderr)
    except Exception as e:
        print(f"# PF pallas 2M bench failed: {e}", file=sys.stderr)
    try:
        pf_rate = bench_pf_batch()
        print(f"# PF (batched fused, 1024x1000 x 400): {pf_rate:.3e} "
              f"particle-steps/s/chip", file=sys.stderr)
        print(roofline.PF_BATCH.analyze(pf_rate), file=sys.stderr)
    except Exception as e:
        print(f"# PF batch bench failed: {e}", file=sys.stderr)
    try:
        pf_rate = bench_pf_batch(batch=8192)
        print(f"# PF (batched fused, 8192x1000 x 400): {pf_rate:.3e} "
              f"particle-steps/s/chip", file=sys.stderr)
    except Exception as e:
        print(f"# PF batch 8192 bench failed: {e}", file=sys.stderr)
    try:
        pf_rate = bench_pf()
        print(f"# PF (xla scan): {pf_rate:.3e} particle-steps/s/chip",
              file=sys.stderr)
    except Exception as e:  # secondary: never break the headline line
        print(f"# PF bench failed: {e}", file=sys.stderr)
    try:
        pf_rate = bench_pf_batch_wide(steps=400)
        print(f"# PF (batched wide fused, 128x10000 x 400): {pf_rate:.3e} "
              f"particle-steps/s/chip", file=sys.stderr)
        print(roofline.PF_WIDE.analyze(pf_rate), file=sys.stderr)
    except Exception as e:
        print(f"# PF batch wide bench failed: {e}", file=sys.stderr)
    try:
        # Flagship wide config (round-3 target >= 1.2e9): 1024 filters
        # x 10k particles, default gate, 400 steps (steady state).
        pf_rate = bench_pf_batch_wide(batch=1024, steps=400)
        print(f"# PF (batched wide fused, 1024x10000 x 400): "
              f"{pf_rate:.3e} particle-steps/s/chip", file=sys.stderr)
    except Exception as e:
        print(f"# PF batch wide 1024 bench failed: {e}", file=sys.stderr)
    try:
        graph_dt = bench_graph(guard="full")
        print(f"# reference demo course (18 frames, sim + per-frame GN, "
              f"FULL reference guards; 36 s wall in the reference): "
              f"{graph_dt*1e3:.1f} ms", file=sys.stderr)
        graph_dt_cheap = bench_graph(guard="cheap")
        print(f"# same, cheap guards (slogdet + diag bound): "
              f"{graph_dt_cheap*1e3:.1f} ms", file=sys.stderr)
    except Exception as e:
        print(f"# graph bench failed: {e}", file=sys.stderr)
    try:
        large_dt, n_edges, gn_iters, n_poses = bench_graph_large()
        print(f"# graph solve (10k poses / 1k landmarks, {n_edges} edges): "
              f"{large_dt:.3f} s, {gn_iters} GN iters (target < 1 s)",
              file=sys.stderr)
        print(roofline.tridiag_model(40).analyze(
            n_poses * max(gn_iters, 1) / large_dt), file=sys.stderr)
    except Exception as e:
        print(f"# large graph bench failed: {e}", file=sys.stderr)
    try:
        # Flagship scale-up 1: 100k poses / 1k landmarks (factor-reuse
        # GN; geometry of scripts/tpu_100k_solve.py).
        large_dt, n_edges, gn_iters, n_poses = bench_graph_large(
            n_poses=100_000, scan_chunk=10_000)
        print(f"# graph solve (100k poses / 1k landmarks, {n_edges} "
              f"edges): {large_dt:.3f} s, {gn_iters} GN iters",
              file=sys.stderr)
    except Exception as e:
        print(f"# 100k graph bench failed: {e}", file=sys.stderr)
    try:
        # Flagship scale-up 2: 1M poses / 100 landmarks (the stretch
        # scale of scripts/tpu_graph_1m.py; ~100x the BASELINE config).
        large_dt, n_edges, gn_iters, n_poses = bench_graph_large(
            n_poses=1_000_000, n_landmarks=100, scan_chunk=10_000,
            radius_frac=0.05)
        print(f"# graph solve (1M poses / 100 landmarks, {n_edges} "
              f"edges): {large_dt:.3f} s, {gn_iters} GN iters "
              f"(factor-reuse)", file=sys.stderr)
    except Exception as e:
        print(f"# 1M graph bench failed: {e}", file=sys.stderr)

    target = 1.0e6
    print(json.dumps({
        "metric": "batched EKF-SLAM sim steps/sec/chip",
        "value": ekf_rate,
        "unit": "steps/s",
        "vs_baseline": ekf_rate / target,
    }))


if __name__ == "__main__":
    main()
