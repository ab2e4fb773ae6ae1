#!/usr/bin/env python
"""Multihost launch entry for a real TPU slice (or multi-slice pod).

The reference is single-process (SURVEY.md section 2, parallelism
table); this is the runbook the framework's distributed tier is missing
hardware for here: it wires ``tpuslam.parallel.mesh.init_distributed``
+ ``make_mesh`` / ``make_multislice_mesh`` into a runnable per-host
entry and executes a sharded Monte-Carlo sweep whose RMSE is reduced
with a (hierarchical, when multi-slice) psum.

Usage — one invocation PER HOST, all hosts started within the
coordinator's timeout window:

  On GCE TPU VMs (v5e-16 = 4 hosts, metadata auto-detection works):

      # on every host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`)
      python scripts/launch_multihost.py --rollouts 8192 --steps 400

  Anywhere auto-detection is unavailable (bare metal, Slurm without the
  plugin, containers), pass the wiring explicitly:

      # host 0 (the coordinator; port must be reachable from all hosts)
      python scripts/launch_multihost.py \
          --coordinator 10.0.0.2:8476 --num-processes 4 --process-id 0 ...
      # host k
      python scripts/launch_multihost.py \
          --coordinator 10.0.0.2:8476 --num-processes 4 --process-id $K ...

  Multi-slice (DCN) pods: add ``--slices N``; the mesh gains an outer
  ``slice`` axis and reductions become hierarchical (ICI first, one
  value per slice over DCN; see parallel/mesh.py::psum_hierarchical).

Every host must run the SAME program with the SAME static arguments
(jit programs are compiled per-host against the global mesh); only
``--process-id`` differs.  Data feeding is per-host: each process
builds only its addressable shard of the rollout keys (via
``jax.make_array_from_callback`` below) — no host ever materializes the
global batch.

Dry-run (what CI exercises; no cluster needed):

      python scripts/launch_multihost.py --dryrun
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (default: auto-detect "
                         "from TPU metadata / Slurm / env)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--slices", type=int, default=1,
                    help="number of TPU slices (>1 adds the DCN axis)")
    ap.add_argument("--rollouts", type=int, default=8192,
                    help="global EKF Monte-Carlo rollout count")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dryrun", action="store_true",
                    help="single-process CPU run on a virtual 8-device "
                         "mesh (validates the wiring without a cluster)")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    if args.dryrun:
        # Must happen before jax initializes a backend.
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax
    import numpy as np

    from tpuslam.filters import EkfConfig
    from tpuslam.parallel import make_mesh
    from tpuslam.parallel.mesh import (ROLLOUT_AXIS, SLICE_AXIS,
                                       init_distributed,
                                       make_multislice_mesh)
    from tpuslam.parallel.rollouts import sharded_ekf_fused_sweep

    # 1. Distributed init FIRST — before any other jax call touches the
    #    backend (init_distributed docstring; jax.distributed.initialize
    #    refuses to run after backend init).
    distributed = init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)
    pid, nproc = jax.process_index(), jax.process_count()
    print(f"[host {pid}/{nproc}] distributed={distributed} "
          f"local_devices={len(jax.local_devices())} "
          f"global_devices={len(jax.devices())}", flush=True)

    # 2. Global mesh over ALL devices (every host builds the identical
    #    mesh; jax.devices() is globally consistent after init).
    if args.slices > 1:
        mesh = make_multislice_mesh(args.slices)
    else:
        mesh = make_mesh()
    print(f"[host {pid}] mesh axes={mesh.axis_names} "
          f"shape={dict(mesh.shape)}", flush=True)

    # 3. Per-host data feed.  The fused sweep's inputs are only a seed
    #    scalar (each device folds its mesh position into its PRNG
    #    stream inside shard_map), so no host ever materializes a global
    #    batch.  For workloads with real per-rollout inputs, build them
    #    directly sharded — either `jax.make_array_from_callback(shape,
    #    sharding, cb)` (cb receives each addressable shard's global
    #    index and returns just that slab), or a jitted builder with
    #    `out_shardings` as below — never `device_put` of a host-global
    #    array.
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    n_roll = max(args.rollouts - args.rollouts % n_dev, n_dev)
    spec = (P((SLICE_AXIS, ROLLOUT_AXIS)) if args.slices > 1
            else P(ROLLOUT_AXIS))
    sharding = NamedSharding(mesh, spec)
    # Example sharded-input builder (used as a wiring check: every
    # process owns exactly its local_devices' shards).
    keys = jax.jit(lambda: jax.random.split(jax.random.key(0), n_roll),
                   out_shardings=sharding)()
    n_local = sum(s.data.shape[0] for s in keys.addressable_shards)
    assert n_local == n_roll * len(jax.local_devices()) // n_dev

    cfg = EkfConfig()
    slice_axis = SLICE_AXIS if args.slices > 1 else None
    t0 = time.perf_counter()
    # Dryrun: interpret-mode kernel, noise off (pltpu.prng_* has no CPU
    # interpret lowering — CLAUDE.md environment notes).
    _, _, rmse = sharded_ekf_fused_sweep(
        cfg, mesh, seed=0, batch=n_roll, n_steps=args.steps,
        slice_axis=slice_axis, noise_on=not args.dryrun,
        interpret=args.dryrun)
    rmse_v = float(rmse)  # host transfer = completion fence
    dt = time.perf_counter() - t0
    rate = n_roll * args.steps / dt
    print(f"[host {pid}] {n_roll} rollouts x {args.steps} steps: "
          f"RMSE {rmse_v:.4f}, {dt:.2f}s first-call "
          f"({rate:.3e} steps/s incl. compile)", flush=True)
    print(f"[host {pid}] ALL DONE", flush=True)


if __name__ == "__main__":
    main()
