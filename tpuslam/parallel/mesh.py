"""Device meshes for rollout/particle parallelism.

The reference is single-process with no distributed components
(SURVEY.md section 2, parallelism table); this module is the new
framework's scaling tier: a 1-D (or 2-D) ``jax.sharding.Mesh`` whose
``rollout`` axis carries Monte-Carlo rollouts (data parallel over ICI
within a slice) and whose optional ``particle`` axis shards particle
clouds.  The same code runs on a virtual N-device CPU mesh in CI
(``jax.config.update('jax_num_cpu_devices', N)``, SURVEY.md section 4.4)
and on a real TPU slice unmodified.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROLLOUT_AXIS = "rollout"
PARTICLE_AXIS = "particle"
#: Outer mesh axis spanning TPU slices: collectives over it ride DCN
#: (data-center network, ~100x lower bandwidth and ~10x higher latency
#: than ICI), so reductions must be HIERARCHICAL - combine within a
#: slice over ICI first, then send one slice-combined value over DCN
#: (:func:`psum_hierarchical`).  Shard only throughput axes (rollouts,
#: edge sets) over it; never halo-exchange or per-step state.
SLICE_AXIS = "slice"


def make_mesh(n_rollout: int | None = None, n_particle: int = 1,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Args:
        n_rollout: size of the rollout axis (default: all devices /
            ``n_particle``).
        n_particle: size of the particle axis (default 1 -> 1-D mesh).
        devices: explicit device list (default ``jax.devices()``).

    Returns:
        A ``Mesh`` with axes ``(rollout,)`` or ``(rollout, particle)``.
    """
    if devices is None:
        devices = jax.devices()
    if n_rollout is None:
        n_rollout = len(devices) // n_particle
    devs = np.asarray(devices[:n_rollout * n_particle])
    if n_particle == 1:
        return Mesh(devs.reshape(n_rollout), (ROLLOUT_AXIS,))
    return Mesh(devs.reshape(n_rollout, n_particle),
                (ROLLOUT_AXIS, PARTICLE_AXIS))


def rollout_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits a leading batch axis over the rollout axis."""
    return NamedSharding(mesh, P(ROLLOUT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize multi-process JAX (one process per host/slice).

    On a real multi-slice deployment every host calls this FIRST - before
    any ``jax.devices()`` / array op touches the backend
    (``jax.distributed.initialize`` refuses to run afterwards); then
    ``jax.devices()`` spans all slices and :func:`make_multislice_mesh`
    lays the DCN axis over them.  Arguments default to
    ``jax.distributed.initialize``'s own auto-detection (TPU pod
    metadata, Slurm, the standard env vars); an environment without any
    such configuration (CI, one slice, the CPU mesh) is a no-op.

    Returns True iff distributed mode is (now) active.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError):
        # No coordinator configured / nothing to auto-detect (the
        # single-process case), or the backend was already initialized
        # by earlier device use - either way: not distributed.
        return False
    return jax.process_count() > 1


def make_multislice_mesh(n_slice: int, n_per_slice: int | None = None,
                         devices=None, inner_axis: str = ROLLOUT_AXIS
                         ) -> Mesh:
    """Build a 2-D ``(slice, inner)`` mesh spanning TPU slices.

    The outer ``slice`` axis maps across slices (DCN); the inner axis
    maps within a slice (ICI).  On real multi-slice hardware the device
    order must group each slice's chips contiguously -
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` handles
    the physical layout; the fallback reshape covers virtual CPU meshes
    and single-slice testing (device order is then the grouping).
    """
    if devices is None:
        devices = jax.devices()
    if n_per_slice is None:
        n_per_slice = len(devices) // n_slice
    want = n_slice * n_per_slice
    if len(devices) < want:
        raise ValueError(f"need {want} devices, have {len(devices)}")
    if devices[0].platform == "tpu":
        try:
            from jax.experimental import mesh_utils

            # Output shape is the elementwise product of the two
            # per-axis shapes: (n_slice*1, 1*n_per_slice) - leading axis
            # = DCN (slices), each row one slice's ICI-ordered chips.
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (1, n_per_slice), (n_slice, 1), devices=devices[:want])
            return Mesh(dev_array, (SLICE_AXIS, inner_axis))
        except ValueError:
            pass  # single-slice TPU (no slice_index attrs): fall back
    devs = np.asarray(devices[:want]).reshape(n_slice, n_per_slice)
    return Mesh(devs, (SLICE_AXIS, inner_axis))


def psum_hierarchical(x, inner_axis: str = ROLLOUT_AXIS,
                      outer_axis: str | None = SLICE_AXIS):
    """Two-stage psum: combine within the slice over ICI, then across
    slices over DCN.

    Semantically equal to ``psum(x, (inner, outer))`` but the staging
    tells XLA to move only one slice-combined value per slice over DCN
    (ICI: ~100s of GB/s per link; DCN: ~1-10 GB/s per host) instead of
    flat-reducing every chip's contribution across the slow network.

    ``outer_axis=None`` (the single-slice case) skips the DCN stage, so
    callers with an optional slice axis reduce through one code path.
    """
    x = jax.lax.psum(x, inner_axis)
    if outer_axis is not None:
        x = jax.lax.psum(x, outer_axis)
    return x
