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
