"""Checkpoint / resume for simulation + filter state pytrees.

The reference has no checkpointing at all (SURVEY.md section 5: all state
is in-memory per run; only a commented-out mp4 export exists).  Because
every piece of state in this framework is a pytree (EkfState, PfState,
graph pose/observation tensors), checkpointing is a single Orbax call.
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state(path: str, state) -> None:
    """Save any pytree of arrays to ``path`` (an empty/new directory)."""
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(path), state)
    ckpt.wait_until_finished()


def restore_state(path: str, template):
    """Restore a pytree saved by :func:`save_state`.

    Args:
        template: a pytree with the same structure/shapes/dtypes (e.g. the
            output of ``ekf_init`` / ``pf_init``) used as the restore spec.
    """
    import orbax.checkpoint as ocp

    ckpt = _checkpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckpt.restore(os.path.abspath(path), target)
