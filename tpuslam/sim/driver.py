"""Generic simulation drivers: lax.scan rollouts over keyed step functions.

Replaces the reference's matplotlib ``FuncAnimation`` as the simulation
driver (SURVEY.md section 3: the animation callback IS the reference's main
loop).  A "step function" here is any ``(state, key) -> (state, out)``;
the drivers below run it under ``lax.scan``, batch it with ``vmap``, and
leave the stacked outputs on device for metrics/rendering.
"""

from __future__ import annotations

import jax


def rollout(step_fn, state0, key, n_steps: int):
    """Scan ``step_fn`` for ``n_steps`` with per-step key folding.

    Args:
        step_fn: ``(state, key) -> (state, out)``.
        state0: initial state pytree.
        key: base PRNG key (split into per-step keys).

    Returns:
        ``(final_state, outs)`` with outs stacked on a leading time axis.
    """
    keys = jax.random.split(key, n_steps)
    return jax.lax.scan(step_fn, state0, keys)


def rollout_batch(step_fn, init_fn, keys, n_steps: int):
    """vmap a rollout over a batch of seeds.

    Args:
        step_fn: ``(state, key) -> (state, out)``.
        init_fn: ``() -> state`` building one rollout's initial state.
        keys: ``(B,)`` PRNG keys.

    Returns:
        ``(final_states, outs)`` with leading ``(B, n_steps, ...)`` axes
        on the outs.
    """
    def one(key):
        return rollout(step_fn, init_fn(), key, n_steps)

    return jax.vmap(one)(keys)
