"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md section 4.4): the same
shard_map/pjit code then runs unmodified on a real TPU slice.  This image's
``sitecustomize`` registers the axon TPU backend and initializes jax before
pytest reaches this file, so we switch the platform in-process: request 8
CPU devices, select the cpu platform, and drop any already-created backends.
"""

import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:  # pragma: no cover - older jax fallback
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    "test harness requires a virtual 8-device CPU mesh; got "
    f"{jax.devices()}")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the in-process compiler/executable state of the full tier.

    The suite runs hundreds of distinct jit programs in one process on
    the virtual 8-device CPU backend; with enough accumulated state the
    XLA:CPU compiler segfaults inside ``backend_compile_and_load`` on a
    later (individually fine) compile — observed round 5 on merge-kernel
    tests when preceded by the full solver module, passing in isolation
    or any small module combination.  Dropping the jit caches at module
    boundaries keeps the live-state envelope flat; the smoke tier is
    unaffected (each module recompiles only its own programs).
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
