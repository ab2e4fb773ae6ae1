"""Driver-contract tests: entry() compiles and runs; dryrun_multichip
exercises the sharded paths on the CPU mesh."""

import pytest
import numpy as np
import jax

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.x_true.shape == (256, 3)
    assert np.isfinite(np.asarray(out.cov)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
