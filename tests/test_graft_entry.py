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
    # One contract on every platform: fn(seed) -> scalar rollout RMSE.
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == ()
    rmse = float(out)
    assert np.isfinite(rmse) and 0.0 < rmse < 10.0


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
