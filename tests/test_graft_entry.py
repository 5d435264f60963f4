"""Driver contract: entry() compiles single-chip; dryrun_multichip executes
one sharded step on the virtual mesh."""

import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, ".")

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 2 and out.dtype == np.uint32


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
