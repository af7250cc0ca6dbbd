"""Validate the driver entry points on the virtual CPU mesh."""

import jax

from .conftest import REPO_ROOT
import sys

sys.path.insert(0, REPO_ROOT)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 60)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
