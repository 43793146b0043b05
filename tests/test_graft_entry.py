"""Driver-contract tests: entry() compile-checks and dryrun_multichip runs on
the virtual 8-device CPU mesh."""

import sys

import jax
import numpy as np


def test_entry_jits():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    nu, converged, iterations = out
    assert nu.shape[0] == example_args[0].shape[0]
    assert np.all(np.isfinite(np.asarray(nu)))
    assert int(converged.sum()) > 0


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
