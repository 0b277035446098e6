"""Driver entry-point tests: entry() compiles, dryrun_multichip runs on the
8-device virtual CPU mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = fn(*args)
    assert out.shape == (4, 144, 160, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    graft.dryrun_multichip(1)


def test_dryrun_does_not_pollute_backend():
    """dryrun_multichip(n) with n <= visible devices must NOT rebuild the
    backend (regression: a function-local `import jax.extend.backend` made
    the visible-device probe raise, force-bootstrapping n CPU devices and
    leaving the whole test process with 1 device after dryrun(1))."""
    import jax

    before = len(jax.devices())
    graft.dryrun_multichip(1)
    assert len(jax.devices()) == before
