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
