"""Driver entry points: entry() compiles and runs; dryrun_multichip executes on
several mesh sizes of the CPU test mesh."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out, mask = jax.jit(fn)(*args)
    assert out.shape[0] == 13  # all hidden states
    assert out.shape[1] == 2


@pytest.mark.parametrize("n", [1, 2, 6, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)
