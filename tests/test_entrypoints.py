"""The driver-facing entry points (__graft_entry__.py) under pytest.

The driver compile-checks entry() on the real TPU and runs
dryrun_multichip with virtual devices; covering them here keeps their
parity assertions part of the ordinary suite too.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces():
    """The flagship 1080p forward step traces/lowers cleanly (XLA impl on
    the CPU backend; the driver compiles the Pallas variant on TPU)."""
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    assert "1080" in str(lowered.in_avals)


def test_dryrun_multichip_parity():
    """Full hybrid DP x SP step on the 8-device virtual mesh; asserts both
    shard implementations match the unsharded pipeline internally."""
    graft.dryrun_multichip(len(jax.devices()))
