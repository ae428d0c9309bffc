"""Driver-contract tests for __graft_entry__ (the deliverable the driver runs).

Round-1 failure mode (VERDICT.md Missing #1): ``dryrun_multichip`` asserted 8
devices on a 1-TPU machine instead of provisioning a virtual CPU mesh.  These
tests pin both code paths:

* in-process: conftest already provides 8 virtual CPU devices, so the call
  runs the mesh train step directly;
* subprocess: the re-exec path the driver actually hits on the bench host
  (fewer real devices than requested) — spawns a fresh Python pinned to a
  virtual CPU platform.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow  # ~170 s: full sharded train-step compile; the driver
def test_dryrun_multichip_in_process():  # also runs this contract each round
    assert len(jax.devices()) >= 8  # conftest provisions the virtual mesh
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_reexec():
    # The exact branch the driver hits on a 1-chip host: force the child path.
    graft._reexec_on_virtual_cpu_mesh(4)


@pytest.mark.slow  # flagship fwd compile; the driver compile-checks entry()
def test_entry_is_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None
