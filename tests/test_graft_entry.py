"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 failure mode: dryrun_multichip initialized the 'axon' TPU backend
instead of the virtual CPU mesh (MULTICHIP_r01.json rc=1). These tests run
under the conftest's 8-device CPU mesh and exercise both driver contracts.
"""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (8, 10)
    assert np.all(np.isfinite(out))


def test_dryrun_multichip_8_devices():
    # conftest already forces 8 virtual CPU devices, so this exercises the
    # "platform already correct" path plus the full sharded train/explain/
    # DRSA dryrun body.
    __graft_entry__.dryrun_multichip(8)


def test_force_cpu_mesh_asserts_platform():
    __graft_entry__._force_cpu_mesh(8)
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    assert len(devs) >= 8
