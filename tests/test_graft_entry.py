"""Guard the driver interface (__graft_entry__.py): entry() must build a
jittable forward step, dryrun_multichip must validate the sharded pipeline
on a virtual CPU mesh."""

import importlib
import os
import sys

import jax


def _mod():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    return importlib.import_module("__graft_entry__")


def test_entry_compiles():
    fn, args = _mod().entry()
    out = jax.jit(fn)(*args)
    packed, total_bits, carry_code, carry_bits, overflow = out
    assert packed.dtype == jax.numpy.uint8
    assert total_bits.shape == ()
    assert not bool(overflow)


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    _mod().dryrun_multichip(8)
