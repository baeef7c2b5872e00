"""Guard the graft contract: entry() compiles and runs; the multichip
dry run executes on the virtual CPU mesh."""

import importlib.util
import os

import jax
import pytest


def _load():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, res = out
    assert res.soft_bits.shape == (4, 8, 148)


def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(8)


def test_dryrun_multichip_2():
    mod = _load()
    mod.dryrun_multichip(2)
