"""Driver entry-point smoke tests: single-chip compile + multichip dryrun."""

import jax
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    variables, frames = args
    assert out.shape == (frames.shape[0], 685, 1055)
    assert out.dtype.name == "uint8"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
