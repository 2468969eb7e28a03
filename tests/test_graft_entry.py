"""Driver entry-point tests: entry() is jittable (shape-level) and
dryrun_multichip exercises the full dp×mp training step on the CPU mesh."""

import jax
import pytest


def test_entry_shapes():
    from __graft_entry__ import entry

    fn, (params, batch) = entry()
    out = jax.eval_shape(fn, params, batch)
    assert out.shape == (16, 2)


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) == 8
    dryrun_multichip(8)
