"""Driver contract: entry() compile-checks and dryrun_multichip(8) runs on
the virtual CPU mesh."""

import jax
import numpy as np


def test_entry_jits():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    res = jax.jit(fn)(*args)
    jax.block_until_ready(res.T)
    assert np.isfinite(np.asarray(res.T)).all()
    # it actually registered the displaced copy back (source = target + d,
    # so the recovered transform is -d)
    assert np.linalg.norm(np.asarray(res.T)[:3, 3] - [-0.2, 0.1, -0.05]) < 0.1


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
