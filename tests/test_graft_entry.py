"""Driver-contract tests for __graft_entry__.py.

``dryrun_multichip`` is the one multi-chip artifact the driver checks: it
must build an 8-device mesh and execute a full DP training step even when
the host process is glued to a single remote TPU chip (the axon relay
forces the platform via sitecustomize).  We invoke it exactly as the driver
does — import + call — and rely on its internal subprocess bootstrap.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow  # the driver runs dryrun_multichip itself every round;
# this in-suite copy is execution-bound (~2 min warm on the 1-core host)
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    # Must succeed regardless of this process's backend (conftest pins CPU,
    # but the subprocess bootstrap is what makes it work under axon too).
    g.dryrun_multichip(8)


# slow: CPU compile of the full flagship forward takes ~35 s and duplicates the driver's own entry() compile check each round.
@pytest.mark.slow
def test_entry_compiles_and_is_finite():
    import jax
    import numpy as np
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
