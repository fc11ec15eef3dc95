"""Driver entry-point health checks (mirrors what the driver runs)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        T, errs = jax.jit(fn)(*args)
        assert np.asarray(T).shape == (4, 4)
        assert np.isfinite(np.asarray(T)).all()

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__ as g
        assert len(jax.devices()) >= 8
        g.dryrun_multichip(8)
