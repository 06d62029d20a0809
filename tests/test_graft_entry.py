"""Driver entry-point robustness: the gate must survive a TPU-tunnel
outage (remote backend init failure) by falling back to the virtual-CPU
subprocess instead of raising."""

import numpy as np
import pytest

import jax


@pytest.fixture()
def entry_mod():
    import __graft_entry__

    return __graft_entry__


@pytest.mark.slow
def test_entry_returns_jittable(entry_mod):
    fn, (params, x) = entry_mod.entry()
    out = jax.jit(fn)(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_dryrun_falls_back_to_subprocess_on_outage(entry_mod, monkeypatch):
    """A dead/hung device probe (tunnel down) must route to the
    CPU-subprocess path, not propagate or hang."""
    called = {}
    monkeypatch.setattr(entry_mod, "_bounded_probe", lambda: ("", 0))
    monkeypatch.setattr(
        entry_mod, "_dryrun_in_subprocess", lambda n: called.setdefault("n", n)
    )
    entry_mod.dryrun_multichip(8)
    assert called["n"] == 8


def test_bounded_probe_times_out(entry_mod):
    """The probe must return ("", 0) (not hang) when the subprocess can't
    answer within the bound."""
    assert entry_mod._bounded_probe(timeout=0.05) == ("", 0)


def test_bounded_probe_healthy(entry_mod):
    """Under the test platform (8 virtual CPU devices) the probe reports
    the cpu backend and counts 8."""
    assert entry_mod._bounded_probe() == ("cpu", 8)
