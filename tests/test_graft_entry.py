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
    """An uninitialized/unknowable in-process backend (tunnel down before
    init) must route to the CPU-subprocess path, not propagate or hang."""
    called = {}
    monkeypatch.setattr(entry_mod, "_inprocess_device_count", lambda: None)
    monkeypatch.setattr(
        entry_mod, "_dryrun_in_subprocess", lambda n: called.setdefault("n", n)
    )
    entry_mod.dryrun_multichip(8)
    assert called["n"] == 8


def test_dryrun_ignores_overreporting_probe(entry_mod, monkeypatch):
    """Regression (r2 driver failure): the subprocess probe reports >= n
    devices while the in-process platform has 1 — the routing must trust
    the in-process count and take the subprocess path, never _dryrun_here."""
    called = {}
    monkeypatch.setattr(entry_mod, "_inprocess_device_count", lambda: 1)
    monkeypatch.setattr(
        entry_mod, "_bounded_probe",
        lambda *a, **k: ("cpu", 8),  # over-reporting probe must not matter
    )
    monkeypatch.setattr(
        entry_mod, "_dryrun_here",
        lambda n: (_ for _ in ()).throw(AssertionError("in-process path taken")),
    )
    monkeypatch.setattr(
        entry_mod, "_dryrun_in_subprocess", lambda n: called.setdefault("n", n)
    )
    entry_mod.dryrun_multichip(8)
    assert called["n"] == 8


def test_dryrun_inprocess_failure_falls_back(entry_mod, monkeypatch):
    """If the in-process dryrun raises (e.g. a mis-count slipped through and
    create_mesh failed), the gate must retry in the subprocess, not rc:1."""
    called = {}
    monkeypatch.setattr(entry_mod, "_inprocess_device_count", lambda: 8)

    def boom(n):
        raise ValueError("requested 8 devices but only 1 available")

    monkeypatch.setattr(entry_mod, "_dryrun_here", boom)
    monkeypatch.setattr(
        entry_mod, "_dryrun_in_subprocess", lambda n: called.setdefault("n", n)
    )
    entry_mod.dryrun_multichip(8)
    assert called["n"] == 8


def test_dryrun_runs_here_when_devices_available(entry_mod, monkeypatch):
    """With a verifiably sufficient in-process device count the dryrun runs
    in-process (no subprocess respawn)."""
    called = {}
    monkeypatch.setattr(entry_mod, "_inprocess_device_count", lambda: 8)
    monkeypatch.setattr(
        entry_mod, "_dryrun_here", lambda n: called.setdefault("n", n)
    )
    monkeypatch.setattr(
        entry_mod, "_dryrun_in_subprocess",
        lambda n: (_ for _ in ()).throw(AssertionError("subprocess path taken")),
    )
    entry_mod.dryrun_multichip(8)
    assert called["n"] == 8


def test_inprocess_device_count_reports_test_platform(entry_mod):
    """Under the test platform (8 virtual CPU devices, jax initialized by
    conftest) the in-process count is authoritative and equals 8."""
    jax.devices()  # ensure the backend is initialized
    assert entry_mod._inprocess_device_count() == 8


def test_bounded_probe_times_out(entry_mod):
    """The probe must return ("", 0) (not hang) when the subprocess can't
    answer within the bound."""
    assert entry_mod._bounded_probe(timeout=0.05) == ("", 0)


def test_bounded_probe_healthy(entry_mod):
    """Under the test platform (8 virtual CPU devices) the probe reports
    the cpu backend and counts 8."""
    assert entry_mod._bounded_probe() == ("cpu", 8)
