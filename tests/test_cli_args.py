"""CLI plumbing tests (argument parsing, overrides) without heavy runs."""

import pytest

from tmar.cli import _parse_sets


def test_parse_sets_types():
    out = _parse_sets(["data.batch_size=8", "loss.phys=0.0", "bf16=false", "run_name=abc"])
    assert out["data.batch_size"] == 8
    assert out["loss.phys"] == 0.0
    assert out["bf16"] is False
    assert out["run_name"] == "abc"


def test_parse_sets_rejects_bad():
    with pytest.raises(SystemExit):
        _parse_sets(["oops"])


def test_cli_entry_points_exist():
    import tmar.cli as cli

    for fn in ("train", "test", "ablate", "compare", "main"):
        assert callable(getattr(cli, fn))


def test_train_cli_help():
    import tmar.cli as cli

    with pytest.raises(SystemExit) as e:
        cli.train(["--help"])
    assert e.value.code == 0
