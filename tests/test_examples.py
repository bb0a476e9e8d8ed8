"""Examples stay in sync with the library API.

The reference's examples drifted until they called methods that don't
exist (SURVEY.md section 4.1) — its CI never ran them.  Here the cheap
example runs fully and the rest are imported (import-time failures catch
renamed symbols)."""

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_calibration_example_runs(capsys):
    mod = _load("calibration_example.py")
    mod.main()
    out = capsys.readouterr().out
    assert "Optimal threshold" in out
    assert "converged" in out


def test_streaming_example_runs(capsys):
    mod = _load("streaming_example.py")
    mod.main()
    out = capsys.readouterr().out
    assert "matches batch filtered_posterior: True" in out


def test_device_pipeline_example_runs(capsys):
    mod = _load("device_pipeline_example.py")
    mod.main()
    out = capsys.readouterr().out
    assert "device gather matches host path: True" in out


@pytest.mark.parametrize("name", ["train_example.py", "backtest_example.py",
                                  "vqvae_example.py"])
def test_examples_import(name):
    """Import resolves every symbol the example references at module level
    (full runs are covered by the equivalent integration tests)."""
    mod = _load(name)
    assert hasattr(mod, "main")
