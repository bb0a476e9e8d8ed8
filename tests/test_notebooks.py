"""Notebooks stay in sync with the library API (same rationale as
test_examples.py: the reference's notebooks drifted unchecked).  Each
notebook's code cells are executed top-to-bottom in one namespace inside a
temp directory (figures land there, not in the repo)."""

import json
import os
from pathlib import Path

import pytest

NOTEBOOKS = sorted(
    (Path(__file__).resolve().parent.parent / "notebooks").glob("*.ipynb"))


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executes(path, tmp_path, monkeypatch):
    cells = json.loads(path.read_text())["cells"]
    monkeypatch.chdir(tmp_path)
    ns = {"__name__": "__main__"}
    for i, cell in enumerate(cells):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        try:
            exec(compile(src, f"{path.name}[cell {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{path.name} cell {i} failed: {e}\n--- cell ---\n{src}"
            ) from e
