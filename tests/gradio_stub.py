"""Minimal gradio test double: just enough API surface for
serve/gradio_app.build_demo to execute its full wiring (Blocks context,
component construction, Button.click registration) without the real
library.  The double records the click callback so tests can drive one
text -> (regime, probs, allocation) inference through it — executing the
exact code path the real UI invokes (reference: app.py:56-110).

Real-gradio coverage still exists: CI installs the `gradio` extra and
tests/test_asgi.py::test_gradio_demo_builds runs against the real library
there.
"""

from __future__ import annotations

import sys
import types


class _Component:
    def __init__(self, *a, **k):
        self.args, self.kwargs = a, k


class _Button(_Component):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.clicks = []

    def click(self, fn, inputs=None, outputs=None):
        self.clicks.append({"fn": fn, "inputs": inputs, "outputs": outputs})


class _Blocks:
    _stack = []

    def __init__(self, *a, **k):
        self.kwargs = k
        self.children = []

    def __enter__(self):
        _Blocks._stack.append(self)
        return self

    def __exit__(self, *exc):
        _Blocks._stack.pop()
        return False

    def launch(self, *a, **k):  # never called in tests; here for parity
        raise RuntimeError("stub gradio cannot launch a server")


def _track(cls):
    def make(*a, **k):
        comp = cls(*a, **k)
        if _Blocks._stack:
            _Blocks._stack[-1].children.append(comp)
        return comp

    return make


def install_stub():
    """Install the stub as `gradio` in sys.modules; returns the module.
    No-op (returns the real module) when gradio is genuinely installed."""
    if "gradio" in sys.modules:
        return sys.modules["gradio"]
    try:
        import gradio  # noqa: F401

        return sys.modules["gradio"]
    except ImportError:
        pass
    mod = types.ModuleType("gradio")
    mod.__stub__ = True
    mod.Blocks = _Blocks
    mod.Markdown = _track(_Component)
    mod.Textbox = _track(_Component)
    mod.JSON = _track(_Component)
    mod.Button = _track(_Button)
    sys.modules["gradio"] = mod
    return mod


def uninstall_stub():
    mod = sys.modules.get("gradio")
    if mod is not None and getattr(mod, "__stub__", False):
        del sys.modules["gradio"]


def find_buttons(demo):
    return [c for c in getattr(demo, "children", [])
            if isinstance(c, _Button)]
