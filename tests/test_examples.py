"""The shipped examples must keep running (they are user-facing docs)."""

import os
import sys

import numpy as np

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plane_decomposition_demo(capsys):
    _load("plane_decomposition_demo").main()
    out = capsys.readouterr().out
    assert "regions: 4" in out
    assert out.count("convex 12-gon") == 3


def test_semantic_mapping_demo(capsys):
    _load("semantic_mapping").main()
    out = capsys.readouterr().out
    assert "green-dominant world: True" in out
    for layer in ("elevation", "rgb", "grass", "obstacle"):
        assert f"layer {layer}" in out
