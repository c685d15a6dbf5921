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
    # loose invariants: the RNG-driven pipeline's exact region/polygon counts
    # are float-sensitive; require the demo to segment and grow SOMETHING
    import re

    m = re.search(r"regions: (\d+)", out)
    assert m and int(m.group(1)) >= 2
    assert out.count("convex 12-gon") >= 1


def test_semantic_mapping_demo(capsys):
    _load("semantic_mapping").main()
    out = capsys.readouterr().out
    assert "green-dominant world: True" in out
    for layer in ("elevation", "rgb", "grass", "obstacle"):
        assert f"layer {layer}" in out


def test_robot_stack_demo(capsys):
    _load("robot_stack").main()
    out = capsys.readouterr().out
    assert "sensors=['color_cam', 'front_lidar']" in out
    assert "dropped: 0" in out
    assert "planar regions: 2" in out or "planar regions: 3" in out
    assert "check_safety[platform edge]: safe=False" in out
    assert "foothold polygon: convex" in out


def test_large_world_sharded_demo(capsys):
    _load("large_world_sharded").main()
    out = capsys.readouterr().out
    assert "512x512 cells" in out and "over 8 shards" in out
    assert "building A top: 1.2" in out
    assert "sharded world map ok" in out
