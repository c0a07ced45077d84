"""The flagship composed example (examples/full_world.py) builds a whole
world end to end: terrain -> city (roads/buildings/interiors/people) ->
vegetation -> physics -> traffic -> lighting -> universe -> PNG exports.
This pins the example itself — every subsystem's public composition path
— so feature work can't silently break the reference startup analog
(3DWorld.cpp init -> gen scene -> display loop)."""
import json
import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_full_world_example(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["full_world.py", str(tmp_path)])
    runpy.run_path(os.path.join(REPO, "examples", "full_world.py"),
                   run_name="__main__")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["city"]["buildings"] >= 1
    assert stats["first_building"]["rooms"] >= 5
    assert stats["first_building"]["furniture"] >= 20
    assert stats["physics"]["live"] > 0
    assert stats["lighting"]["sky_energy"] > 0
    assert stats["vegetation"]["trees"] > 0
    assert stats["universe"]["planets"]
    for name in stats["artifacts"]:
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 100
