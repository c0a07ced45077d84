"""Asset-root portability: W3D_ASSET_ROOT replaces hardcoded reference
paths; everything must keep working with real assets disabled (the
procedural fallbacks take over)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_asset_root_env_override(monkeypatch):
    from w3d.utils import assets
    monkeypatch.setenv("W3D_ASSET_ROOT", "/nonexistent/tree")
    assert assets.asset_root() == "/nonexistent/tree"
    assert assets.asset_path("textures") == "/nonexistent/tree/textures"
    monkeypatch.setenv("W3D_ASSET_ROOT", "")
    assert assets.asset_root() is None
    assert assets.asset_path("textures") is None


@pytest.mark.slow
def test_disabled_asset_root_procedural_fallbacks():
    """With W3D_ASSET_ROOT='' the package must import and serve
    procedural textures + fallback name tables (fresh process so the
    import-time module constants see the env var)."""
    code = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from w3d.utils import assets, names
assert assets.asset_root() is None
assert names.TEXT_DATA_DIR == ""
from w3d.export import texture_catalog as TC
assert TC.REFERENCE_ASSET_DIR == ""
t = TC.get_reference_texture("grass.jpg", 32)
assert t.shape == (32, 32, 3) and t.dtype.name == "uint8"
assert names.gen_person_name(7, False)      # fallback name tables
from w3d.universe.ship_config import shipped_defs_path
p = shipped_defs_path()                     # relative, may not exist
assert not os.path.isabs(p)
print("ok")
""".format(repo=REPO)
    env = dict(os.environ, W3D_ASSET_ROOT="", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout
