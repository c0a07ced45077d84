"""Terrain/heightfield engine: mesh gen, tiles, heightmap I/O, biomes."""
from . import mesh  # noqa: F401
from . import tiles   # noqa: F401
from . import biomes  # noqa: F401
