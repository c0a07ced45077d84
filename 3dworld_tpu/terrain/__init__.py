"""Terrain/heightfield engine: mesh gen, tiles, heightmap I/O, biomes."""
from . import mesh  # noqa: F401
