"""High-level composed models (the framework's "model zoo"): terrain tile
model, physics world model, voxel model, lighting bake, city/universe gen."""
from . import terrain_model  # noqa: F401
from . import physics_model  # noqa: F401
from . import world  # noqa: F401
