"""3dworld_tpu — a TPU-native procedural-world simulation framework.

A ground-up re-design of the capabilities of fegennari/3DWorld (C++/OpenGL)
as a JAX/XLA/Pallas framework: procedural terrain (noise + hydraulic erosion),
voxel worlds (3D density fields + marching cubes), >10K-object physics,
indirect-lighting precompute (batched ray casting into light volumes), water /
weather simulation, procedural cities/buildings and a procedural universe —
all expressed as fixed-shape, jit-compilable array programs that scale over a
`jax.sharding.Mesh`.

The directory name ``3dworld_tpu`` is not a valid Python identifier; import it
via the ``w3d`` alias module at the repo root (``import w3d``) or with
``importlib.import_module("3dworld_tpu")``.

Reference behavior is documented against the upstream C++ sources as
``file.cpp:line`` citations (the reference lives outside this repo); the
implementations here are new TPU-first designs, not translations.
"""

import sys as _sys

# Eagerly import the subpackages so that the `w3d` alias module can mirror the
# full tree in sys.modules (see /w3d.py at the repo root).
from . import utils      # noqa: F401
from . import ops        # noqa: F401
from . import parallel   # noqa: F401
from . import terrain    # noqa: F401
from . import physics    # noqa: F401
from . import scene      # noqa: F401
from . import voxel      # noqa: F401
from . import lighting   # noqa: F401
from . import water      # noqa: F401
from . import city       # noqa: F401
from . import universe   # noqa: F401
from . import models     # noqa: F401
from . import export     # noqa: F401
from . import native     # noqa: F401
from . import veg        # noqa: F401
from . import gameplay   # noqa: F401

__version__ = "0.1.0"

_PKG = __name__


def _alias(name: str = "w3d") -> None:
    """Register `name` (and `name.sub...`) as aliases of this package tree."""
    for mod_name in list(_sys.modules):
        if mod_name == _PKG or mod_name.startswith(_PKG + "."):
            _sys.modules[name + mod_name[len(_PKG):]] = _sys.modules[mod_name]


_alias()
