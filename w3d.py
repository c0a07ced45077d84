"""`w3d` — import alias for the `3dworld_tpu` package.

The package directory is named ``3dworld_tpu`` (not a valid Python
identifier), so this shim imports it via importlib and mirrors the whole
module tree under the ``w3d`` name: ``import w3d``, ``import w3d.ops.noise``,
``from w3d.terrain import mesh`` all work.
"""

import importlib
import sys

_pkg = importlib.import_module("3dworld_tpu")
_pkg._alias("w3d")
sys.modules["w3d"] = _pkg
