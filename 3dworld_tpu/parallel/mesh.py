"""Device-mesh helpers: axis setup + sharding shortcuts.

Scale-out model (SURVEY §2.13): the reference's "big axes" — the tile
batch, the object population, droplet/ray batches — shard over a
`jax.sharding.Mesh`; XLA collectives over ICI replace its OpenMP loops
and GL readbacks.  These helpers standardize the axis names used across
the framework:

  'tiles' — terrain tile batch (data parallel)
  'objs'  — physics object population
  'rays'  — lighting ray batches
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(axis,))


def shard_leading(mesh: Mesh, axis: str = None) -> NamedSharding:
    """Shard the leading array axis over the mesh's (single) axis."""
    name = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
