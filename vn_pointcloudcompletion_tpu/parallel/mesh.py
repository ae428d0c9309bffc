"""Device mesh construction for data-parallel training.

The reference has no distributed support at all (SURVEY.md §2c) — this layer
is pure headroom.  Models are small (< ~30M params), so the right TPU mapping
is a 1-D ``data`` mesh: batch sharded over ICI-connected chips, params
replicated, gradient all-reduce inserted by XLA from sharding propagation
(the pjit recipe — no hand-written collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
