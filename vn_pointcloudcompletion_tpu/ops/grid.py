"""Folding seed grids for the FoldingNet-family decoders.

Mirrors the seed constants built in the reference decoders:
- 2-D grid in [-0.05, 0.05]^2 (``models/pcn.py:241-244,298-301``)
- 3-D grid on the z=0 plane, same extent (``models/pcn.py:359-362``)
- 3-D grid in [-1, 1]^2 for the attention decoder (``models/pcn.py:444-447``)

Ordering matches ``torch.linspace(...).view(1,g).expand(g,g)`` for the first
axis and ``.view(g,1).expand(g,g)`` for the second: ``a`` varies fastest.
"""

from __future__ import annotations

import jax.numpy as jnp


def folding_grid_2d(grid_size: int, extent: float = 0.05) -> jnp.ndarray:
    """(2, grid_size**2) 2-D folding seed."""
    lin = jnp.linspace(-extent, extent, grid_size, dtype=jnp.float32)
    a = jnp.broadcast_to(lin[None, :], (grid_size, grid_size)).reshape(-1)
    b = jnp.broadcast_to(lin[:, None], (grid_size, grid_size)).reshape(-1)
    return jnp.stack([a, b], axis=0)


def folding_grid_3d(grid_size: int, extent: float = 0.05) -> jnp.ndarray:
    """(3, grid_size**2) seed on the z=0 plane (VN decoders fold 3-vectors)."""
    ab = folding_grid_2d(grid_size, extent)
    c = jnp.zeros((1, grid_size * grid_size), dtype=jnp.float32)
    return jnp.concatenate([ab, c], axis=0)
