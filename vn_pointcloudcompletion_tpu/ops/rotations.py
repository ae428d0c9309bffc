"""Rotation sampling and application (pure JAX, PRNG-key driven).

Replaces the reference's use of ``pytorch3d.transforms``
(``random_rotations`` / ``Rotate`` / ``RotateAxisAngle`` at
``train.py:20,130-138``, ``test.py:57-65``, and the decoder seed rotation at
``models/pcn.py:367-370``).

Conventions match pytorch3d: rotations act on row-vector points,
``p_out = p @ R``; ``random_rotations`` draws uniform SO(3) via normalised
quaternions; ``random_z_rotations`` draws a uniform angle about Z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) [w, x, y, z] -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = 2.0
    m = jnp.stack(
        [
            1 - two * (y * y + z * z), two * (x * y - z * w), two * (x * z + y * w),
            two * (x * y + z * w), 1 - two * (x * x + z * z), two * (y * z - x * w),
            two * (x * z - y * w), two * (y * z + x * w), 1 - two * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def random_rotations(key: jax.Array, batch: int, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform SO(3) rotation matrices, shape (batch, 3, 3)."""
    q = jax.random.normal(key, (batch, 4), dtype=jnp.float32)
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    return quaternion_to_matrix(q).astype(dtype)


def random_z_rotations(key: jax.Array, batch: int, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform rotation about the Z axis, shape (batch, 3, 3).

    Matches ``RotateAxisAngle(angle=rand*360, axis='Z')`` (``train.py:132``).
    """
    ang = jax.random.uniform(key, (batch,), minval=0.0, maxval=2.0 * jnp.pi)
    c, s = jnp.cos(ang), jnp.sin(ang)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    m = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1)
    return m.reshape(batch, 3, 3).astype(dtype)


def rotate_points(points: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Apply row-vector rotation: points (B, N, 3) or (N, 3), rot (B, 3, 3)."""
    if points.ndim == 2:
        return jnp.einsum("nd,bde->bne", points, rot)
    return jnp.einsum("bnd,bde->bne", points, rot)


def sample_rotation(key: jax.Array, mode: str, batch: int):
    """Rotation matrices for an augmentation mode, or None.

    ``mode`` in {'none', 'canonical', 'z', 'so3'}.  'canonical' is a no-op in
    the reference too (README names it but ``train.py:131-134`` only matches
    'z'/'so3').
    """
    if mode == "z":
        return random_z_rotations(key, batch)
    if mode == "so3":
        return random_rotations(key, batch)
    return None
