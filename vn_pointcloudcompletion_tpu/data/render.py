"""Partial-view generation: virtual depth-camera z-buffer rendering.

Functional replacement for the reference's offline Blender pipeline
(``render/render_depth.py:33-141`` renders 8 random camera poses to EXR
depth maps; ``render/process_exr.py:34-86`` back-projects them to partial
clouds).  Here the same effect — hidden-point removal from a viewpoint — is a
NumPy z-buffer over the complete cloud: project points through a pinhole
camera on a view sphere, keep the nearest point per pixel, back-project.

Camera convention matches the reference: poses sampled uniformly on a sphere
of fixed radius looking at the origin, ~57 deg horizontal FoV on a square
image (process_exr.py's intrinsics).
"""

from __future__ import annotations

import numpy as np


def look_at(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """World->camera rotation for a camera at ``eye`` looking at ``target``."""
    fwd = target - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, fwd)) > 0.999:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-12
    true_up = np.cross(right, fwd)
    # rows: camera axes (x right, y down-ish, z forward)
    return np.stack([right, -true_up, fwd], axis=0)


def render_partial(
    points: np.ndarray,
    eye: np.ndarray,
    image_size: int = 160,
    focal: float = 140.0,
    splat: int = 1,
    depth_tol: float = 0.03,
) -> np.ndarray:
    """Visible subset of ``points`` (N, 3) from camera ``eye`` (3,).

    Splatted z-buffer hidden-point removal: every point stamps its depth on a
    (2*splat+1)^2 pixel footprint (emulating the surface the mesh renderer
    sees); a point is visible if its depth is within ``depth_tol`` (relative)
    of the depth map at its own pixel.  Without splatting, sparse clouds leak
    back-surface points through silhouette pixels.
    """
    r = look_at(eye, np.zeros(3))
    cam = (points - eye) @ r.T  # (N, 3) camera frame, z forward
    z = cam[:, 2]
    front = z > 1e-6
    cam = cam[front]
    z = z[front]
    u = np.rint(focal * cam[:, 0] / z + image_size / 2).astype(np.int64)
    v = np.rint(focal * cam[:, 1] / z + image_size / 2).astype(np.int64)
    ok = (u >= 0) & (u < image_size) & (v >= 0) & (v < image_size)
    z, u, v = z[ok], u[ok], v[ok]

    depth = np.full(image_size * image_size, np.inf, np.float64)
    for du in range(-splat, splat + 1):
        for dv in range(-splat, splat + 1):
            uu = np.clip(u + du, 0, image_size - 1)
            vv = np.clip(v + dv, 0, image_size - 1)
            np.minimum.at(depth, vv * image_size + uu, z)

    visible = z <= depth[v * image_size + u] * (1.0 + depth_tol)
    original_idx = np.flatnonzero(front)[ok][visible]
    return points[original_idx]


def sample_camera_poses(
    n_views: int, radius: float, rng: np.random.Generator
) -> np.ndarray:
    """Uniform directions on the view sphere (render_depth.py samples random
    poses per model), shape (n_views, 3)."""
    v = rng.standard_normal((n_views, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
    return v * radius


def generate_partials(
    complete: np.ndarray,
    n_views: int = 8,
    radius_scale: float = 3.0,
    image_size: int = 160,
    focal: float = 140.0,
    seed: int = 0,
):
    """The reference's 8-view protocol: one partial scan per camera pose."""
    rng = np.random.default_rng(seed)
    scale = np.abs(complete).max() + 1e-9
    eyes = sample_camera_poses(n_views, radius_scale * scale, rng)
    return [
        render_partial(complete, eye, image_size=image_size, focal=focal)
        for eye in eyes
    ]
