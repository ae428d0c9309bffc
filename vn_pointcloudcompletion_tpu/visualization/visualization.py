"""Point-cloud visualisation (reference ``visualization/visualization.py:12-32``).

One row of 3-D scatter panels (Input / Coarse / Dense / Ground Truth) written
as a PNG per validation epoch.  Matplotlib only; runs host-side outside jit.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def o3d_visualize_pc(pc: np.ndarray) -> None:
    """Interactive point-cloud viewer (reference ``visualization.py:6-9``).

    Host-side utility for manual inspection; requires open3d (optional —
    not part of the training/eval path, which uses :func:`plot_pcd_one_view`).
    """
    try:
        import open3d as o3d
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "o3d_visualize_pc needs the optional open3d package; the "
            "render path (plot_pcd_one_view) is matplotlib-only"
        ) from e
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(np.asarray(pc, dtype=np.float64))
    o3d.visualization.draw_geometries([pcd])


def plot_pcd_one_view(
    filename: str,
    pcds: Sequence[np.ndarray],
    titles: Sequence[str],
    suptitle: str = "",
    sizes: Optional[List[float]] = None,
    cmap: str = "Reds",
    zdir: str = "y",
    xlim=(-0.3, 0.3),
    ylim=(-0.3, 0.3),
    zlim=(-0.3, 0.3),
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if sizes is None:
        sizes = [0.5 for _ in pcds]
    fig = plt.figure(figsize=(len(pcds) * 3, 3))
    for i, (pcd, title) in enumerate(zip(pcds, titles)):
        pcd = np.asarray(pcd)
        color = pcd[:, 0]
        ax = fig.add_subplot(1, len(pcds), i + 1, projection="3d")
        ax.view_init(30, -120)
        ax.scatter(
            pcd[:, 0], pcd[:, 1], pcd[:, 2], zdir=zdir, c=color, s=sizes[i],
            cmap=cmap, vmin=-1.0, vmax=0.5,
        )
        ax.set_title(title)
        ax.set_axis_off()
        ax.set_xlim(xlim)
        ax.set_ylim(ylim)
        ax.set_zlim(zlim)
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    fig.savefig(filename, dpi=120)
    plt.close(fig)


def visualize_pc(pcd: np.ndarray, title: str = "point cloud"):
    """Interactive single-cloud viewer (reference ``o3d_visualize_pc``,
    visualization/visualization.py:6-9) — matplotlib-based, no open3d.
    Headless environments should use :func:`plot_pcd_one_view` instead."""
    import matplotlib.pyplot as plt

    pcd = np.asarray(pcd)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pcd[:, 0], pcd[:, 1], pcd[:, 2], s=0.5, c=pcd[:, 0], cmap="Reds")
    ax.set_title(title)
    plt.show()
