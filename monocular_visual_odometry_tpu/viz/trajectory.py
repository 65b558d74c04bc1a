"""Trajectory + map visualization.

Replaces the reference's PclViewer (``/root/reference/src/display/
pcl_display.cpp``: white estimated trajectory, red keyframes, green ground
truth, map-point cloud) with offline matplotlib exports — same information,
no interactive dependency.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def plot_trajectory(est: np.ndarray, gt: Optional[np.ndarray] = None,
                    map_pts: Optional[np.ndarray] = None,
                    out_path: str = "trajectory.png",
                    title: str = "") -> str:
    """Top-down (x-z) + side (z-y) trajectory plot, estimated vs GT, with
    optional map-point cloud. Returns the written path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    est = np.asarray(est)
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    pe = est[:, :3, 3]
    for ax, (i, j), name in zip(axes, [(0, 2), (2, 1)], ["top-down (x-z)", "side (z-y)"]):
        if map_pts is not None and len(map_pts):
            ax.scatter(map_pts[:, i], map_pts[:, j], s=2, c="#bbbbbb", label="map points")
        ax.plot(pe[:, i], pe[:, j], "-o", ms=2, c="#1f77b4", label="estimated")
        if gt is not None:
            pg = np.asarray(gt)[:, :3, 3]
            ax.plot(pg[:, i], pg[:, j], "-", c="#2ca02c", label="ground truth")
        ax.set_title(name)
        ax.axis("equal")
        ax.legend(fontsize=8)
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path
