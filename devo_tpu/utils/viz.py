"""Visualization utilities.

Counterpart of /root/reference/utils/viz_utils.py and devo/plot_utils.py:
voxel rendering to RGB, score-map overlays, patch/flow drawing, and
trajectory plots + TUM export. Matplotlib-only (the reference's optional
dpviewer 3D viewer has no headless TPU equivalent; the point cloud is
exposed via DEVO.point_cloud() for external viewers).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def render_voxel(voxel: np.ndarray, eps: float = 1e-3) -> np.ndarray:
    """(bins, H, W) voxel -> (H, W, 3) uint8: positive red, negative blue
    (viz_utils.py voxel rendering convention)."""
    img = voxel.sum(0)
    out = np.full(img.shape + (3,), 255, np.uint8)
    out[img > eps] = (255, 0, 0)
    out[img < -eps] = (0, 0, 255)
    return out


def render_scorer_map(scores: np.ndarray) -> np.ndarray:
    """(h, w) score map -> (h, w, 3) heat image."""
    s = (scores - scores.min()) / max(float(scores.max() - scores.min()), 1e-9)
    out = np.zeros(s.shape + (3,), np.uint8)
    out[..., 0] = (255 * s).astype(np.uint8)
    out[..., 2] = (255 * (1 - s)).astype(np.uint8)
    return out


def draw_patches(img: np.ndarray, coords: np.ndarray, color=(0, 255, 0)) -> np.ndarray:
    """Draw patch centers (M, 2) on an (H, W, 3) image."""
    out = img.copy()
    H, W = out.shape[:2]
    for x, y in np.asarray(coords).reshape(-1, 2):
        xi, yi = int(round(x)), int(round(y))
        if 0 <= yi < H and 0 <= xi < W:
            out[max(yi - 1, 0):yi + 2, max(xi - 1, 0):xi + 2] = color
    return out


def plot_trajectory(path: str, poses_est: np.ndarray,
                    poses_gt: Optional[np.ndarray] = None, title: str = ""):
    """Top-down + side trajectory plot (plot_utils.py:25-91)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for ax, (a, b), lbl in zip(axes, [(0, 1), (0, 2)], ["xy", "xz"]):
        ax.plot(poses_est[:, a], poses_est[:, b], "b-", lw=0.8, label="est")
        if poses_gt is not None:
            ax.plot(poses_gt[:, a], poses_gt[:, b], "k--", lw=0.8, label="gt")
        ax.set_xlabel(lbl[0]); ax.set_ylabel(lbl[1]); ax.axis("equal")
        ax.legend()
    fig.suptitle(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def save_flow_visualization(outdir: str, flow_data: Dict):
    """Per-frame patch-flow overlays (viz_utils.py:698-774 spirit)."""
    import os
    os.makedirs(outdir, exist_ok=True)
    for t, rec in flow_data.items():
        img = rec.get("img")
        if img is None:
            continue
        coords = np.asarray(rec["coords_est"])[..., 1, 1, :]
        out = draw_patches(np.asarray(img), coords)
        try:
            import cv2
            cv2.imwrite(os.path.join(outdir, f"{t:06d}.png"), out[..., ::-1])
        except Exception:
            pass
