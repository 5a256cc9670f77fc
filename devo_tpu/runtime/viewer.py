"""Live tracking viewer — the dpviewer equivalent (devo.py:139-149, :205-206,
:388-389).

The reference spawns an OpenGL window (thirdparty dpviewer) that watches the
engine's pose/point/color buffers and redraws continuously. This image has
no display stack, and on this platform every synchronous device read costs a
flat ~31 ms tunnel round-trip (PERF_NOTES.md "Tunnel characteristics"), so a
continuously-polling renderer would steal a third of the main loop's
dispatch bandwidth. The TPU-native equivalent is therefore:

- a daemon thread that snapshots the engine state at a bounded rate
  (default every 2 s of wall time) — all device reads happen on the viewer
  thread, never the tracking loop;
- a matplotlib 3-D render (trajectory + patch-center point cloud + current
  input frame inset) written as PNG frames to a directory, which works
  headless and doubles as a progress artifact for long evals.

Interface mirrors the reference: ``DEVO.start_viewer()`` to attach,
``viewer.update_image(image)`` per frame (cheap: stores a host reference),
``viewer.join()`` at terminate.
"""
from __future__ import annotations

import os
import threading
import time

import numpy as np

__all__ = ["Viewer"]


class Viewer:
    """Background renderer of the engine's live state.

    Parameters
    ----------
    engine : DEVO
        The tracking engine to watch (reads ``state``, ``point_cloud()``).
    out_dir : str
        Directory for ``frame_%06d.png`` renders.
    period : float
        Minimum seconds between renders (device-read throttle).
    max_points : int
        Cap on rendered points (matplotlib slows past ~50k).
    """

    def __init__(self, engine, out_dir: str = "viewer_out",
                 period: float = 2.0, max_points: int = 20000):
        self.engine = engine
        self.out_dir = out_dir
        self.period = float(period)
        self.max_points = int(max_points)
        self._image = None           # latest input frame (host array)
        self._stop = threading.Event()
        self._frame_idx = 0
        os.makedirs(out_dir, exist_ok=True)
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    # -- reference-interface methods (devo.py:388-389, :205-206) ----------

    def update_image(self, image):
        """Store the latest input frame for the inset (host-side only —
        called from the tracking loop, must not touch the device)."""
        self._image = np.asarray(image)

    def join(self, timeout: float | None = 10.0):
        """Stop the render thread and write one final frame."""
        self._stop.set()
        self._t.join(timeout)
        try:
            self._render()
        except Exception:
            pass

    # -- internals ---------------------------------------------------------

    def _snapshot(self):
        """One throttled device read of poses + points + colors."""
        eng = self.engine
        st = eng.state
        n = int(st.n)                      # ~31 ms sync, viewer thread only
        if n < 2 or not bool(st.initialized):
            return None
        pts = eng.point_cloud()            # (n*M, 3) host
        poses = np.asarray(st.poses[:n])   # w2c quaternions (x y z qx..qw)
        colors = np.asarray(st.colors[:n]).reshape(-1)
        return poses, pts, colors

    def _render(self):
        snap = self._snapshot()
        if snap is None:
            return
        poses, pts, colors = snap
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from devo_tpu.lie import se3
        import jax.numpy as jnp

        # camera centers: c2w translation = -R^T t of the w2c pose
        c2w = np.asarray(se3.inv(jnp.asarray(poses)))
        cam = c2w[:, :3]

        # drop far outliers so one bad depth doesn't flatten the view
        if len(pts):
            d = np.linalg.norm(pts - np.median(pts, 0), axis=1)
            keep = d < 10.0 * (np.median(d) + 1e-6)
            pts, colors = pts[keep], colors[keep]
        if len(pts) > self.max_points:
            sel = np.random.default_rng(0).choice(
                len(pts), self.max_points, replace=False)
            pts, colors = pts[sel], colors[sel]

        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(111, projection="3d")
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5,
                       c=np.clip(colors, 0, 1), cmap="viridis", alpha=0.6)
        ax.plot(cam[:, 0], cam[:, 1], cam[:, 2], "r-", lw=1.5)
        ax.scatter(cam[-1:, 0], cam[-1:, 1], cam[-1:, 2], c="red", s=30,
                   marker="^")
        ax.set_title(f"devo_tpu live — {len(cam)} keyframes, "
                     f"{len(pts)} points")
        ax.set_box_aspect((1, 1, 1))

        if self._image is not None:
            img = self._image
            if img.ndim == 3 and img.shape[-1] > 3:   # voxel grid: sum bins
                img = np.abs(img).sum(-1)
            ax2 = fig.add_axes([0.02, 0.68, 0.28, 0.28])
            ax2.imshow(img, cmap="gray")
            ax2.set_xticks([]), ax2.set_yticks([])

        fig.savefig(os.path.join(self.out_dir,
                                 f"frame_{self._frame_idx:06d}.png"), dpi=80)
        plt.close(fig)
        self._frame_idx += 1

    def _run(self):
        while not self._stop.wait(self.period):
            try:
                self._render()
            except Exception:
                # a transient device error (rebucket race, tunnel hiccup)
                # must never kill tracking; skip the frame
                continue
