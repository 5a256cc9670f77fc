"""Event simulation from video frames (ESIM model).

Self-contained counterpart of /root/reference/scripts/convert_tartan.py
(which shells out to vid2e + esim_torch): generates events from a sequence
of intensity frames with the standard ESIM contrast-threshold model —
per-sequence thresholds sampled U(0.16, 0.34) (convert_tartan.py:199-216),
log-intensity crossings linearly interpolated in time, zero refractory
period — and splits/voxelizes the stream at the original frame timestamps
(convert_tartan.py:264-296).

The upsampling stage (vid2e) is replaced by optional temporal supersampling
via linear log-intensity interpolation between frames, which the crossing
interpolation below subsumes for piecewise-linear brightness.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

LOG_EPS = 1e-3


class ESIM:
    """Per-pixel contrast-threshold event generator."""

    def __init__(self, c_pos: float, c_neg: float):
        self.c_pos = c_pos
        self.c_neg = c_neg
        self.ref: Optional[np.ndarray] = None  # reference log intensity
        self.t_prev: Optional[float] = None
        self.log_prev: Optional[np.ndarray] = None

    def forward(self, img: np.ndarray, t_us: float):
        """Feed one frame (float intensity in [0, 1]); returns events
        (x, y, t, p) generated since the previous frame."""
        logI = np.log(img.astype(np.float64) + LOG_EPS)
        if self.ref is None:
            self.ref = logI.copy()
            self.log_prev = logI
            self.t_prev = t_us
            return (np.empty(0, np.int32),) * 2 + (np.empty(0, np.int64),
                                                   np.empty(0, np.int8))

        H, W = logI.shape
        xs, ys, ts, ps = [], [], [], []
        delta = logI - self.ref
        # number of threshold crossings per pixel (vectorized over polarity)
        for pol, c in ((1, self.c_pos), (-1, self.c_neg)):
            d = delta * pol
            n_ev = np.floor(d / c).astype(np.int64)
            n_ev = np.maximum(n_ev, 0)
            max_n = int(n_ev.max()) if n_ev.size else 0
            if max_n == 0:
                continue
            yy, xx = np.nonzero(n_ev > 0)
            counts = n_ev[yy, xx]
            reps = np.repeat(np.arange(len(yy)), counts)
            k = np.concatenate([np.arange(1, c_ + 1) for c_ in counts])
            # linear interpolation of crossing times within the frame interval
            d_prev = (self.log_prev - self.ref)[yy, xx] * pol
            d_now = d[yy, xx]
            frac = (k * c - d_prev[reps]) / np.maximum(
                (d_now - d_prev)[reps], 1e-12)
            frac = np.clip(frac, 0.0, 1.0)
            t_ev = self.t_prev + frac * (t_us - self.t_prev)
            xs.append(xx[reps].astype(np.int32))
            ys.append(yy[reps].astype(np.int32))
            ts.append(t_ev.astype(np.int64))
            ps.append(np.full(len(reps), pol, np.int8))
            # advance reference by the emitted crossings
            self.ref[yy, xx] += pol * counts * c

        self.log_prev = logI
        self.t_prev = t_us
        if not xs:
            return (np.empty(0, np.int32),) * 2 + (np.empty(0, np.int64),
                                                   np.empty(0, np.int8))
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        t = np.concatenate(ts)
        p = np.concatenate(ps)
        order = np.argsort(t, kind="stable")
        return x[order], y[order], t[order], p[order]


def simulate_sequence(
    frames: Iterator[Tuple[np.ndarray, float]],
    seed: int = 0,
    bins: int = 5,
    contrast_range: Tuple[float, float] = (0.16, 0.34),
):
    """Simulate events for a frame sequence and voxelize between consecutive
    frame timestamps. Yields (voxel (bins, H, W) float32, t_us) per interval.
    """
    from .event_utils import to_voxel_grid

    rng = np.random.default_rng(seed)
    c_pos = float(rng.uniform(*contrast_range))
    c_neg = float(rng.uniform(*contrast_range))
    esim = ESIM(c_pos, c_neg)

    prev_t = None
    for img, t_us in frames:
        x, y, t, p = esim.forward(img, t_us)
        if prev_t is not None:
            H, W = img.shape
            vox = to_voxel_grid(x, y, t, p, H, W, bins)
            yield vox.astype(np.float16), t_us
        prev_t = t_us
