"""Dataset preprocessing primitives.

Shared implementation behind the scripts/pp_*.py one-time preprocessing
CLIs, mirroring /root/reference/scripts/pp_{eds,tumvie,fpv,hku,mvsec,rpg,
vector,ecd}.py: microsecond time-offset normalization of events / GT /
image stamps, undistortion rectify-map computation (plain and fisheye via
OpenCV), and the standard sidecar outputs (rectify_map*.h5,
calib_undist*.json, t_offset_us.txt, stamped_groundtruth_us.txt).
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None
try:
    import h5py
except Exception:  # pragma: no cover
    h5py = None


def normalize_time_offsets(indir: str, tss_evs_us: np.ndarray,
                           gt: Optional[np.ndarray] = None,
                           tss_imgs_us: Optional[np.ndarray] = None):
    """Subtract the global minimum timestamp so everything starts near 0
    (pp_eds.py:34-57). Returns (offset_us, shifted arrays); writes the
    standard sidecar files."""
    mins = [tss_evs_us.min()]
    if gt is not None:
        mins.append(gt[:, 0].min())
    if tss_imgs_us is not None:
        mins.append(tss_imgs_us.min())
    offset_us = np.int64(min(mins))

    out = {}
    out["events_t"] = tss_evs_us - offset_us
    if gt is not None:
        gt = gt.copy()
        gt[:, 0] -= offset_us
        np.savetxt(os.path.join(indir, "stamped_groundtruth_us.txt"), gt,
                   header="#timestamp[us] px py pz qx qy qz qw")
        out["gt"] = gt
    if tss_imgs_us is not None:
        tss = tss_imgs_us - offset_us
        np.savetxt(os.path.join(indir, "images_timestamps_us.txt"), tss, fmt="%d")
        out["tss_imgs_us"] = tss
    np.savetxt(os.path.join(indir, "t_offset_us.txt"), np.asarray([offset_us]))
    return offset_us, out


def compute_rectify_map(K: np.ndarray, dist: np.ndarray, H: int, W: int,
                        K_new: Optional[np.ndarray] = None,
                        fisheye: bool = False) -> np.ndarray:
    """Per-pixel undistortion lookup: for each raw pixel (x, y), the
    undistorted coordinates (pp_mvsec.py:15-41 uses the fisheye model).
    Returns (H, W, 2) float32."""
    coords = np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1
                      ).reshape(-1, 1, 2).astype(np.float32)
    if K_new is None:
        K_new = K
    if fisheye:
        und = cv2.fisheye.undistortPoints(coords, K, dist[:4], P=K_new)
    else:
        und = cv2.undistortPoints(coords, K, dist, P=K_new)
    return und.reshape(H, W, 2).astype(np.float32)


def save_rectify_map(path: str, rectify_map: np.ndarray):
    with h5py.File(path, "w") as f:
        f.create_dataset("rectify_map", data=rectify_map)


def save_calib_undist(path: str, K_new: np.ndarray, H: int, W: int):
    with open(path, "w") as f:
        json.dump({"intrinsics_undistorted": {
            "fx": float(K_new[0, 0]), "fy": float(K_new[1, 1]),
            "cx": float(K_new[0, 2]), "cy": float(K_new[1, 2]),
            "H": H, "W": W}}, f, indent=2)


def preprocess_sequence(
    indir: str,
    K: np.ndarray, dist: np.ndarray, H: int, W: int,
    fisheye: bool = False, calibstr: str = "calib0",
    events_file: str = "events.h5",
    gt_file: str = "stamped_groundtruth.txt", gt_tss_unit: float = 1e6,
    imgs_ts_file: Optional[str] = "images_timestamps.txt",
):
    """Full per-sequence preprocessing: time offsets + rectify map + calib."""
    evpath = os.path.join(indir, events_file)
    with h5py.File(evpath, "r") as f:
        t = np.asarray(f["events/t"] if "events" in f else f["t"])

    gt = None
    gtp = os.path.join(indir, gt_file)
    if os.path.exists(gtp):
        gt = np.loadtxt(gtp)
        gt[:, 0] *= gt_tss_unit

    tss_imgs = None
    tsp = os.path.join(indir, imgs_ts_file) if imgs_ts_file else None
    if tsp and os.path.exists(tsp):
        tss_imgs = np.loadtxt(tsp)

    offset, _ = normalize_time_offsets(indir, t, gt, tss_imgs)

    K_new, _ = cv2.getOptimalNewCameraMatrix(K, dist, (W, H), 0) \
        if not fisheye else (K, None)
    rmap = compute_rectify_map(K, dist, H, W, K_new, fisheye=fisheye)
    save_rectify_map(os.path.join(indir, f"rectify_map_{calibstr}.h5"), rmap)
    save_calib_undist(os.path.join(indir, "calib_undist.json"), K_new, H, W)
    return offset
