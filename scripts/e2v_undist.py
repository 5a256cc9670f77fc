"""Undistort E2VID reconstruction PNGs for the e2v evaluation family.

Counterpart of /root/reference/scripts/e2v/undist_*.py (one script per
benchmark there; one parameterized CLI here). EDS ships the reference's
hard-coded distorted event-camera calibrations (undist_eds.py:30-44);
other benchmarks pass --calib as "fx fy cx cy k1 k2 p1 p2" or a json file
with K/dist fields. Output goes to <indir>/../e2calib_undistorted with the
reference's 21-digit frame naming.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp

import numpy as np

# distorted event-camera calibration per EDS calib set (undist_eds.py:30-44)
EDS_CALIBS = {
    "calib0": ([560.8520948927032, 560.6295819972383,
                313.00733235019237, 217.32858679842997],
               [-0.09776467241921379, 0.2143738428636279,
                -0.004710710105172864, -0.004215916089401789]),
    "calib1": ([548.8989250692618, 550.0282089284915,
                313.5293514832678, 219.6325753720951],
               [-0.08095806072593555, 0.15743578875760092,
                -0.0035154416164982195, -0.003950567808338846]),
}


def undistort_dir(indir: str, K4, dist, H: int, W: int):
    import cv2

    K = np.array([[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1.0]])
    dist = np.asarray(dist, np.float64)
    K_new, _roi = cv2.getOptimalNewCameraMatrix(
        K, dist, (W, H), alpha=0, newImgSize=(W, H))
    outdir = osp.join(osp.dirname(indir.rstrip("/")), "e2calib_undistorted")
    os.makedirs(outdir, exist_ok=True)
    assert osp.abspath(outdir) != osp.abspath(indir)
    files = sorted(glob.glob(osp.join(indir, "*.png")))
    for i, fn in enumerate(files):
        img = cv2.imread(fn)
        und = cv2.undistort(img, K, dist, newCameraMatrix=K_new)
        cv2.imwrite(osp.join(outdir, f"{i:021d}.png"), und)
    print(f"undistorted {len(files)} images -> {outdir} "
          f"(K_new fx={K_new[0, 0]:.2f} cx={K_new[0, 2]:.2f})")
    return outdir, K_new


def parse_calib(spec: str):
    if spec.endswith(".json"):
        with open(spec) as f:
            c = json.load(f)
        return c["K"], c.get("dist", c.get("dist_coeffs", [0, 0, 0, 0]))
    vals = [float(v) for v in spec.replace(",", " ").split()]
    return vals[:4], vals[4:]


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="undistort e2vid reconstructions")
    p.add_argument("--indir", required=True,
                   help="dir of e2vid/e2calib PNGs")
    p.add_argument("--benchmark", default="eds")
    p.add_argument("--calibstr", default="calib0",
                   help="EDS calibration set (calib0/calib1)")
    p.add_argument("--calib", default=None,
                   help='non-EDS: "fx fy cx cy k1 k2 p1 p2" or a json file')
    p.add_argument("--res", type=int, nargs=2, default=(480, 640),
                   help="H W of the event camera")
    a = p.parse_args()
    assert "e2vid" in a.indir or "e2calib" in a.indir
    if a.benchmark == "eds":
        K4, dist = EDS_CALIBS[a.calibstr]
    else:
        assert a.calib, "--calib required for non-EDS benchmarks"
        K4, dist = parse_calib(a.calib)
    undistort_dir(a.indir, K4, dist, a.res[0], a.res[1])
