"""Preprocess mvsec sequences (MVSEC: 260x346 DAVIS, fisheye (pp_mvsec.py:15-41)).

One-time per-sequence preparation mirroring /root/reference/scripts/pp_mvsec.py:
normalizes all timestamps to a common microsecond origin and computes the
undistortion rectify map consumed by the event-voxel iterators.

Usage: python scripts/pp_mvsec.py --indir <seq_dir> [--calib <calib.json>]
The calib JSON must contain {"K": 3x3, "dist": [...]} for the event camera
(as distributed with the benchmark or produced by its calibration files).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from devo_tpu.data.preprocess import preprocess_sequence

H, W = 260, 346
FISHEYE = True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", required=True, nargs="+")
    p.add_argument("--calib", default=None, help="JSON with K (3x3) and dist")
    args = p.parse_args()
    for indir in args.indir:
        calib_path = args.calib or os.path.join(indir, "calib.json")
        with open(calib_path) as f:
            calib = json.load(f)
        K = np.asarray(calib["K"], np.float64).reshape(3, 3)
        dist = np.asarray(calib.get("dist", [0, 0, 0, 0]), np.float64)
        off = preprocess_sequence(indir, K, dist, H, W, fisheye=FISHEYE)
        print(f"{indir}: offset {off} us, rectify map + calib written")


if __name__ == "__main__":
    main()
