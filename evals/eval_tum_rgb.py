"""RGB evaluation on TUM-RGBD freiburg sequences.

Counterpart of /root/reference/evals/eval_rgb/eval_tum.py: undistort with
the freiburg1 factory calibration, downscale to 352x256 (320+32, 240+16),
scale intrinsics accordingly, and run the engine in frame mode. GT is the
TUM `groundtruth.txt` (t x y z qx qy qz qw, seconds).
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from devo_tpu.data.loaders import load_tum_traj
from devo_tpu.eval.harness import evaluate_sequence
from devo_tpu.runtime.config import EVAL_CONFIGS
from common import load_params, make_parser

# freiburg1 factory calibration (eval_tum.py:44-46)
TUM_FX, TUM_FY, TUM_CX, TUM_CY = 517.3, 516.5, 318.6, 255.3
TUM_DIST = np.asarray([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])
H_OUT, W_OUT = 240 + 16, 320 + 32      # eval_tum.py:55


def tum_image_iterator(scene_dir: str, stride: int = 1, skip: int = 0):
    import cv2

    K = np.asarray([[TUM_FX, 0.0, TUM_CX],
                    [0.0, TUM_FY, TUM_CY],
                    [0.0, 0.0, 1.0]])
    files = sorted(glob.glob(os.path.join(scene_dir, "rgb", "*.png")))
    files = files[skip::stride]
    sx, sy = W_OUT / 640.0, H_OUT / 480.0
    intr = np.asarray([TUM_FX * sx, TUM_FY * sy, TUM_CX * sx, TUM_CY * sy],
                      np.float32)
    for fn in files:
        img = cv2.imread(fn)
        img = cv2.undistort(img, K, TUM_DIST)
        img = cv2.resize(img, (W_OUT, H_OUT))
        ts = float(os.path.splitext(os.path.basename(fn))[0])
        yield img.transpose(2, 0, 1).astype(np.float32), intr, ts


def main():
    args = make_parser("tum:rgb").parse_args()
    cfg = EVAL_CONFIGS["default"].replace(
        EVS=False, BINS=3, PATCH_SELECTOR="random", NORM="none",
        SCORER_EVAL_MODE="random", SCORER_EVAL_USE_GRID=False,
        OPTIMIZATION_WINDOW=15, KEYFRAME_THRESH=15.0)
    if args.config_overrides:
        cfg = cfg.replace(**json.loads(args.config_overrides))
    params = load_params(args.weights)

    scenes = open(args.val_split).read().split() if args.val_split else [""]
    results = {}
    for scene in scenes:
        datapath = os.path.join(args.datapath, scene)
        tss_gt_s, traj_gt = load_tum_traj(
            os.path.join(datapath, "groundtruth.txt"))
        med, all_res, fps = evaluate_sequence(
            cfg, params,
            make_iterator=lambda dp=datapath: tum_image_iterator(
                dp, args.stride),
            traj_gt=traj_gt, tss_gt=tss_gt_s,
            trials=args.trials, ht=H_OUT, wd=W_OUT, outdir=args.outdir,
            name=(scene.replace("/", "_") or "tum") + "_rgb")
        results[scene] = dict(ate_cm=med.ate, mpe=med.mpe, r_rmse=med.r_rmse)
        print(scene, results[scene])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
