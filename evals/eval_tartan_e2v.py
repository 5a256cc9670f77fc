"""E2VID-reconstruction evaluation on TartanAir validation scenes.

Counterpart of /root/reference/evals/eval_e2v/eval_tartan_e2v.py: run the
engine in frame mode over per-frame E2VID PNG reconstructions
(<datapath>/<scene>/e2calib/*.png) and score against the TartanAir
pose_left.txt GT (NED -> xyz permute, eval_tartan_e2v.py:41-42).
"""
from __future__ import annotations

import glob
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from devo_tpu.eval.harness import evaluate_sequence
from devo_tpu.runtime.config import EVAL_CONFIGS
from common import load_params, make_parser
from common_frames import frame_iterator

from devo_tpu.data.tartan import TARTAN_INTRINSICS as TARTAN_INTR
NED_PERM = [1, 2, 0, 4, 5, 3, 6]       # ned -> xyz (eval_tartan_e2v.py:41)


def main():
    args = make_parser("tartanair:e2v").parse_args()
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
        datapath = osp.join(args.datapath, scene)
        imgdir = next((d for d in (osp.join(datapath, "e2calib"), datapath)
                       if glob.glob(osp.join(d, "*.png"))), datapath)
        # GT: TartanAir pose file next to the image tree
        pose_file = osp.join(datapath.replace("e2v", "image_left"),
                             "pose_left.txt")
        if not osp.exists(pose_file):
            pose_file = osp.join(datapath, "pose_left.txt")
        traj_gt = np.loadtxt(pose_file, delimiter=" ")[1::args.stride]
        traj_gt = traj_gt[:, NED_PERM].astype(np.float32)
        tss_gt = np.arange(len(traj_gt), dtype=np.float64)

        med, all_res, fps = evaluate_sequence(
            cfg, params,
            make_iterator=lambda d=imgdir: frame_iterator(
                d, TARTAN_INTR, args.stride),
            traj_gt=traj_gt, tss_gt=tss_gt,
            trials=args.trials, ht=480, wd=640, outdir=args.outdir,
            name=(scene.replace("/", "_") or "tartan") + "_e2v")
        results[scene] = dict(ate_cm=med.ate, mpe=med.mpe, r_rmse=med.r_rmse)
        print(scene, results[scene])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
