"""Shared evaluation driver for all event benchmarks.

Counterpart of the per-benchmark scripts in /root/reference/evals/eval_evs/
(each an argparse CLI around run_voxel + log_results). One parameterized
implementation serves all 8 benchmarks; the thin eval_*_evs.py wrappers
preserve the reference's one-script-per-benchmark surface.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from devo_tpu.data.loaders import BENCHMARK_RES, benchmark_iterator, load_tum_traj
from devo_tpu.eval.harness import evaluate_sequence
from devo_tpu.runtime.config import EVAL_CONFIGS


def load_params(weights: str):
    if weights.endswith(".pth"):
        from devo_tpu.utils.torch_import import load_checkpoint
        return load_checkpoint(weights)
    from devo_tpu.train.trainer import Trainer
    return Trainer.load_checkpoint(weights)["params"]


def evaluate_benchmark(benchmark: str, args) -> dict:
    cfg = EVAL_CONFIGS.get(benchmark, EVAL_CONFIGS["default"])
    if args.config_overrides:
        cfg = cfg.replace(**json.loads(args.config_overrides))
    params = load_params(args.weights)
    H, W = BENCHMARK_RES[benchmark]

    scenes = open(args.val_split).read().split() if args.val_split else [""]
    results = {}
    for scene in scenes:
        datapath = os.path.join(args.datapath, scene)
        gt_path = os.path.join(datapath, "stamped_groundtruth_us.txt")
        tss_gt_us, traj_gt = load_tum_traj(gt_path)

        med, all_res, fps = evaluate_sequence(
            cfg, params,
            make_iterator=lambda dp=datapath: benchmark_iterator(
                benchmark, dp, stride=args.stride),
            traj_gt=traj_gt, tss_gt=tss_gt_us / 1e6,
            trials=args.trials, ht=H, wd=W,
            outdir=args.outdir, name=scene.replace("/", "_") or benchmark,
        )
        results[scene] = dict(ate_cm=med.ate, mpe=med.mpe, r_rmse=med.r_rmse,
                              fps=float(np.mean(fps)))
        print(f"{scene}: ATE {med.ate:.2f} cm  MPE {med.mpe:.3f} %/m  "
              f"R {med.r_rmse:.2f} deg  {np.mean(fps):.1f} FPS")
    return results


def make_parser(benchmark: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"DEVO-TPU eval on {benchmark}")
    p.add_argument("--datapath", default="", help="path to dataset directory")
    p.add_argument("--weights", default="DEVO.pth",
                   help=".pth (torch) or orbax checkpoint")
    p.add_argument("--val_split", type=str, default=None)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--outdir", type=str, default="results")
    p.add_argument("--config_overrides", type=str, default=None,
                   help='JSON dict of VOConfig overrides')
    return p


def main(benchmark: str):
    args = make_parser(benchmark).parse_args()
    results = evaluate_benchmark(benchmark, args)
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, f"{benchmark}_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
