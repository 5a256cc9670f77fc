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

from devo_tpu.data.benchmarks import benchmark_evs_iterator, load_benchmark_gt
from devo_tpu.data.loaders import BENCHMARK_RES, benchmark_iterator
from devo_tpu.eval.harness import evaluate_sequence
from devo_tpu.runtime.config import EVAL_CONFIGS


def load_params(weights: str):
    if weights.endswith(".pth"):
        from devo_tpu.utils.torch_import import load_checkpoint
        return load_checkpoint(weights)
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(weights)["params"]


def evaluate_benchmark(benchmark: str, args) -> dict:
    cfg = EVAL_CONFIGS.get(benchmark, EVAL_CONFIGS["default"])
    if getattr(args, "config", None):
        # reference-format yaml override (eval_eds_evs.py:85 yacs merge)
        from devo_tpu.runtime.config import VOConfig
        cfg = VOConfig.from_yaml(args.config, base=cfg)
    if args.config_overrides:
        cfg = cfg.replace(**json.loads(args.config_overrides))
    params = load_params(args.weights)
    H, W = BENCHMARK_RES[benchmark]

    scenes = open(args.val_split).read().split() if args.val_split else [""]
    results = {}
    engine_cache = {}   # shared executables across scenes AND trials
    if benchmark == "tartanair":
        return _evaluate_tartanair(cfg, params, scenes, args, engine_cache)
    for scene in scenes:
        datapath = os.path.join(args.datapath, scene)
        # per-benchmark GT formats (load_utils.py:560-634); the quirk-aware
        # iterator knows each benchmark's file conventions, event-window
        # rule, hot-pixel policy and start/stop crops — the generic
        # preprocessed-tree iterator is its fallback
        try:
            tss_gt_us, traj_gt = load_benchmark_gt(benchmark, datapath)
        except (FileNotFoundError, OSError) as e:
            # a scene without GT must not abort the benchmark and drop the
            # already-computed scenes' results from the final JSON
            print(f"[{benchmark}] {scene}: no ground truth ({e}); skipping",
                  file=sys.stderr)
            results[scene] = dict(error=str(e))
            continue

        # driver-pinned iterator settings the reference eval scripts hardcode
        # (eval_tumvie_evs.py:39 passes dT_ms=25 — half the ~50 ms default
        # the mean frame spacing would give at TUM-VIE's image rate)
        it_kw = {"tumvie": {"dT_ms": 25}}.get(benchmark, {})

        def _make_iterator(dp=datapath, gt=tss_gt_us):
            # the quirk iterators are GENERATORS — their file I/O raises at
            # the first next(), not at call time — so probe one item before
            # committing to them, then stitch it back on. Only missing-file
            # errors fall back to the generic preprocessed-tree iterator:
            # a data-sanity AssertionError inside a quirk iterator must
            # surface, not silently swap windowing/hot-pixel semantics.
            import itertools
            try:
                it = benchmark_evs_iterator(benchmark, dp, stride=args.stride,
                                            tss_gt_us=gt, **it_kw)
                first = next(it)
            except (FileNotFoundError, OSError, StopIteration):
                return benchmark_iterator(benchmark, dp, stride=args.stride)
            return itertools.chain([first], it)

        med, all_res, fps = evaluate_sequence(
            cfg, params,
            make_iterator=_make_iterator,
            traj_gt=traj_gt, tss_gt=tss_gt_us / 1e6,
            trials=args.trials, ht=H, wd=W,
            outdir=args.outdir, name=scene.replace("/", "_") or benchmark,
            engine_cache=engine_cache, viz=args.viz,
        )
        results[scene] = dict(ate_cm=med.ate, mpe=med.mpe, r_rmse=med.r_rmse,
                              fps=float(np.mean(fps)),
                              ate_trials=[r.ate for r in all_res])
        print(f"{scene}: ATE {med.ate:.2f} cm  MPE {med.mpe:.3f} %/m  "
              f"R {med.r_rmse:.2f} deg  {np.mean(fps):.1f} FPS")
    # benchmark-level aggregation: per-scene medians + AUC + AVG, plus the
    # reference's LaTeX-row table (eval_utils.py:418-450)
    from devo_tpu.eval.ate import aggregate_results
    results["_summary"] = aggregate_results(
        {k: v["ate_trials"] for k, v in results.items() if "ate_trials" in v},
        benchmark, outfolder=args.outdir)
    return results


def _evaluate_tartanair(cfg, params, scenes, args, engine_cache) -> dict:
    """TartanAir-EVS validation benchmark: pre-voxelized h5 per frame under
    <env>/<difficulty>/evs_left/<Pxxx>/h5, GT from the parallel
    image_left pose_left.txt (NED -> xyz permute, first pose skipped —
    voxel t accumulates events between frames t-1 and t;
    /root/reference/evals/eval_evs/eval_tartan_evs.py:38-55)."""
    from devo_tpu.data.loaders import voxel_h5_iterator
    from devo_tpu.data.tartan import TARTAN_INTRINSICS, evs_scene_dir
    from devo_tpu.train.validate import _load_tartan_gt

    results = {}
    for scene in scenes:
        scenedir = evs_scene_dir(args.datapath, scene)
        vdir = os.path.join(scenedir, "h5") \
            if os.path.isdir(os.path.join(scenedir, "h5")) else scenedir
        traj_gt = _load_tartan_gt(scenedir)
        tss_gt = np.arange(len(traj_gt), dtype=np.float64)

        med, all_res, fps = evaluate_sequence(
            cfg, params,
            make_iterator=lambda vd=vdir, gt=tss_gt: voxel_h5_iterator(
                vd, TARTAN_INTRINSICS, tss_us=gt * 1e6),
            traj_gt=traj_gt, tss_gt=tss_gt,
            trials=args.trials, ht=480, wd=640,
            outdir=args.outdir, name=scene.replace("/", "_") or "tartanair",
            engine_cache=engine_cache, max_diff_s=0.5,
            viz=getattr(args, "viz", False))
        results[scene] = dict(ate_cm=med.ate, mpe=med.mpe, r_rmse=med.r_rmse,
                              fps=float(np.mean(fps)),
                              ate_trials=[r.ate for r in all_res])
        print(f"{scene}: ATE {med.ate:.2f} cm  {np.mean(fps):.1f} FPS")
    from devo_tpu.eval.ate import aggregate_results
    results["_summary"] = aggregate_results(
        {k: v["ate_trials"] for k, v in results.items()},
        "tartanair", outfolder=args.outdir)
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
    p.add_argument("--config", type=str, default=None,
                   help="yaml config file (config/eval_*.yaml), applied on "
                        "top of the benchmark's built-in EVAL_CONFIGS entry")
    p.add_argument("--config_overrides", type=str, default=None,
                   help='JSON dict of VOConfig overrides')
    p.add_argument("--viz", action="store_true",
                   help="attach the live viewer on trial 0 (PNG renders of "
                        "trajectory + point cloud under <outdir>/viz_<scene>;"
                        " the reference's dpviewer viz=True)")
    return p


def main(benchmark: str):
    args = make_parser(benchmark).parse_args()
    results = evaluate_benchmark(benchmark, args)
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, f"{benchmark}_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
