"""In-training validation on TartanAir-EVS val scenes.

Counterpart of the reference's every-10k-steps evaluation hook
(/root/reference/train.py:282-294): run the full DEVO inference engine over
each validation sequence with the CURRENT training params, compute
Sim3-aligned ATE, and return scalars (+ optional trajectory figures) for the
logger (devo/logger.py:55-60 write_figures).

Engines are cached across validation rounds — a fresh DEVO per round would
re-jit every bucket executable (10-90 s each on the remote compiler).
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Optional

import numpy as np

from devo_tpu.data.loaders import voxel_h5_iterator
from devo_tpu.data.tartan import DEPTH_SCALE, TARTAN_INTRINSICS
from devo_tpu.eval.ate import ate_real
from devo_tpu.eval.harness import run_voxel
from devo_tpu.runtime.config import EVAL_CONFIGS, VOConfig


def _load_tartan_gt(scene: str) -> np.ndarray:
    """GT c2w poses for an evs_left scene dir (NED -> camera permute +
    DEPTH_SCALE, matching data/tartan.py pose_read)."""
    pose_path = osp.join(scene.replace("evs_left", "image_left"),
                         "pose_left.txt")
    poses = np.loadtxt(pose_path, delimiter=" ")[1:]
    poses = poses[:, [1, 2, 0, 4, 5, 3, 6]]
    poses[:, :3] /= DEPTH_SCALE
    return poses.astype(np.float32)


def validate_tartan_evs(
    params,
    val_scenes,
    cfg: Optional[VOConfig] = None,
    engine_cache: Optional[dict] = None,
    max_frames: Optional[int] = None,
    figures_dir: Optional[str] = None,
    step: int = 0,
    ht: int = 480, wd: int = 640,
    intrinsics: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Run VO on each val scene; returns {"val/<scene>/ate": cm, ...,
    "val/ate_mean": cm}. `val_scenes` are evs_left dirs of voxel h5 files."""
    cfg = cfg or EVAL_CONFIGS.get("tartanair", EVAL_CONFIGS["default"])
    if engine_cache is None:
        engine_cache = {}
    metrics: Dict[str, float] = {}
    ates = []
    for scene in val_scenes:
        name = "_".join(scene.rstrip("/").split(os.sep)[-3:])
        gt = _load_tartan_gt(scene)
        tss = np.arange(len(gt), dtype=np.float64)

        vdir = osp.join(scene, "h5") if osp.isdir(osp.join(scene, "h5")) \
            else scene

        intr = TARTAN_INTRINSICS if intrinsics is None else intrinsics

        def it():
            gen = voxel_h5_iterator(vdir, intr, tss_us=tss * 1e6)
            for i, item in enumerate(gen):
                if max_frames is not None and i >= max_frames:
                    break
                yield item

        try:
            poses, tss_est, _fps = run_voxel(cfg, params, it(), ht, wd,
                                             engine_cache=engine_cache)
        except Exception as e:  # noqa: BLE001 — validation must not kill a
            # 100k-step training run: IO errors (OSError/FileNotFoundError
            # from h5py) are as likely as RuntimeError here. A silently
            # skipped scene would make val/ate_mean look better over an
            # unannounced subset — record the failure loudly instead.
            print(f"[val] scene {name} FAILED: {type(e).__name__}: {e}")
            metrics[f"val/{name}/failed"] = 1.0
            continue
        m = ate_real(poses, tss_est, gt, tss, max_diff=0.5)
        metrics[f"val/{name}/ate"] = float(m.ate)
        ates.append(float(m.ate))
        if figures_dir:
            _save_traj_figure(figures_dir, name, step, poses, gt)
    if ates:
        metrics["val/ate_mean"] = float(np.mean(ates))
    return metrics


def _save_traj_figure(outdir: str, name: str, step: int,
                      poses_est: np.ndarray, poses_gt: np.ndarray):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    os.makedirs(outdir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(poses_gt[:, 0], poses_gt[:, 1], "k-", lw=1, label="GT")
    ax.plot(poses_est[:, 0], poses_est[:, 1], "b-", lw=1, label="est")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(osp.join(outdir, f"{name}_step{step}.png"), dpi=100)
    plt.close(fig)
