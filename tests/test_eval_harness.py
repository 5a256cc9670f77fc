"""Eval-harness + in-training-validation integration tests.

Drives the REAL engine through the evaluation stack the way the CLIs and
the trainer do (/root/reference/utils/eval_utils.py run_voxel/log_results,
train.py:282-294 in-training eval): multi-trial evaluate_sequence with
engine reuse and TUM/JSON artifacts, and validate_tartan_evs over a
synthetic TartanAir-EVS tree.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.eval.harness import evaluate_sequence
from devo_tpu.nets.evonet import EVONet
from devo_tpu.runtime.config import VOConfig

HT, WD = 64, 96
INTR = np.asarray([60.0, 60.0, WD / 2, HT / 2], np.float32)

CFG = VOConfig(
    BUFFER_SIZE=64, PATCHES_PER_FRAME=16, REMOVAL_WINDOW=8,
    OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5, KEYFRAME_INDEX=2,
    KEYFRAME_THRESH=1e-3, MOTION_PROBE_THRESH=-1.0, MEM=16,
    MIXED_PRECISION=False, DIM_INET=64, DIM_FNET=32, DIM=8,
    HT=HT, WD=WD)

N_FRAMES = 12


def _params():
    net = EVONet(P=CFG.P, dim_inet=CFG.DIM_INET, dim_fnet=CFG.DIM_FNET,
                 dim=CFG.DIM, patch_selector=CFG.PATCH_SELECTOR)
    return net.init(jax.random.PRNGKey(0), jnp.zeros((1, HT, WD, 5)),
                    jax.random.PRNGKey(1))["params"]


def _voxels(n=N_FRAMES, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((5, HT, WD * 2)).astype(np.float32)
    base *= (rng.random((5, HT, WD * 2)) < 0.2)
    return [base[:, :, 2 * i:2 * i + WD] for i in range(n)]


@pytest.fixture(scope="module")
def shared():
    """One compiled engine serves every test in this module (the harness's
    engine_cache contract, eval/harness.py:40-46)."""
    return {"params": _params(), "engine_cache": {}}


def test_frames_driver_rejects_missing_intrinsics(tmp_path):
    """The frame-eval driver must fail at setup when calib_undist.txt is
    absent, not fabricate a pinhole (VERDICT r02 weak #5; the evs path
    already fails, data/loaders.py)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "evals"))
    from common_frames import load_undist_intrinsics

    with pytest.raises(FileNotFoundError, match="calib_undist.txt"):
        load_undist_intrinsics(str(tmp_path))
    np.savetxt(os.path.join(str(tmp_path), "calib_undist.txt"),
               [100.0, 101.0, 32.0, 24.0])
    np.testing.assert_allclose(load_undist_intrinsics(str(tmp_path)),
                               [100.0, 101.0, 32.0, 24.0])


def test_evaluate_sequence_artifacts(tmp_path, shared):
    vox = _voxels()
    gt = np.zeros((N_FRAMES, 7), np.float32)
    gt[:, 0] = 0.05 * np.arange(N_FRAMES)   # forward track
    gt[:, 6] = 1.0
    tss = np.arange(N_FRAMES, dtype=np.float64)

    def make_iterator():
        return iter([(v, INTR, float(t)) for v, t in zip(vox, tss)])

    med, results, fps = evaluate_sequence(
        CFG, shared["params"], make_iterator,
        traj_gt=gt, tss_gt=tss, trials=2, ht=HT, wd=WD,
        max_diff_s=0.5, outdir=str(tmp_path), name="synt",
        engine_cache=shared["engine_cache"])

    assert len(results) == 2 and len(fps) == 2
    assert np.isfinite(med.ate) and np.isfinite(med.mpe) \
        and np.isfinite(med.r_rmse)
    # one engine for both trials
    assert len(shared["engine_cache"]) == 1
    # per-trial TUM dumps: (N, 8) rows, monotonically increasing stamps
    for trial in range(2):
        dump = np.loadtxt(tmp_path / f"synt_trial{trial}.txt")
        assert dump.shape[1] == 8 and len(dump) == N_FRAMES
        assert (np.diff(dump[:, 0]) > 0).all()
    blob = json.loads((tmp_path / "synt_results.json").read_text())
    assert {"median", "trials", "fps"} <= set(blob)
    assert blob["median"]["ate"] == pytest.approx(med.ate)


def test_validate_tartan_evs(tmp_path, shared):
    """In-training validation runs the engine over a synthetic TartanAir-EVS
    tree and returns logger scalars + trajectory figures
    (ref train.py:282-294, devo/logger.py:55-60)."""
    import h5py

    from devo_tpu.train.validate import validate_tartan_evs

    scene = tmp_path / "Env" / "Easy" / "evs_left" / "P001"
    (scene / "h5").mkdir(parents=True)
    img = tmp_path / "Env" / "Easy" / "image_left" / "P001"
    img.mkdir(parents=True)
    vox = _voxels(N_FRAMES + 0, seed=1)
    for i, v in enumerate(vox):
        with h5py.File(scene / "h5" / f"{i:06d}.h5", "w") as f:
            f.create_dataset("voxel", data=v.astype(np.float16))
    poses = np.zeros((N_FRAMES + 1, 7))
    poses[:, 0] = 0.05 * np.arange(N_FRAMES + 1)
    poses[:, 6] = 1.0
    np.savetxt(img / "pose_left.txt", poses, delimiter=" ")

    figs = tmp_path / "figs"
    m = validate_tartan_evs(
        shared["params"], [str(scene)], cfg=CFG,
        engine_cache=shared["engine_cache"], max_frames=N_FRAMES,
        figures_dir=str(figs), step=7, ht=HT, wd=WD, intrinsics=INTR)

    assert "val/ate_mean" in m and np.isfinite(m["val/ate_mean"])
    scene_keys = [k for k in m if k.endswith("/ate") and k != "val/ate_mean"]
    assert len(scene_keys) == 1
    pngs = list(figs.glob("*step7.png"))
    assert len(pngs) == 1
    # engine was reused, not rebuilt (same (H, W) key)
    assert len(shared["engine_cache"]) == 1


def test_eds_iterator_through_engine(tmp_path, shared):
    """Full benchmark pipeline on a synthetic EDS-format sequence: raw
    events.h5 + rectify map + image stamps -> eds_evs_iterator (EventSlicer
    windows, voxelization, hot-pixel filter, resize) -> tracking engine ->
    Sim3 ATE. This is the exact chain evals/eval_eds_evs.py runs
    (/root/reference/evals/eval_evs/eval_eds_evs.py:36-38)."""
    import h5py

    from devo_tpu.data import benchmarks as bm
    from devo_tpu.data.event_utils import compute_ms_to_idx

    d = str(tmp_path)
    n_imgs, dt_us = N_FRAMES + 2, 33_000
    rng = np.random.default_rng(3)
    # ~0.15 events/pixel/window (real EDS density): the hot-pixel filter's
    # 10-sigma threshold is a mid-distribution cut on an unrealistically
    # sparse uniform voxel (sigma collapses with 99%+ zeros), which would
    # zero most events and trip the engine's empty-voxel skip
    n_ev = 1_200_000
    t = np.sort(rng.integers(0, n_imgs * dt_us + 20_000, n_ev))
    with h5py.File(tmp_path / "events.h5", "w") as f:
        f.create_dataset("events/t", data=t.astype(np.int64))
        f.create_dataset("events/x", data=rng.integers(0, 640, n_ev).astype(np.uint16))
        f.create_dataset("events/y", data=rng.integers(0, 480, n_ev).astype(np.uint16))
        f.create_dataset("events/p", data=(rng.integers(0, 2, n_ev) * 2 - 1).astype(np.int8))
        f.create_dataset("ms_to_idx", data=compute_ms_to_idx(t))
    gx, gy = np.meshgrid(np.arange(640, dtype=np.float32),
                         np.arange(480, dtype=np.float32))
    with h5py.File(tmp_path / "rectify_map_calib0.h5", "w") as f:
        f.create_dataset("rectify_map", data=np.stack([gx, gy], -1))
    tss_us = np.arange(n_imgs, dtype=np.float64) * dt_us + 4_000
    np.savetxt(tmp_path / "images_timestamps_us.txt", tss_us)

    gt = np.zeros((n_imgs, 7), np.float32)
    gt[:, 0] = 0.03 * np.arange(n_imgs)
    gt[:, 6] = 1.0

    med, results, fps = evaluate_sequence(
        CFG, shared["params"],
        make_iterator=lambda: bm.eds_evs_iterator(d, H=HT, W=WD),
        traj_gt=gt, tss_gt=tss_us / 1e6, trials=1, ht=HT, wd=WD,
        max_diff_s=0.5, outdir=str(tmp_path / "out"), name="eds_synt",
        engine_cache=shared["engine_cache"])
    assert np.isfinite(med.ate)
    assert len(shared["engine_cache"]) == 1   # reused the module's engine
    dump = np.loadtxt(tmp_path / "out" / "eds_synt_trial0.txt")
    # iterator drops the last image stamp (window needs a right edge)
    assert len(dump) >= n_imgs - 2
    # engine timestamps are the window midpoints (t0 + dT/2) in seconds
    # (load_utils.py:76); EDS dT = half the mean image spacing
    np.testing.assert_allclose(dump[0, 0], (tss_us[0] + dt_us / 4) / 1e6,
                               rtol=1e-6)


def test_run_voxel_norm_seq(shared):
    """Batched sequence normalization variant
    (eval_utils.py:69-107): N_norm frames are rescaled jointly per polarity
    before tracking, and the engine runs with NORM='none' under a cache key
    that cannot collide with the std-normalizing engines."""
    from devo_tpu.eval.harness import run_voxel_norm_seq

    vox = _voxels()
    it = iter([(v, INTR, float(i)) for i, v in enumerate(vox)])
    poses, tss, fps = run_voxel_norm_seq(
        CFG, shared["params"], it, HT, WD, N_norm=6,
        engine_cache=shared["engine_cache"])
    assert poses.shape == (N_FRAMES, 7) and np.isfinite(poses).all()
    # the NORM='none' engine got its own cache slot (cfg is in the key)
    assert len(shared["engine_cache"]) == 2
