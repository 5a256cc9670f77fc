"""End-to-end smoke tests for the VO engine on synthetic data.

Generates a synthetic event-voxel sequence of a textured moving scene and
checks the full tracking pipeline: initialization at 8 keyframes, update +
keyframe cycles, trajectory output shape/finiteness, and static-shape
stability (no recompilation across frames).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.nets.evonet import EVONet
from devo_tpu.runtime.config import VOConfig
from devo_tpu.runtime.engine import DEVO

HT, WD = 64, 96

TEST_CFG = VOConfig(
    BUFFER_SIZE=64,
    PATCHES_PER_FRAME=16,
    REMOVAL_WINDOW=8,
    OPTIMIZATION_WINDOW=6,
    PATCH_LIFETIME=5,
    KEYFRAME_INDEX=2,
    KEYFRAME_THRESH=1e-3,   # effectively never remove (motion test small scene)
    MOTION_PROBE_THRESH=-1.0,  # probe is a learned gate; disable for random weights
    MEM=16,
    MIXED_PRECISION=False,
    DIM_INET=64,
    DIM_FNET=32,
    DIM=8,
)


def make_params(cfg, seed=0):
    net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                 dim=cfg.DIM, patch_selector=cfg.PATCH_SELECTOR)
    vox = jnp.zeros((1, HT, WD, 5))
    variables = net.init(jax.random.PRNGKey(seed), vox, jax.random.PRNGKey(1))
    return variables["params"]


def synthetic_voxels(n_frames=14, seed=0):
    """Moving random-texture 'events': shift a sparse random pattern by 2px
    per frame so there is real optical flow for the probe to see."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((5, HT, WD * 2)).astype(np.float32)
    base *= (rng.random((5, HT, WD * 2)) < 0.2)
    for i in range(n_frames):
        sh = 2 * i
        yield base[:, :, sh:sh + WD], np.asarray([60.0, 60.0, WD / 2, HT / 2], np.float32), i / 30.0


@pytest.fixture(scope="module")
def engine_run():
    cfg = TEST_CFG
    params = make_params(cfg)
    slam = DEVO(cfg, params, ht=HT, wd=WD, seed=0)
    for vox, intr, ts in synthetic_voxels():
        slam(ts, np.transpose(vox, (1, 2, 0)), intr)
    poses, tss = slam.terminate()
    return slam, poses, tss


def test_engine_tracks_and_terminates(engine_run):
    slam, poses, tss = engine_run
    assert poses.shape[1] == 7
    assert np.isfinite(poses).all()
    # quaternions stay normalized
    qn = np.linalg.norm(poses[:, 3:], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)


def test_engine_initializes(engine_run):
    slam, poses, tss = engine_run
    assert bool(slam.state.initialized)
    assert int(slam.state.n) >= 8


def test_engine_edges_valid(engine_run):
    slam, _, _ = engine_run
    st = slam.state
    ne = int(st.n_edges)
    assert ne > 0
    mask = np.asarray(st.emask[:ne])
    ii = np.asarray(st.ii[:ne])[mask]
    jj = np.asarray(st.jj[:ne])[mask]
    kk = np.asarray(st.kk[:ne])[mask]
    n = int(st.n)
    M = slam.cfg.M
    assert (ii < n).all() and (jj < n).all()
    assert (kk // M == ii).all()
    # packed: no valid edges beyond n_edges
    assert not np.asarray(st.emask[ne:]).any()


def test_engine_poses_move(engine_run):
    """With real optical flow in the input, BA should produce a non-identity
    trajectory after init."""
    slam, poses, tss = engine_run
    t = poses[:, :3]
    assert np.abs(t).max() > 1e-4


def test_engine_frame_mode():
    """End-to-end frame-input (EVS=False, 3-channel) tracking: the engine
    must scale images per devo.py:395, skip the empty-voxel gate, and
    produce a finite trajectory (the reference's RGB/E2VID path)."""
    cfg = TEST_CFG.replace(EVS=False, BINS=3, PATCH_SELECTOR="random",
                           NORM="none", SCORER_EVAL_MODE="random",
                           SCORER_EVAL_USE_GRID=False)
    net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                 dim=cfg.DIM, patch_selector="random", bins=3)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, HT, WD, 3)),
                      jax.random.PRNGKey(1))["params"]
    slam = DEVO(cfg, params, ht=HT, wd=WD, seed=0)
    rng = np.random.default_rng(0)
    base = (rng.random((HT, WD * 2, 3)) * 255).astype(np.float32)
    intr = np.asarray([60.0, 60.0, WD / 2, HT / 2], np.float32)
    for i in range(12):
        slam(i / 30.0, base[:, 2 * i:2 * i + WD], intr)
    assert bool(slam.state.initialized)
    poses, tss = slam.terminate()
    assert np.isfinite(poses).all()
    assert len(tss) == 12    # no empty-voxel skips in frame mode


def test_rebucket_overflow_degrades_gracefully():
    """Force a too-small bucket (DEVO_FORCE_BUCKET): appends overflow and
    must drop the tail while PRESERVING the packed sorted invariant and a
    consistent n_edges — the rebucket policy's margin logic relies on this
    (engine.py:_append_edges tail-drop overflow)."""
    import os
    cfg = TEST_CFG
    params = make_params(cfg)
    cap = 64 * cfg.M + cfg.M * (2 * cfg.PATCH_LIFETIME - 1)  # engine cap0
    os.environ["DEVO_FORCE_BUCKET"] = str(cfg.M * 12)  # far below steady need
    try:
        slam = DEVO(cfg, params, ht=HT, wd=WD, seed=0)
        assert slam.state.ii.shape[0] < cap
        for vox, intr, ts in synthetic_voxels():
            slam(ts, np.transpose(vox, (1, 2, 0)), intr)
    finally:
        del os.environ["DEVO_FORCE_BUCKET"]
    st = slam.state
    E = st.ii.shape[0]
    ne = int(st.n_edges)
    assert 0 < ne <= E
    kk = np.asarray(st.kk[:ne])
    jj = np.asarray(st.jj[:ne])
    ii = np.asarray(st.ii[:ne])
    key = kk.astype(np.int64) * 100000 + jj
    assert (np.diff(key) > 0).all(), "overflow corrupted the sorted invariant"
    assert (ii == kk // cfg.M).all()
    n = int(st.n)
    assert (jj < n).all() and (ii < n).all()
    poses, _ = slam.terminate()
    assert np.isfinite(poses).all()


def test_banded_ring_shape_guard(monkeypatch):
    """The banded corr path derives row addressing from cfg.HT/WD; a state
    built at a different resolution must be rejected at trace time instead
    of silently computing garbage correlations (engine._edge_features).
    Exercised on CPU by faking the backend probe — the guard fires before
    any Mosaic call."""
    from devo_tpu.runtime import engine as eng

    cfg = TEST_CFG.replace(CORR_IMPL="banded", HT=HT, WD=WD)
    monkeypatch.setattr(eng, "_use_banded", lambda c: True)
    st = eng.init_state(cfg, HT, WD, seed=0, edge_cap=64)
    assert st.fmap1b.shape[0] == cfg.MEM  # banded rings allocated

    monkeypatch.setattr(eng.jax, "default_backend", lambda: "tpu")
    E = 8
    ii = jnp.zeros((E,), jnp.int32)
    bad = cfg.replace(HT=2 * HT, WD=2 * WD)
    with pytest.raises(ValueError, match="does not match cfg.HT/WD"):
        eng._edge_features(bad, st, ii, ii, ii)
