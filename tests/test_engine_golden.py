"""Engine-level golden test: the jitted static-shape engine vs a
reference-semantics oracle (tests/oracle_engine.py) over a synthetic
sequence.

Both run the same frames with the same params and the SAME RNG stream, so
every stochastic choice (patch selection, depth init) is identical; the
test asserts matching probe decisions, keyframe-cull decisions, edge
tables (as (kk, jj) multisets), pose trajectories, and terminate() output
— the integration parity evidence for /root/reference/devo/devo.py:382-555
that module-level tests cannot give.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.nets.evonet import EVONet
from devo_tpu.runtime.config import VOConfig
from devo_tpu.runtime.engine import DEVO

from oracle_engine import SlowDEVO

HT, WD = 64, 64
N_FRAMES = 22

CFG = VOConfig(
    BUFFER_SIZE=32, HT=HT, WD=WD, PATCHES_PER_FRAME=4, PATCH_LIFETIME=5,
    REMOVAL_WINDOW=9, OPTIMIZATION_WINDOW=4, KEYFRAME_INDEX=4,
    KEYFRAME_THRESH=15.0, MOTION_PROBE_THRESH=-1.0, MEM=16,
    DIM_INET=32, DIM_FNET=16, DIM=8, MIXED_PRECISION=False,
    VOXEL_WIRE="f32", CORR_IMPL="gather",
)


def make_frames(n, ht=HT, wd=WD, bins=5, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((ht, wd * 2, bins)).astype(np.float32)
    base *= rng.random((ht, wd * 2, bins)) < 0.15
    return [base[:, (3 * i) % wd:(3 * i) % wd + wd] for i in range(n)]


def make_params(cfg):
    net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                 dim=cfg.DIM, patch_selector=cfg.PATCH_SELECTOR,
                 dtype=jnp.float32, bins=cfg.BINS)
    return net.init(jax.random.PRNGKey(7), jnp.zeros((1, HT, WD, cfg.BINS)),
                    jax.random.PRNGKey(8))["params"]


def run_both(cfg, n_frames=N_FRAMES):
    params = make_params(cfg)
    frames = make_frames(n_frames, bins=cfg.BINS)
    intr = np.asarray([80.0, 80.0, WD / 2, HT / 2], np.float32)

    fast = DEVO(cfg, params, ht=HT, wd=WD, seed=0)
    slow = SlowDEVO(cfg, params, ht=HT, wd=WD, seed=0)

    records = []
    for i, v in enumerate(frames):
        fast(i / 30.0, v, intr)
        slow(i / 30.0, v, intr)
        st = fast.state
        ne = int(st.n_edges)
        # keyframe culls are deferred (engine.VOState.pending_drop): the
        # logical live table at end-of-step is the non-pending rows, whose
        # indices the cull already decremented to match the oracle's
        live = ~np.asarray(st.pending_drop[:ne])
        records.append(dict(
            frame=i,
            fast_n=int(st.n), slow_n=slow.n,
            fast_status=int(fast.aux_log[-1][1].status),
            fast_kf=bool(fast.aux_log[-1][1].kf_removed),
            fast_edges=set(zip(np.asarray(st.kk[:ne])[live].tolist(),
                               np.asarray(st.jj[:ne])[live].tolist())),
            slow_edges=set(zip(slow.kk.tolist(), slow.jj.tolist())),
            fast_poses=np.asarray(st.poses[:max(int(st.n), 1)]).copy(),
            slow_poses=slow.poses_[:max(slow.n, 1)].copy(),
        ))
    return fast, slow, records


@pytest.mark.slow
def test_engine_matches_reference_oracle():
    fast, slow, records = run_both(CFG)

    for r in records:
        f = r["frame"]
        # frame counts (probe/skip decisions fold into n)
        assert r["fast_n"] == r["slow_n"], \
            f"frame {f}: n {r['fast_n']} vs {r['slow_n']}"
        # edge tables as (kk, jj) sets
        assert r["fast_edges"] == r["slow_edges"], (
            f"frame {f}: edge tables differ "
            f"(fast-only: {sorted(r['fast_edges'] - r['slow_edges'])[:5]}, "
            f"slow-only: {sorted(r['slow_edges'] - r['fast_edges'])[:5]})")
        # pose trajectory parity (same primitives modulo layout; fp noise
        # compounds over 12-update init + per-frame BA, so tolerance is
        # loose but catches any control-flow divergence immediately)
        np.testing.assert_allclose(
            r["fast_poses"], r["slow_poses"], atol=5e-2,
            err_msg=f"frame {f}: pose buffers diverged")

    # keyframe-cull decisions: after init every frame is steady, so the
    # oracle's kf_log lines up with the trailing engine frames one-to-one
    assert [bool(k) for k in slow.kf_log] == \
        [x["fast_kf"] for x in records[-len(slow.kf_log):]], \
        f"keyframe decisions differ: {slow.kf_log} vs engine"

    # terminate parity
    poses_f, tss_f = fast.terminate()
    poses_s, tss_s = slow.terminate()
    np.testing.assert_array_equal(tss_f, tss_s)
    np.testing.assert_allclose(poses_f, poses_s, atol=5e-2)


@pytest.mark.slow
def test_engine_probe_rejection_matches_oracle():
    """With an impossible probe threshold every frame after the first is
    rejected; both engines must agree (status, delta chain, terminate)."""
    cfg = CFG.replace(MOTION_PROBE_THRESH=1e9)
    fast, slow, records = run_both(cfg, n_frames=6)
    for r in records:
        assert r["fast_n"] == r["slow_n"] == 1
        if r["frame"] > 0:
            assert r["fast_status"] == 1   # probe-rejected
    assert slow.probe_log == [False] * 5
    poses_f, tss_f = fast.terminate()
    poses_s, tss_s = slow.terminate()
    assert poses_f.shape == poses_s.shape
    np.testing.assert_array_equal(tss_f, tss_s)
