"""The DEVO inference engine as a jit-compiled state machine.

TPU-native redesign of /root/reference/devo/devo.py (`class DEVO`). The
reference is an object-oriented mutable engine with dynamically growing edge
lists and per-iteration CPU round-trips (fastba.neighbors). Here the entire
per-frame tracking step — normalization, patchify CNNs, patch selection,
motion model, edge appends, the recurrent update + bundle adjustment, and
keyframing — is one pure function over a fixed-shape `VOState` pytree,
compiled once by XLA:

  * dynamic edge lists      -> fixed-capacity arrays + validity mask,
                               compacted on device by a stable argsort;
  * fastba.neighbors on CPU -> on-device sort (ops/graph.neighbors);
  * keyframe buffer shifts  -> whole-buffer gathers (devo.py:285-303);
  * feature ring buffers    -> identical mem=32 modular indexing
                               (devo.py:69-86, 523-527);
  * control flow            -> lax.cond / fori_loop on device.

The host only feeds voxels and drains a small per-frame aux record (frame
status + keyframe-removal relative pose) used to reconstruct the full-rate
trajectory at terminate() (devo.py:186-208).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.data.normalize import normalize
from devo_tpu.geom import projective as pops
from devo_tpu.lie import se3
from devo_tpu.nets.evonet import EVONet
from devo_tpu.ops import ba as ba_ops
from devo_tpu.ops import corr as corr_ops
from devo_tpu.ops import graph as graph_ops

from .config import VOConfig


class VOState(NamedTuple):
    # frame buffers (N = BUFFER_SIZE)
    tstamps: jnp.ndarray      # (N,) i32 frame-counter values
    poses: jnp.ndarray        # (N, 7) f32 world-to-camera
    patches: jnp.ndarray      # (N*M, 3, P, P) f32
    intrinsics: jnp.ndarray   # (N, 4) f32 (feature-resolution)
    colors: jnp.ndarray       # (N, M) f32 event magnitude for viz

    # feature ring buffers (mem = 32)
    imap: jnp.ndarray         # (mem*M, Di)
    gmap: jnp.ndarray         # (mem*M, P, P, Df)
    fmap1: jnp.ndarray        # (mem, h1, w1, Df)
    fmap2: jnp.ndarray        # (mem, h1//4, w1//4, Df)

    # fixed-capacity edge table
    ii: jnp.ndarray           # (E,) i32 source frame
    jj: jnp.ndarray           # (E,) i32 target frame
    kk: jnp.ndarray           # (E,) i32 global patch index (frame*M + slot)
    emask: jnp.ndarray        # (E,) bool
    enet: jnp.ndarray         # (E, Di) hidden state
    n_edges: jnp.ndarray      # () i32 packed slot count

    # scalars
    n: jnp.ndarray            # () i32 keyframe count
    counter: jnp.ndarray      # () i32 frames tracked
    initialized: jnp.ndarray  # () bool
    rng: jax.Array


class StepAux(NamedTuple):
    status: jnp.ndarray     # 0 = skipped, 1 = probe-rejected, 2 = keyframe
    kf_removed: jnp.ndarray  # bool: a keyframe was culled this step
    kf_t0: jnp.ndarray       # () i32 counter stamp of predecessor
    kf_t1: jnp.ndarray       # () i32 counter stamp of removed frame
    kf_dP: jnp.ndarray       # (7,) relative pose P_k * P_{k-1}^-1


def init_state(cfg: VOConfig, ht: int, wd: int, seed: int = 0) -> VOState:
    N, M, P = cfg.BUFFER_SIZE, cfg.M, cfg.P
    mem, E = cfg.MEM, cfg.EDGE_CAP
    h1, w1 = ht // 4, wd // 4
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    poses = jnp.zeros((N, 7), jnp.float32).at[:, 6].set(1.0)
    return VOState(
        tstamps=jnp.zeros((N,), jnp.int32),
        poses=poses,
        patches=jnp.zeros((N * M, 3, P, P), jnp.float32),
        intrinsics=jnp.zeros((N, 4), jnp.float32),
        colors=jnp.zeros((N, M), jnp.float32),
        imap=jnp.zeros((mem * M, cfg.DIM_INET), fdt),
        gmap=jnp.zeros((mem * M, P, P, cfg.DIM_FNET), fdt),
        fmap1=jnp.zeros((mem, h1, w1, cfg.DIM_FNET), fdt),
        fmap2=jnp.zeros((mem, h1 // 4, w1 // 4, cfg.DIM_FNET), fdt),
        ii=jnp.zeros((E,), jnp.int32),
        jj=jnp.zeros((E,), jnp.int32),
        kk=jnp.zeros((E,), jnp.int32),
        emask=jnp.zeros((E,), bool),
        enet=jnp.zeros((E, cfg.DIM_INET), jnp.float32),
        n_edges=jnp.int32(0),
        n=jnp.int32(0),
        counter=jnp.int32(0),
        initialized=jnp.asarray(False),
        rng=jax.random.PRNGKey(seed),
    )


# ---------------------------------------------------------------- edge utils

def _segment_ids(cfg: VOConfig, st: VOState):
    """Dense group ids for SoftAgg over live edges (update operator)."""
    span = cfg.frame_span
    tmin = jnp.maximum(st.n - span, 0)
    kbase = tmin * cfg.M
    kk_seg = jnp.clip(st.kk - kbase, 0, cfg.patch_slots - 1)
    ij_seg = jnp.clip(st.ii - tmin, 0, span - 1) * span + jnp.clip(st.jj - tmin, 0, span - 1)
    return kk_seg, cfg.patch_slots, ij_seg, span * span, tmin, kbase


def _compact_edges(st: VOState) -> VOState:
    """Stable-partition live edges to the front of the table."""
    order = jnp.argsort(~st.emask, stable=True)
    return st._replace(
        ii=st.ii[order], jj=st.jj[order], kk=st.kk[order],
        emask=st.emask[order], enet=st.enet[order],
        n_edges=jnp.sum(st.emask).astype(jnp.int32),
    )


def _append_edges(cfg: VOConfig, st: VOState) -> VOState:
    """Append forward+backward factor blocks for the newly accepted frame
    (devo.py:361-380, 541-542). Called after n has been incremented; the new
    frame is n-1."""
    M, r = cfg.M, cfg.PATCH_LIFETIME
    n = st.n

    # forward: patches of frames [n-r, n-1) -> new frame n-1
    kk_start = M * jnp.maximum(n - r, 0)
    kf = kk_start + jnp.arange(M * (r - 1), dtype=jnp.int32)
    vf = kf < M * (n - 1)
    jf = jnp.full_like(kf, n - 1)

    # backward: patches of frame n-1 -> frames [max(n-r,0), n)
    fstart = jnp.maximum(n - r, 0)
    row = jnp.arange(M * r, dtype=jnp.int32) // r
    col = jnp.arange(M * r, dtype=jnp.int32) % r
    kb = M * (n - 1) + row
    jb = fstart + col
    vb = jb < n

    kk_new = jnp.concatenate([kf, kb])
    jj_new = jnp.concatenate([jf, jb])
    vv_new = jnp.concatenate([vf, vb])
    ii_new = kk_new // M
    B = kk_new.shape[0]

    e0 = st.n_edges
    upd = lambda buf, val: jax.lax.dynamic_update_slice(buf, val, (e0,))
    return st._replace(
        ii=upd(st.ii, ii_new), jj=upd(st.jj, jj_new), kk=upd(st.kk, kk_new),
        emask=upd(st.emask, vv_new),
        enet=jax.lax.dynamic_update_slice(
            st.enet, jnp.zeros((B, st.enet.shape[1]), st.enet.dtype), (e0, 0)),
        n_edges=e0 + B,
    )


# ------------------------------------------------------------------- update

def _edge_features(cfg: VOConfig, st: VOState, ii, jj, kk):
    """Reproject + 2-level correlation + context for a set of edges
    (devo.py:210-223, 308-314)."""
    M, mem = cfg.M, cfg.MEM
    coords = pops.transform(st.poses, st.patches, st.intrinsics, ii, jj, kk)
    kk_ring = (kk % (M * mem)).astype(jnp.int32)
    jj_ring = (jj % mem).astype(jnp.int32)
    cdtype = st.gmap.dtype
    corr_feat = corr_ops.corr_pyramid(
        st.gmap, (st.fmap1, st.fmap2), coords.astype(cdtype), kk_ring, jj_ring,
        radius=cfg.CORR_RADIUS, levels=cfg.CORR_LEVELS)
    ctx = st.imap[kk_ring]
    return coords, corr_feat.astype(jnp.float32), ctx.astype(jnp.float32)


def _update_once(net: EVONet, params, cfg: VOConfig, st: VOState) -> VOState:
    """One tracking update: reproject -> corr -> recurrent update -> 2 GN
    iterations of BA (devo.py:308-344)."""
    coords, corr_feat, ctx = _edge_features(cfg, st, st.ii, st.jj, st.kk)

    ixn, jxn = graph_ops.neighbors(st.kk, st.jj, st.emask)
    kk_seg, nseg_kk, ij_seg, nseg_ij, tmin, kbase = _segment_ids(cfg, st)

    enet, delta, weight = net.apply(
        {"params": params}, st.enet, ctx, corr_feat, ixn, jxn,
        kk_seg, nseg_kk, ij_seg, nseg_ij, st.emask,
        method=EVONet.run_update)

    P = cfg.P
    target = coords[:, P // 2, P // 2, :] + delta
    weight = jnp.where(st.emask[:, None], weight, 0.0)

    t0 = jnp.where(st.initialized,
                   jnp.maximum(st.n - cfg.OPTIMIZATION_WINDOW, 1), 1)
    t0 = jnp.maximum(t0, 1).astype(jnp.int32)

    fx_cx = st.intrinsics[jnp.maximum(st.n - 1, 0)]
    bounds = jnp.asarray([-64.0, -64.0, 0.0, 0.0]).at[2].set(
        2 * fx_cx[2] + 64).at[3].set(2 * fx_cx[3] + 64)

    poses, patches = ba_ops.run_ba(
        st.poses, st.patches, st.intrinsics, target, weight,
        jnp.float32(1e-4), st.ii, st.jj, st.kk, st.emask,
        t0=t0, t1=st.n, kbase=kbase, window=cfg.ba_window,
        patch_slots=cfg.patch_slots, bounds=bounds, iterations=2,
        structure_only=jnp.asarray(False), max_residual=128.0,
        ep=1.0, lm=1e-4, depth_clamp="inference")

    return st._replace(poses=poses, patches=patches, enet=enet)


def _motion_probe(net: EVONet, params, cfg: VOConfig, st: VOState):
    """Throwaway update on last-frame patches vs the candidate frame
    (devo.py:241-256); returns the median predicted flow norm."""
    M = cfg.M
    kk = (st.n - 1) * M + jnp.arange(M, dtype=jnp.int32)
    jj = jnp.full((M,), st.n, jnp.int32)
    ii = jnp.full((M,), st.n - 1, jnp.int32)
    coords, corr_feat, ctx = _edge_features(cfg, st, ii, jj, kk)

    enet0 = jnp.zeros((M, cfg.DIM_INET), jnp.float32)
    mask = jnp.ones((M,), bool)
    ixn = jnp.full((M,), -1, jnp.int32)
    kk_seg = jnp.arange(M, dtype=jnp.int32)
    ij_seg = jnp.zeros((M,), jnp.int32)
    _, delta, _ = net.apply(
        {"params": params}, enet0, ctx, corr_feat, ixn, ixn,
        kk_seg, M, ij_seg, 1, mask, method=EVONet.run_update)
    return jnp.quantile(jnp.linalg.norm(delta, axis=-1), 0.5)


# ----------------------------------------------------------------- keyframe

def _motionmag(cfg: VOConfig, st: VOState, i, j):
    """Mean flow magnitude over edges (i -> j) (devo.py:258-265)."""
    k = (st.ii == i) & (st.jj == j) & st.emask
    fm = pops.flow_mag(st.poses, st.patches, st.intrinsics,
                       st.ii, st.jj, st.kk, beta=0.5)  # (E, P, P)
    fm_edge = fm.mean(axis=(1, 2))
    cnt = jnp.sum(k)
    return jnp.where(cnt > 0, jnp.sum(fm_edge * k) / jnp.maximum(cnt, 1), 0.0)


def _shift_ring(buf: jnp.ndarray, n, k, mem: int):
    """Ring-buffer shift for keyframe removal (devo.py:297-300): slot s takes
    the content of frame i_s+1 for the unique i_s in [k, n-1) mapping to s."""
    s = jnp.arange(mem)
    i_s = (n - 2) - ((n - 2 - s) % mem)
    valid = (i_s >= k) & (i_s >= 0)
    src = jnp.where(valid, (i_s + 1) % mem, s)
    return buf[src]


def _remove_keyframe(cfg: VOConfig, st: VOState, k) -> VOState:
    """Cull keyframe k: drop its edges, shift indices and buffers down
    (devo.py:279-303)."""
    M, mem = cfg.M, cfg.MEM
    N = cfg.BUFFER_SIZE

    drop = (st.ii == k) | (st.jj == k)
    emask = st.emask & ~drop
    ii = jnp.where(st.ii > k, st.ii - 1, st.ii)
    jj = jnp.where(st.jj > k, st.jj - 1, st.jj)
    kk = jnp.where(st.kk // M > k, st.kk - M, st.kk)

    fidx = jnp.arange(N)
    fsrc = jnp.where(fidx >= k, jnp.minimum(fidx + 1, N - 1), fidx)
    pidx = jnp.arange(N * M)
    psrc = jnp.where(pidx >= k * M, jnp.minimum(pidx + M, N * M - 1), pidx)

    return st._replace(
        ii=ii, jj=jj, kk=kk, emask=emask,
        tstamps=st.tstamps[fsrc], poses=st.poses[fsrc],
        intrinsics=st.intrinsics[fsrc], colors=st.colors[fsrc],
        patches=st.patches[psrc],
        imap=_shift_ring(st.imap.reshape(mem, M, -1), st.n, k, mem).reshape(st.imap.shape),
        gmap=_shift_ring(st.gmap.reshape(mem, M, *st.gmap.shape[1:]), st.n, k, mem).reshape(st.gmap.shape),
        fmap1=_shift_ring(st.fmap1, st.n, k, mem),
        fmap2=_shift_ring(st.fmap2, st.n, k, mem),
        n=st.n - 1,
    )


def _keyframe(cfg: VOConfig, st: VOState) -> Tuple[VOState, Dict[str, jnp.ndarray]]:
    """Keyframing (devo.py:267-306): measure flow between frames t-5 and t-3;
    if small, remove frame t-4 and record its relative pose delta."""
    i = st.n - cfg.KEYFRAME_INDEX - 1
    j = st.n - cfg.KEYFRAME_INDEX + 1
    m = _motionmag(cfg, st, i, j) + _motionmag(cfg, st, j, i)
    remove = (m / 2.0 < cfg.KEYFRAME_THRESH) & (i >= 0)

    k = st.n - cfg.KEYFRAME_INDEX
    t0 = st.tstamps[jnp.maximum(k - 1, 0)]
    t1 = st.tstamps[jnp.maximum(k, 0)]
    dP = se3.mul(st.poses[k], se3.inv(st.poses[jnp.maximum(k - 1, 0)]))

    st = jax.lax.cond(remove, lambda s: _remove_keyframe(cfg, s, k), lambda s: s, st)

    # purge edges beyond the removal window (devo.py:305-306)
    purge = (st.kk // cfg.M) < (st.n - cfg.REMOVAL_WINDOW)
    st = st._replace(emask=st.emask & ~purge)
    st = _compact_edges(st)

    aux = dict(kf_removed=remove, kf_t0=t0, kf_t1=t1, kf_dP=dP)
    return st, aux


# --------------------------------------------------------------------- step

def _write_frame(net: EVONet, params, cfg: VOConfig, st: VOState,
                 voxel, intrinsics, key) -> VOState:
    """Patchify the new frame and fill buffers at slot n (devo.py:475-527)."""
    M, P, mem = cfg.M, cfg.P, cfg.MEM
    n = st.n

    out = net.apply(
        {"params": params}, voxel[None], key,
        patches_per_image=M,
        training=False,
        scorer_eval_mode=cfg.SCORER_EVAL_MODE,
        scorer_eval_use_grid=cfg.SCORER_EVAL_USE_GRID,
        method=EVONet.run_patchify)

    patches = out["patches"][0]        # (M, 3, P, P)
    imap_p = out["imap"][0]            # (M, Di)
    gmap_p = out["gmap"][0]            # (M, P, P, Df)
    fmap = out["fmap"][0]              # (h1, w1, Df)

    # motion model (devo.py:502-512)
    def damped_linear(poses):
        P1 = poses[n - 1]
        P2 = poses[n - 2]
        xi = cfg.MOTION_DAMPING * se3.log(se3.mul(P1, se3.inv(P2)))
        return se3.mul(se3.exp(xi), P1)

    new_pose = jax.lax.cond(
        n > 1, lambda p: damped_linear(p),
        lambda p: p[jnp.maximum(n - 1, 0)], st.poses)

    # depth init (devo.py:514-520)
    key_d = jax.random.fold_in(key, 1)
    rand_d = jax.random.uniform(key_d, (M, 1, 1))
    med_src = jax.lax.dynamic_slice(
        st.patches, (jnp.maximum(n - 3, 0) * M, 2, 0, 0), (3 * M, 1, P, P))
    med = jnp.median(med_src)
    depth = jnp.where(st.initialized, med, 0.0) + jnp.where(st.initialized, 0.0, 1.0) * rand_d
    patches = patches.at[:, 2].set(jnp.broadcast_to(depth, (M, P, P)))

    fdt = st.fmap1.dtype
    fmap2 = fmap.reshape(fmap.shape[0] // 4, 4, fmap.shape[1] // 4, 4, -1).mean((1, 3))

    return st._replace(
        tstamps=st.tstamps.at[n].set(st.counter),
        poses=st.poses.at[n].set(new_pose),
        patches=jax.lax.dynamic_update_slice(st.patches, patches, (n * M, 0, 0, 0)),
        intrinsics=st.intrinsics.at[n].set(intrinsics / 4.0),
        colors=st.colors.at[n].set(out["clr"][0]),
        imap=jax.lax.dynamic_update_slice(st.imap, imap_p.astype(fdt), ((n % mem) * M, 0)),
        gmap=jax.lax.dynamic_update_slice(st.gmap, gmap_p.astype(fdt), ((n % mem) * M, 0, 0, 0)),
        fmap1=st.fmap1.at[n % mem].set(fmap.astype(fdt)),
        fmap2=st.fmap2.at[n % mem].set(fmap2.astype(fdt)),
        counter=st.counter + 1,
    )


def make_step(net: EVONet, cfg: VOConfig):
    """Build the jitted per-frame tracking step."""

    def step(params, st: VOState, voxel, intrinsics) -> Tuple[VOState, StepAux]:
        # voxel: (H, W, bins) f32; intrinsics: (4,)
        key, key_sel = jax.random.split(st.rng)
        st = st._replace(rng=key)

        # normalization + empty-voxel gate (devo.py:406-457)
        nonzero_frac = jnp.mean((voxel != 0.0).astype(jnp.float32))
        skip = (st.n == 0) & (nonzero_frac < 2e-2)
        voxel = normalize(voxel, cfg.NORM)

        def do_skip(st):
            aux = StepAux(jnp.int32(0), jnp.asarray(False), jnp.int32(0),
                          jnp.int32(0), se3.identity())
            return st, aux

        def do_track(st):
            st = _write_frame(net, params, cfg, st, voxel, intrinsics, key_sel)

            probe_ok = jax.lax.cond(
                (st.n > 0) & ~st.initialized,
                lambda s: _motion_probe(net, params, cfg, s) >= cfg.MOTION_PROBE_THRESH,
                lambda s: jnp.asarray(True), st)

            def rejected(st):
                aux = StepAux(jnp.int32(1), jnp.asarray(False), jnp.int32(0),
                              jnp.int32(0), se3.identity())
                return st, aux

            def accepted(st):
                st = st._replace(n=st.n + 1)
                st = _append_edges(cfg, st)

                def do_init(st):
                    st = st._replace(initialized=jnp.asarray(True))
                    st = jax.lax.fori_loop(
                        0, 12, lambda _, s: _update_once(net, params, cfg, s), st)
                    return st, dict(kf_removed=jnp.asarray(False),
                                    kf_t0=jnp.int32(0), kf_t1=jnp.int32(0),
                                    kf_dP=se3.identity())

                def do_steady(st):
                    st = _update_once(net, params, cfg, st)
                    return _keyframe(cfg, st)

                def do_nothing(st):
                    return st, dict(kf_removed=jnp.asarray(False),
                                    kf_t0=jnp.int32(0), kf_t1=jnp.int32(0),
                                    kf_dP=se3.identity())

                st, kf_aux = jax.lax.cond(
                    (st.n == 8) & ~st.initialized, do_init,
                    lambda s: jax.lax.cond(s.initialized, do_steady, do_nothing, s),
                    st)
                aux = StepAux(jnp.int32(2), kf_aux["kf_removed"],
                              kf_aux["kf_t0"], kf_aux["kf_t1"], kf_aux["kf_dP"])
                return st, aux

            return jax.lax.cond(probe_ok, accepted, rejected, st)

        return jax.lax.cond(skip, do_skip, do_track, st)

    return jax.jit(step, donate_argnums=(1,))


# ----------------------------------------------------------------- host API

class DEVO:
    """Host-side orchestrator mirroring the reference engine's interface
    (devo.py:21-555): call per frame, then terminate() for the trajectory."""

    def __init__(self, cfg: VOConfig, params, ht=480, wd=640, seed=0):
        self.cfg = cfg
        self.net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                          dim=cfg.DIM, patch_selector=cfg.PATCH_SELECTOR)
        self.params = params
        self.state = init_state(cfg, ht, wd, seed)
        self.step_fn = make_step(self.net, cfg)
        self._update_fn = jax.jit(
            lambda p, s: _update_once(self.net, p, self.cfg, s),
            donate_argnums=(1,))
        self.tlist = []            # real timestamps of counted frames
        self.aux_log = []          # device aux records (lazy)

    def __call__(self, tstamp, voxel, intrinsics):
        """voxel: (H, W, bins) numpy/jax array; intrinsics: (4,)."""
        if voxel.shape[-2] == 346:  # MVSEC/FPV width hack (devo.py:466-467)
            voxel = voxel[..., :, 1:-1, :] if voxel.ndim == 3 else voxel
        st, aux = self.step_fn(self.params, self.state,
                               jnp.asarray(voxel, jnp.float32),
                               jnp.asarray(intrinsics, jnp.float32))
        self.state = st
        self.aux_log.append((tstamp, aux))

    def update(self):
        """Extra refinement update (used by the eval harness's 12 final
        iterations, eval_utils.py:127-130)."""
        self.state = self._update_fn(self.params, self.state)

    def terminate(self):
        """Reconstruct the full-rate trajectory (devo.py:186-208): chain the
        stored relative deltas onto the keyframe poses, invert to c2w."""
        st = self.state
        n = int(st.n)
        counter = int(st.counter)
        poses_kf = np.asarray(st.poses[:max(n, 1)])
        tstamps_kf = np.asarray(st.tstamps[:max(n, 1)])

        traj = {int(t): poses_kf[i] for i, t in enumerate(tstamps_kf[:n])}
        delta = {}
        tlist = []
        cnt = 0
        for tstamp, aux in self.aux_log:
            status = int(aux.status)
            if status == 0:
                continue
            tlist.append(tstamp)
            cnt += 1
            if status == 1:  # probe-rejected: identity to previous
                delta[cnt - 1] = (cnt - 2, np.asarray(se3.identity()))
            if bool(aux.kf_removed):
                delta[int(aux.kf_t1)] = (int(aux.kf_t0), np.asarray(aux.kf_dP))

        if not bool(st.initialized):
            poses = np.tile(np.asarray([0, 0, 0, 0, 0, 0, 1.0]), (counter, 1))
            poses[:, :3] += np.random.randn(counter, 3) * 0.01
            return poses, np.asarray(tlist, np.float64)

        def get_pose(t):
            # iterative delta-chain walk (deep chains would overflow python
            # recursion; devo.py:179-184 recurses)
            chain = []
            while t not in traj:
                chain.append(t)
                t = delta[t][0]
            base = traj[t]
            for tt in reversed(chain):
                dP = delta[tt][1]
                base = np.asarray(se3.mul(jnp.asarray(dP), jnp.asarray(base)))
                traj[tt] = base
            return base

        poses = np.stack([get_pose(t) for t in range(counter)])
        poses = np.asarray(se3.inv(jnp.asarray(poses)))  # w2c -> c2w
        return poses, np.asarray(tlist, np.float64)

    def point_cloud(self):
        """World-frame patch centers for visualization (devo.py:342-344)."""
        st = self.state
        n = int(st.n)
        M = self.cfg.M
        pts = pops.point_cloud(st.poses, st.patches[: n * M], st.intrinsics,
                               jnp.arange(n * M) // M)
        c = self.cfg.P // 2
        pts = pts[:, c, c, :]
        return np.asarray(pts[..., :3] / np.maximum(np.asarray(pts[..., 3:]), 1e-8))
