"""Unrolled training forward pass.

JAX counterpart of /root/reference/devo/enet.py:235-385 (`eVONet.forward`):
normalize event voxels, patchify with the training selector (3x-random +
top-score), then run STEPS unrolled iterations of
reproject -> correlate -> update -> 2x differentiable BA, growing the patch
graph by one frame per step after step 8 (enet.py:319-339) with a 10% chance
of dropping the edges of frame n-4 (enet.py:331-336).

TPU design: the edge schedule is deterministic given (n_frames, ppi, STEPS),
so each step's edge arrays are precomputed host-side with static shapes; the
random edge drop becomes a mask. Per-step detach (enet.py:315-316) maps to
stop_gradient. With remat=True (default) the heavy per-step chain
(reproject -> corr -> update -> BA) is wrapped in jax.checkpoint, so the
backward pass stores only each step's (Gs, patches, net_state) boundary
values and recomputes the step activations. Measured (XLA
memory_analysis, scripts/measure_train_memory.py, PERF_NOTES r05): at
the reference scale (480x640, 15 frames, ppi 80) remat costs ~0.21
GB/step on top of a ~15.3 GB within-step floor — ~19 GB at 18 steps, so
one 16 GB v5e needs a ~10-20% smaller crop; without remat the graph is
larger still (the remote compiler fails outright). The correlation backward drops a
random 1 - corr_dropout fraction of edges, matching the reference's
training recipe (correlation.py:18-30, enet.py:204; corr_pyramid_train).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.data.normalize import normalize
from devo_tpu.data.randaug import maybe_voxel_augment
from devo_tpu.geom import projective as pops
from devo_tpu.lie import se3
from devo_tpu.nets.evonet import EVONet
from devo_tpu.ops import ba as ba_ops
from devo_tpu.ops import corr as corr_ops
from devo_tpu.ops import graph as graph_ops


class EdgeSchedule(NamedTuple):
    """Static per-step edge table (cumulative, new edges first)."""
    ii: np.ndarray
    jj: np.ndarray
    kk: np.ndarray
    n_active_frames: int     # frames in the graph after this step's growth
    added_frame: int         # frame added at this step (-1 if none)
    new_edges: int           # count of freshly added edges (prefix)


def build_edge_schedule(n_frames: int, ppi: int, steps: int,
                        grow_after: int = 8) -> List[EdgeSchedule]:
    """Reproduce the reference's graph growth (enet.py:300, 319-339).

    grow_after: first step index that adds a frame (reference: 8). Smaller
    values let short unrolls (e.g. the driver's multichip dryrun) still
    exercise the growth + edge-drop paths without compiling an 18-step graph.
    """
    init = min(8, grow_after, n_frames)
    ix = np.repeat(np.arange(n_frames), ppi)
    kk, jj = np.meshgrid(np.where(ix < init)[0], np.arange(init), indexing="ij")
    kk, jj = kk.reshape(-1), jj.reshape(-1)
    ii = ix[kk]

    sched = []
    n = init
    for s in range(steps):
        added, new = -1, 0
        if s >= grow_after and n < n_frames:
            kk1, jj1 = np.meshgrid(np.where(ix < n)[0], [n], indexing="ij")
            kk2, jj2 = np.meshgrid(np.where(ix == n)[0], np.arange(n + 1), indexing="ij")
            kk_new = np.concatenate([kk1.reshape(-1), kk2.reshape(-1)])
            jj_new = np.concatenate([jj1.reshape(-1), jj2.reshape(-1)])
            ii_new = ix[kk_new]
            ii = np.concatenate([ii_new, ii])
            jj = np.concatenate([jj_new, jj])
            kk = np.concatenate([kk_new, kk])
            added, new = n, len(kk_new)
            n += 1
        sched.append(EdgeSchedule(ii.copy(), jj.copy(), kk.copy(), n, added, new))
    return sched


def evonet_forward(
    net: EVONet,
    params,
    voxels: jnp.ndarray,      # (n_frames, H, W, bins)
    poses_gt: jnp.ndarray,    # (n_frames, 7) w2c
    disps: jnp.ndarray,       # (n_frames, H, W) GT disparity (full res)
    intrinsics: jnp.ndarray,  # (4,) full-res
    key: jax.Array,
    steps: int = 18,
    ppi: int = 80,
    structure_only: bool = False,
    norm: str = "std2",
    randaug: bool = False,
    grow_after: int = 8,
    corr_dropout: float = 0.2,
    remat: bool = True,
) -> List[Dict[str, Any]]:
    n_frames, H, W, _ = voxels.shape
    P = net.P

    # normalization (enet.py:246-259): std2 = sequence-wise
    axes = None if norm in ("std2", "standard2") else (1, 2, 3)
    voxels = normalize(voxels, "std" if "std" in norm else norm,
                       axes=axes if "std" in norm else None)
    if randaug:
        # p=0.33 single-op image augmentation (enet.py:261-269)
        key, k_aug = jax.random.split(key)
        voxels = maybe_voxel_augment(voxels, k_aug, norm)

    intr4 = intrinsics / 4.0
    disps4 = disps[:, 1::4, 1::4]

    k_sel, k_depth, k_drop = jax.random.split(key, 3)
    out = net.apply({"params": params}, voxels, k_sel,
                    patches_per_image=ppi, disps=disps4, training=True,
                    method=EVONet.run_patchify)
    fmap, gmap, imap = out["fmap"], out["gmap"], out["imap"]
    patches_gt = out["patches"].reshape(-1, 3, P, P)      # (n*ppi, 3, P, P)
    scores = out["scores"]                                # (n, ppi)

    # random initial depths (enet.py:294-295)
    d0 = jax.random.uniform(k_depth, (patches_gt.shape[0], 1, 1))
    patches = patches_gt.at[:, 2].set(jnp.broadcast_to(d0, patches_gt.shape[0:1] + (P, P)))

    gmap_flat = gmap.reshape(-1, P, P, gmap.shape[-1])
    imap_flat = imap.reshape(-1, imap.shape[-1])

    # 2-level correlation pyramid (enet.py:203-216)
    fmap2 = fmap.reshape(fmap.shape[0], fmap.shape[1] // 4, 4,
                         fmap.shape[2] // 4, 4, -1).mean((2, 4))
    pyramid = (fmap, fmap2)

    intr_all = jnp.tile(intr4[None], (n_frames, 1))
    sched = build_edge_schedule(n_frames, ppi, steps, grow_after=grow_after)

    Gs = jnp.broadcast_to(se3.identity(), poses_gt.shape)
    if structure_only:
        Gs = poses_gt

    h4, w4 = fmap.shape[1:3]
    bounds = jnp.asarray([-64.0, -64.0, w4 + 64.0, h4 + 64.0])

    traj = []
    E0 = len(sched[0].ii)
    net_state = jnp.zeros((E0, net.dim_inet), jnp.float32)
    emask_np = np.ones((E0,), bool)

    for s, es in enumerate(sched):
        Gs = jax.lax.stop_gradient(Gs)
        patches = jax.lax.stop_gradient(patches)

        E = len(es.ii)
        ii = jnp.asarray(es.ii, jnp.int32)
        jj = jnp.asarray(es.jj, jnp.int32)
        kk = jnp.asarray(es.kk, jnp.int32)

        if es.added_frame >= 0:
            n = es.added_frame
            if not structure_only:
                Gs = Gs.at[n].set(Gs[n - 1])
            net_state = jnp.concatenate(
                [jnp.zeros((es.new_edges, net.dim_inet), jnp.float32), net_state])
            emask_np = np.concatenate([np.ones(es.new_edges, bool), emask_np])
            # 10% chance: drop edges touching frame n-4 (enet.py:331-336)
            drop_roll = jax.random.bernoulli(jax.random.fold_in(k_drop, s), 0.1)
            touches = jnp.asarray((es.ii == n - 4) | (es.jj == n - 4))
            emask = jnp.asarray(emask_np) & ~(drop_roll & touches)
            # median depth init for the new frame (enet.py:338)
            pf = jnp.arange(patches.shape[0]) // ppi
            sel = (pf == n - 1) | (pf == n - 2)
            # masked lower-median (torch.median semantics) without NaN
            # sentinels — nanmedian's intentional NaNs trip jax_debug_nans
            # and cost a full isnan pass
            vals = jnp.where(sel[:, None, None], patches[:, 2], 3.4e38)
            flat = jnp.sort(vals.reshape(-1))
            cnt = jnp.sum(sel) * patches.shape[-1] * patches.shape[-2]
            med = flat[jnp.maximum((cnt - 1) // 2, 0)]
            patches = patches.at[:, 2].set(
                jnp.where((pf == n)[:, None, None], med, patches[:, 2]))
        else:
            emask = jnp.asarray(emask_np)

        ixn, jxn = graph_ops.neighbors(kk, jj, emask)
        ij_seg_np = es.ii.astype(np.int64) * n_frames + es.jj
        _, ij_seg = np.unique(ij_seg_np, return_inverse=True)
        nseg_ij = int(ij_seg.max()) + 1
        n_act = es.n_active_frames
        k_corr = jax.random.fold_in(k_drop, 1000 + s)

        def one_step(Gs, patches, net_state, emask,
                     ii=ii, jj=jj, kk=kk, ixn=ixn, jxn=jxn,
                     ij_seg=jnp.asarray(ij_seg, jnp.int32),
                     nseg_ij=nseg_ij, n_act=n_act, k_corr=k_corr):
            coords = pops.transform(Gs, patches, intr_all, ii, jj, kk)
            corr_feat = corr_ops.corr_pyramid_train(
                gmap_flat, pyramid, coords, kk, jj, k_corr,
                dropout=corr_dropout, radius=3, levels=(1, 4))

            net_state2, delta, weight = net.apply(
                {"params": params}, net_state, imap_flat[kk], corr_feat,
                ixn, jxn, kk, patches.shape[0], ij_seg,
                nseg_ij, emask, method=EVONet.run_update)

            target = coords[:, P // 2, P // 2, :] + delta
            weight_m = jnp.where(emask[:, None], weight, 0.0)

            for _ in range(2):
                Gs, patches = ba_ops.gauss_newton_step(
                    Gs, patches, intr_all, target, weight_m,
                    jnp.float32(1e-4),
                    ii, jj, kk, emask, t0=jnp.int32(1), t1=jnp.int32(n_act),
                    kbase=jnp.int32(0), window=n_frames - 1,
                    patch_slots=patches.shape[0], bounds=bounds,
                    max_residual=250.0, ep=10.0, lm=1e-4,
                    structure_only=structure_only,
                    depth_clamp="training")[:2]
            return Gs, patches, net_state2, weight

        if remat:
            # store only the step-boundary values; recompute the step's
            # activations (corr taps, update MLP, BA factors) in backward
            one_step = jax.checkpoint(one_step)
        Gs, patches, net_state, weight = one_step(Gs, patches, net_state,
                                                  emask)

        coords_est = pops.transform(Gs, patches, intr_all, ii, jj, kk)
        coords_gt, valid_gt = pops.transform(poses_gt, patches_gt, intr_all,
                                             ii, jj, kk, valid=True)
        traj.append({
            "coords": coords_est, "coords_gt": coords_gt,
            "valid": valid_gt * emask, "ii": es.ii, "jj": es.jj, "kk": es.kk,
            "emask": emask, "weight": weight, "Gs": Gs[:n_act],
            "Ps": poses_gt[:n_act], "scores": scores,
        })
    return traj
