"""Differentiable bundle adjustment (DBA) for patch-based VO, in pure JAX.

Unifies the reference's two BA implementations into one math core:
  * training DBA  — /root/reference/devo/ba.py (torch_scatter + autograd
    Cholesky), used inside the unrolled eVONet forward;
  * inference DBA — /root/reference/devo/fastba/ba_cuda.cu (fused CUDA
    Gauss-Newton with atomicAdd Hessian assembly, Schur complement, Cholesky,
    SE3/depth retraction kernels).

TPU-native design:
  * geometry + Jacobians come from geom/edgewise.py — structure-of-arrays
    (E,)-shaped intermediates that map onto vector lanes instead of
    (E, 3, 3, 4) tensors whose tiny trailing dims pad 30x on TPU;
  * atomicAdd scatters -> one-hot matmuls on the MXU for the pose blocks
    (<=144 segments) and cumsum-boundary sums for the patch diagonal when
    the edge table is sorted by patch id (XLA scatter serializes on TPU;
    both replacements are deterministic, unlike the reference's atomics);
  * fixed poses (index < t0) and padded slots drop out automatically: their
    rows accumulate zero and the ep damping (S_diag += ep + lm * S_diag,
    ba_cuda.cu:517-518) keeps S invertible;
  * the Schur system is dense (6N, 6N), N <= optimization window (<= 12),
    solved by f32 Cholesky.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.geom import edgewise
from devo_tpu.lie import se3
from devo_tpu.ops.graph import onehot_segment_sum


class BASystem(NamedTuple):
    B: jnp.ndarray  # (6N, 6N)
    E: jnp.ndarray  # (6N, M)
    C: jnp.ndarray  # (M,)
    v: jnp.ndarray  # (6N,)
    u: jnp.ndarray  # (M,)


# static lane-index tables for outer products on (E, 36)/(E, 72) arrays
_I36 = np.repeat(np.arange(6), 6)
_J36 = np.tile(np.arange(6), 6)


def assemble(
    Ji: jnp.ndarray,      # (E, 12) = [x-row(6), y-row(6)]
    Jj: jnp.ndarray,      # (E, 12)
    Jz: jnp.ndarray,      # (E, 2)
    r: jnp.ndarray,       # (E, 2) residual target - proj
    w: jnp.ndarray,       # (E, 2) confidence weights (already gated)
    li: jnp.ndarray,      # (E,) local pose index of frame ii, -1 if fixed
    lj: jnp.ndarray,      # (E,) local pose index of frame jj, -1 if fixed
    pk: jnp.ndarray,      # (E,) local patch slot in [0, M)
    n_poses: int,
    n_patches: int,
) -> BASystem:
    """Accumulate the block Hessian without scatters (ba_cuda.cu:242-363)."""
    mi = li >= 0
    mj = lj >= 0
    w0i = jnp.where(mi, w[:, 0], 0.0)
    w1i = jnp.where(mi, w[:, 1], 0.0)
    w0j = jnp.where(mj, w[:, 0], 0.0)
    w1j = jnp.where(mj, w[:, 1], 0.0)
    w0ij = jnp.where(mi & mj, w[:, 0], 0.0)
    w1ij = jnp.where(mi & mj, w[:, 1], 0.0)

    Jix, Jiy = Ji[:, :6], Ji[:, 6:]
    Jjx, Jjy = Jj[:, :6], Jj[:, 6:]

    def outer36(wa0, wa1, A, B):
        # (E, 36) = sum_rows w_r A_r[i] B_r[j]
        Ax, Ay = A
        Bx, By = B
        return (wa0[:, None] * Ax[:, _I36] * Bx[:, _J36]
                + wa1[:, None] * Ay[:, _I36] * By[:, _J36])

    li_c = jnp.clip(li, 0, n_poses - 1)
    lj_c = jnp.clip(lj, 0, n_poses - 1)
    nn = n_poses * n_poses

    pairs = jnp.stack([li_c * n_poses + li_c, li_c * n_poses + lj_c,
                       lj_c * n_poses + li_c, lj_c * n_poses + lj_c])
    vals = jnp.stack([
        outer36(w0i, w1i, (Jix, Jiy), (Jix, Jiy)),
        outer36(w0ij, w1ij, (Jix, Jiy), (Jjx, Jjy)),
        outer36(w0ij, w1ij, (Jjx, Jjy), (Jix, Jiy)),
        outer36(w0j, w1j, (Jjx, Jjy), (Jjx, Jjy)),
    ])
    flat = onehot_segment_sum(vals.reshape(-1, 36), pairs.reshape(-1), nn)
    N6 = 6 * n_poses
    B = flat.reshape(n_poses, n_poses, 6, 6).transpose(0, 2, 1, 3).reshape(N6, N6)

    # rhs v (6N,)
    vi = (w0i * r[:, 0])[:, None] * Jix + (w1i * r[:, 1])[:, None] * Jiy
    vj = (w0j * r[:, 0])[:, None] * Jjx + (w1j * r[:, 1])[:, None] * Jjy
    vflat = onehot_segment_sum(jnp.concatenate([vi, vj]),
                               jnp.concatenate([li_c, lj_c]), n_poses)
    v = vflat.reshape(N6)

    # pose-patch coupling: per-edge 6-vectors expanded by li one-hot into
    # (E, 6*n_poses) lanes, then patch-segment summed
    eik = (w0i * Jz[:, 0])[:, None] * Jix + (w1i * Jz[:, 1])[:, None] * Jiy
    ejk = (w0j * Jz[:, 0])[:, None] * Jjx + (w1j * Jz[:, 1])[:, None] * Jjy
    oh_i = (li_c[:, None] == jnp.arange(n_poses)[None, :]) & mi[:, None]
    oh_j = (lj_c[:, None] == jnp.arange(n_poses)[None, :]) & mj[:, None]
    idx_p = np.repeat(np.arange(n_poses), 6)
    idx_c = np.tile(np.arange(6), n_poses)
    Erow = (oh_i.astype(eik.dtype)[:, idx_p] * eik[:, idx_c]
            + oh_j.astype(ejk.dtype)[:, idx_p] * ejk[:, idx_c])  # (E, 6N)

    # patch diagonal + rhs, fused into one segment reduction
    Cu = jnp.stack([
        w[:, 0] * Jz[:, 0] ** 2 + w[:, 1] * Jz[:, 1] ** 2,
        w[:, 0] * Jz[:, 0] * r[:, 0] + w[:, 1] * Jz[:, 1] * r[:, 1],
    ], axis=-1)  # (E, 2)

    # one-hot matmul in both cases: out-of-range ids (== n_patches, from
    # masked rows) produce all-zero one-hot rows and contribute nothing.
    # (The former cumsum-boundary path's c[bounds] gather is a serial
    # 2.5k-iteration loop on TPU; the matmul is faster and deterministic.)
    ECu = onehot_segment_sum(jnp.concatenate([Erow, Cu], axis=-1), pk,
                             n_patches)
    E = ECu[:, :N6].T          # (6N, M)
    C = ECu[:, N6]
    u = ECu[:, N6 + 1]
    return BASystem(B, E, C, v, u)


def schur_solve(
    sys: BASystem,
    lmbda: jnp.ndarray,
    ep: float,
    lm: float,
    structure_only: bool = False,
):
    """Schur-complement solve (ba_cuda.cu:492-527 / devo/ba.py:155-173).

    Returns (dX (N, 6), dZ (M,), ok scalar bool). On Cholesky failure dX
    is zeroed but dZ is still applied as Q*u — the reference's
    CholeskySolver returns zeros for dX and the caller then computes
    dZ = Q*(w - E^T*0) (devo/ba.py:14-26, :173) — swallow-and-continue
    applies to the POSE update only.

    `structure_only` may be a traced bool: the full system is solved and
    the trivial structure-only updates are selected with where(), so one
    call serves both modes in a single compiled graph (the CUDA code
    switches on t1 - t0 == 0 at runtime, ba_cuda.cu:494-506).
    """
    B, E, C, v, u = sys
    Q = 1.0 / (C + lmbda)  # (M,)
    dZ_so = Q * u
    dZ_so = jnp.where(jnp.isfinite(dZ_so), dZ_so, 0.0)

    if isinstance(structure_only, bool) and structure_only:
        # static structure-only (training warmup): skip the solve entirely
        ok = jnp.isfinite(dZ_so).all()
        return jnp.zeros((B.shape[0] // 6, 6), B.dtype), dZ_so, ok

    hp = jax.lax.Precision.HIGHEST
    EQ = E * Q[None, :]
    S = B - jax.lax.dot(EQ, E.T, precision=hp)
    # keep the rhs and back-substitution products at f32: DEFAULT matmul
    # precision is bf16-effective on TPU and would inject ~1e-3 relative
    # noise into every GN update (the CPU suite can't see this)
    y = v - jax.lax.dot(EQ, u, precision=hp)
    diag = jnp.diagonal(S)
    S = S + jnp.diag(ep + lm * diag)

    L = jnp.linalg.cholesky(S)
    ok = jnp.isfinite(L).all()
    L_safe = jnp.where(ok, L, jnp.eye(S.shape[0], dtype=S.dtype))
    z = jax.scipy.linalg.solve_triangular(L_safe, y, lower=True)
    dX = jax.scipy.linalg.solve_triangular(L_safe.T, z, lower=False)
    dX = jnp.where(ok, dX, 0.0)
    dZ = Q * (u - jax.lax.dot(E.T, dX, precision=hp))
    dZ = jnp.where(jnp.isfinite(dZ), dZ, 0.0)
    if not isinstance(structure_only, bool):
        so = jnp.asarray(structure_only)
        dX = jnp.where(so, 0.0, dX)
        dZ = jnp.where(so, dZ_so, dZ)
        ok = jnp.where(so, jnp.isfinite(dZ_so).all(), ok)
    return dX.reshape(-1, 6), dZ, ok


def gauss_newton_step(
    poses: jnp.ndarray,        # (Np, 7)
    patches: jnp.ndarray,      # (Mp, 3, P, P)
    intrinsics: jnp.ndarray,   # (Np, 4)
    target: jnp.ndarray,       # (E, 2)
    weight: jnp.ndarray,       # (E, 2)
    lmbda: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    kk: jnp.ndarray,
    mask: jnp.ndarray,         # (E,) bool
    t0: jnp.ndarray,           # first free pose (scalar int)
    t1: jnp.ndarray,           # one-past-last active pose (scalar int)
    kbase: jnp.ndarray,        # first patch slot (scalar int)
    window: int,               # static: max free poses
    patch_slots: int,          # static: max active patches
    bounds: jnp.ndarray,       # (4,) [xmin, ymin, xmax, ymax]
    max_residual: float,       # residual gate (128 inference / 250 training)
    ep: float,
    lm: float,
    structure_only: bool = False,
    depth_clamp: str = "inference",
    geo_window=None,
):
    """One Gauss-Newton iteration over the active window.

    Mirrors one `itr` of ba_cuda.cu:461-537 (inference) and devo/ba.py:86-182
    (training differs only in gating constants, damping and depth clamping).
    """
    geo = edgewise.reproject(poses, patches, intrinsics, ii, jj, kk,
                             jacobian=True, window=geo_window)
    rx = target[:, 0] - geo.center_x
    ry = target[:, 1] - geo.center_y

    in_bounds = ((geo.center_x > bounds[0]) & (geo.center_y > bounds[1])
                 & (geo.center_x < bounds[2]) & (geo.center_y < bounds[3]))
    gate = ((rx * rx + ry * ry < max_residual * max_residual)
            & in_bounds & (geo.valid > 0) & mask)
    w = jnp.where(gate[:, None], weight, 0.0)
    r = jnp.stack([rx, ry], axis=-1)

    li = jnp.where((ii >= t0) & (ii < t1), ii - t0, -1).astype(jnp.int32)
    lj = jnp.where((jj >= t0) & (jj < t1), jj - t0, -1).astype(jnp.int32)
    li = jnp.where(li < window, li, -1)
    lj = jnp.where(lj < window, lj, -1)
    pk = (kk - kbase).astype(jnp.int32)
    slot_ok = (pk >= 0) & (pk < patch_slots)
    w = jnp.where(slot_ok[:, None], w, 0.0)
    sys = assemble(geo.Ji, geo.Jj, geo.Jz, r, w, li, lj, pk,
                   window, patch_slots)
    dX, dZ, ok = schur_solve(sys, lmbda, ep, lm, structure_only=structure_only)

    # pose retraction (ba_cuda.cu:160-188): poses[t0 + i] <- Exp(dX_i) *
    # pose. The free poses are CONTIGUOUS [t0, t1) — windowed dynamic
    # slices, not a row gather + scatter (both serialize on TPU; see
    # CLAUDE.md invariants)
    Np = poses.shape[0]
    base = jnp.clip(t0, 0, Np - window)
    sh = t0 - base            # > 0 only when t0 would overrun the buffer
    rows = jnp.arange(window)
    blk = jax.lax.dynamic_slice(poses, (base, jnp.int32(0)), (window, 7))
    dX_rows = dX[jnp.clip(rows - sh, 0, window - 1)]   # (window, 6) tiny
    upd = se3.retr(blk, dX_rows)
    sel = ((base + rows >= t0) & (base + rows < t1))[:, None]
    poses = jax.lax.dynamic_update_slice(
        poses, jnp.where(sel, upd, blk), (base, jnp.int32(0)))

    # depth retraction (ba_cuda.cu:191-211 / devo/ba.py:175-177); supports
    # both the generic (Mp, 3, P, P) layout and the runtime's flat (Mp, 3PP).
    # The clamp applies to every patch the solve ADDRESSES (reference kx =
    # unique(kk): even patches whose edges were all residual-gated — C == 0
    # — get the d>20 reset / floor); training clamps the whole window
    # (devo/ba.py:176 clamps the full disps tensor).
    if depth_clamp == "training":
        touched = jnp.ones_like(sys.C, bool)
    else:
        pk_ids = jnp.arange(patch_slots, dtype=pk.dtype)
        touched = jnp.any((pk[None, :] == pk_ids[:, None])
                          & (mask & slot_ok)[None, :], axis=1)
    # the active patch slots are CONTIGUOUS [kbase, kbase + patch_slots):
    # windowed dynamic slices, not row gathers/scatters (serial loops on TPU)
    kb = jnp.clip(kbase, 0, patches.shape[0] - patch_slots)
    if patches.ndim == 4:
        P_ = patches.shape[-1]
        blk = jax.lax.dynamic_slice(
            patches, (kb, 2, 0, 0), (patch_slots, 1, P_, P_))
        d_old = blk[:, 0]
        dz = dZ[:, None, None]
        t = touched[:, None, None]
    else:
        PP = patches.shape[-1] // 3
        blk = jax.lax.dynamic_slice(patches, (kb, 2 * PP), (patch_slots, PP))
        d_old = blk
        dz = dZ[:, None]
        t = touched[:, None]
    d_new = d_old + dz
    if depth_clamp == "inference":
        d_new = jnp.where(d_new > 20.0, 1.0, d_new)
        d_new = jnp.maximum(d_new, 1e-4)
    else:  # training (devo/ba.py:176)
        d_new = jnp.clip(d_new, 1e-3, 10.0)
    d_new = jnp.where(t, d_new, d_old)
    if patches.ndim == 4:
        patches = jax.lax.dynamic_update_slice(
            patches, d_new[:, None], (kb, 2, 0, 0))
    else:
        patches = jax.lax.dynamic_update_slice(patches, d_new, (kb, 2 * PP))
    return poses, patches, ok


def run_ba(
    poses, patches, intrinsics, target, weight, lmbda, ii, jj, kk, mask,
    t0, t1, kbase, window: int, patch_slots: int, bounds,
    iterations: int = 2, structure_only=None, max_residual: float = 128.0,
    ep: float = 1.0, lm: float = 1e-4, depth_clamp: str = "inference",
    kk_sorted: bool = False,  # accepted for API compat; one-hot assembly
                              # no longer has a sorted-ids fast path
    geo_window=None,
):
    """Multi-iteration Gauss-Newton BA (cuda_ba loop, ba_cuda.cu:461-537).

    `structure_only` may be a traced bool (the CUDA code switches on
    t1 - t0 == 0): schur_solve handles it with a where-select, so the
    system is reprojected and assembled ONCE per iteration — not traced
    twice through a lax.cond (each trace is a full reproject + Hessian
    assembly, and first compiles cost minutes on the remote compiler).
    """
    if structure_only is None:
        structure_only = (t1 - t0) == 0

    def body(carry, _):
        poses_, patches_ = carry
        poses_, patches_, _ = gauss_newton_step(
            poses_, patches_, intrinsics, target, weight, lmbda, ii, jj, kk,
            mask, t0, t1, kbase, window, patch_slots, bounds, max_residual,
            ep, lm, structure_only=structure_only, depth_clamp=depth_clamp,
            geo_window=geo_window)
        return (poses_, patches_), None

    (poses, patches), _ = jax.lax.scan(body, (poses, patches), None, length=iterations)
    return poses, patches
