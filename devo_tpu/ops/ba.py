"""Differentiable bundle adjustment (DBA) for patch-based VO, in pure JAX.

Unifies the reference's two BA implementations into one math core:
  * training DBA  — /root/reference/devo/ba.py (torch_scatter + autograd
    Cholesky), used inside the unrolled eVONet forward;
  * inference DBA — /root/reference/devo/fastba/ba_cuda.cu (fused CUDA
    Gauss-Newton with atomicAdd Hessian assembly, Schur complement, Cholesky,
    SE3/depth retraction kernels).

TPU-native design decisions:
  * atomicAdd scatters -> jax.ops.segment_sum (deterministic; the reference's
    float atomics are not);
  * dynamic edge lists -> fixed-capacity arrays + boolean mask. Fixed poses
    (index < t0) and padded pose/patch slots drop out of the system
    automatically: their rows/columns accumulate zero and the ep damping
    (S_diag += ep + lm * S_diag, ba_cuda.cu:517-518) keeps S invertible;
  * the Schur system is a dense (6N, 6N) matrix with N <= optimization
    window (<= 12), so the Cholesky runs in f32 on the MXU without blocking.

Pose Jacobians come from geom.projective.transform(jacobian=True); the edge
residual uses the patch-center pixel only, exactly like the CUDA kernel
(ba_cuda.cu:254-257).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from devo_tpu.geom import projective as pops
from devo_tpu.lie import se3


class BASystem(NamedTuple):
    B: jnp.ndarray  # (6N, 6N)
    E: jnp.ndarray  # (6N, M)
    C: jnp.ndarray  # (M,)
    v: jnp.ndarray  # (6N,)
    u: jnp.ndarray  # (M,)


def assemble(
    Ji: jnp.ndarray,      # (E, 2, 6)
    Jj: jnp.ndarray,      # (E, 2, 6)
    Jz: jnp.ndarray,      # (E, 2, 1)
    r: jnp.ndarray,       # (E, 2) residual target - proj
    w: jnp.ndarray,       # (E, 2) confidence weights (already gated)
    li: jnp.ndarray,      # (E,) local pose index of frame ii, -1 if fixed
    lj: jnp.ndarray,      # (E,) local pose index of frame jj, -1 if fixed
    pk: jnp.ndarray,      # (E,) local patch slot in [0, M)
    n_poses: int,
    n_patches: int,
) -> BASystem:
    """Accumulate the block Hessian via segment sums (ba_cuda.cu:242-363)."""
    mi = (li >= 0)
    mj = (lj >= 0)
    wi = jnp.where(mi[:, None], w, 0.0)
    wj = jnp.where(mj[:, None], w, 0.0)
    wij = jnp.where((mi & mj)[:, None], w, 0.0)

    def blk(wa, Ja, Jb):  # sum_rows w_r Ja_r (x) Jb_r -> (E, 6, 6)
        return jnp.einsum("er,eri,erj->eij", wa, Ja, Jb)

    N6 = 6 * n_poses
    li_c = jnp.clip(li, 0, n_poses - 1)
    lj_c = jnp.clip(lj, 0, n_poses - 1)

    # pose-pose block scatter into (N, N, 6, 6)
    nn = n_poses * n_poses
    flat = (
        jax.ops.segment_sum(blk(wi, Ji, Ji), li_c * n_poses + li_c, num_segments=nn)
        + jax.ops.segment_sum(blk(wij, Ji, Jj), li_c * n_poses + lj_c, num_segments=nn)
        + jax.ops.segment_sum(blk(wij, Jj, Ji), lj_c * n_poses + li_c, num_segments=nn)
        + jax.ops.segment_sum(blk(wj, Jj, Jj), lj_c * n_poses + lj_c, num_segments=nn)
    )
    B = flat.reshape(n_poses, n_poses, 6, 6).transpose(0, 2, 1, 3).reshape(N6, N6)

    # pose-patch coupling (6N, M)
    Eik = jnp.einsum("er,eri,er->ei", wi, Ji, Jz[..., 0])
    Ejk = jnp.einsum("er,eri,er->ei", wj, Jj, Jz[..., 0])
    pk_c = jnp.clip(pk, 0, n_patches - 1)
    nm = n_poses * n_patches
    Eflat = (
        jax.ops.segment_sum(Eik, li_c * n_patches + pk_c, num_segments=nm)
        + jax.ops.segment_sum(Ejk, lj_c * n_patches + pk_c, num_segments=nm)
    )
    E = Eflat.reshape(n_poses, n_patches, 6).transpose(0, 2, 1).reshape(N6, n_patches)

    # patch-patch diagonal + rhs
    C = jax.ops.segment_sum(jnp.sum(w * Jz[..., 0] ** 2, -1), pk_c, num_segments=n_patches)
    u = jax.ops.segment_sum(jnp.sum(w * Jz[..., 0] * r, -1), pk_c, num_segments=n_patches)

    vi = jnp.einsum("er,eri->ei", wi * r, Ji)
    vj = jnp.einsum("er,eri->ei", wj * r, Jj)
    v = (
        jax.ops.segment_sum(vi, li_c, num_segments=n_poses)
        + jax.ops.segment_sum(vj, lj_c, num_segments=n_poses)
    ).reshape(N6)

    return BASystem(B, E, C, v, u)


def schur_solve(
    sys: BASystem,
    lmbda: jnp.ndarray,
    ep: float,
    lm: float,
    structure_only: bool = False,
):
    """Schur-complement solve (ba_cuda.cu:492-527 / devo/ba.py:155-173).

    Returns (dX (N, 6), dZ (M,), ok scalar bool). On Cholesky failure both
    updates are zero, mirroring the reference's swallow-and-continue
    semantics (devo/ba.py:14-26, devo.py:336-340).
    """
    B, E, C, v, u = sys
    M = C.shape[0]
    Q = 1.0 / (C + lmbda)  # (M,)

    if structure_only:
        dZ = Q * u
        ok = jnp.isfinite(dZ).all()
        return jnp.zeros((B.shape[0] // 6, 6), B.dtype), jnp.where(ok, dZ, 0.0), ok

    EQ = E * Q[None, :]
    S = B - EQ @ E.T
    y = v - EQ @ u
    # damping: diag += ep + lm * diag
    diag = jnp.diagonal(S)
    S = S + jnp.diag(ep + lm * diag)

    L = jnp.linalg.cholesky(S)
    ok = jnp.isfinite(L).all()
    L_safe = jnp.where(ok, L, jnp.eye(S.shape[0], dtype=S.dtype))
    z = jax.scipy.linalg.solve_triangular(L_safe, y, lower=True)
    dX = jax.scipy.linalg.solve_triangular(L_safe.T, z, lower=False)
    dX = jnp.where(ok, dX, 0.0)
    dZ = Q * (u - E.T @ dX)
    dZ = jnp.where(ok, dZ, 0.0)
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
):
    """One Gauss-Newton iteration over the active window.

    Mirrors one `itr` of ba_cuda.cu:461-537 (inference) and devo/ba.py:86-182
    (training differs only in gating constants, damping and depth clamping).
    """
    coords, valid, (Ji, Jj, Jz) = pops.transform(
        poses, patches, intrinsics, ii, jj, kk, jacobian=True)
    P = patches.shape[-1]
    center = coords[:, P // 2, P // 2, :]
    r = target - center

    in_bounds = (
        (center[:, 0] > bounds[0]) & (center[:, 1] > bounds[1])
        & (center[:, 0] < bounds[2]) & (center[:, 1] < bounds[3])
    )
    gate = (jnp.linalg.norm(r, axis=-1) < max_residual) & in_bounds & (valid > 0)
    w = jnp.where((gate & mask)[:, None], weight, 0.0)

    li = jnp.where((ii >= t0) & (ii < t1), ii - t0, -1).astype(jnp.int32)
    lj = jnp.where((jj >= t0) & (jj < t1), jj - t0, -1).astype(jnp.int32)
    li = jnp.where(li < window, li, -1)
    lj = jnp.where(lj < window, lj, -1)
    pk = (kk - kbase).astype(jnp.int32)
    slot_ok = (pk >= 0) & (pk < patch_slots)
    w = jnp.where(slot_ok[:, None], w, 0.0)

    sys = assemble(Ji, Jj, Jz, r, w, li, lj, pk, window, patch_slots)
    dX, dZ, ok = schur_solve(sys, lmbda, ep, lm, structure_only=structure_only)

    # pose retraction (ba_cuda.cu:160-188): poses[t0 + i] <- Exp(dX_i) * pose
    pose_idx = t0 + jnp.arange(window)
    pose_upd = se3.retr(poses[pose_idx], dX)
    upd_mask = (pose_idx < t1)[:, None]
    new_rows = jnp.where(upd_mask, pose_upd, poses[pose_idx])
    poses = poses.at[pose_idx].set(new_rows, mode="drop")

    # depth retraction (ba_cuda.cu:191-211 / devo/ba.py:175-177)
    touched = jax.ops.segment_sum(
        (w.sum(-1) > 0).astype(jnp.float32), jnp.clip(pk, 0, patch_slots - 1),
        num_segments=patch_slots) > 0
    slot_idx = kbase + jnp.arange(patch_slots)
    d_old = patches[slot_idx, 2]  # (patch_slots, P, P)
    d_new = d_old + dZ[:, None, None]
    if depth_clamp == "inference":
        d_new = jnp.where(d_new > 20.0, 1.0, d_new)
        d_new = jnp.maximum(d_new, 1e-4)
    else:  # training (devo/ba.py:176)
        d_new = jnp.clip(d_new, 1e-3, 10.0)
    d_new = jnp.where(touched[:, None, None], d_new, d_old)
    patches = patches.at[slot_idx, 2].set(d_new, mode="drop")
    return poses, patches, ok


def run_ba(
    poses, patches, intrinsics, target, weight, lmbda, ii, jj, kk, mask,
    t0, t1, kbase, window: int, patch_slots: int, bounds,
    iterations: int = 2, structure_only=None, max_residual: float = 128.0,
    ep: float = 1.0, lm: float = 1e-4, depth_clamp: str = "inference",
):
    """Multi-iteration Gauss-Newton BA (cuda_ba loop, ba_cuda.cu:461-537).

    `structure_only` may be a traced bool (the CUDA code switches on
    t1 - t0 == 0); both branches are computed via the same assembled system.
    """
    if structure_only is None:
        structure_only = (t1 - t0) == 0

    def body(carry, _):
        poses_, patches_ = carry

        def full(args):
            p, q = args
            return gauss_newton_step(
                p, q, intrinsics, target, weight, lmbda, ii, jj, kk, mask,
                t0, t1, kbase, window, patch_slots, bounds, max_residual,
                ep, lm, structure_only=False, depth_clamp=depth_clamp)[:2]

        def struct(args):
            p, q = args
            return gauss_newton_step(
                p, q, intrinsics, target, weight, lmbda, ii, jj, kk, mask,
                t0, t1, kbase, window, patch_slots, bounds, max_residual,
                ep, lm, structure_only=True, depth_clamp=depth_clamp)[:2]

        poses_, patches_ = jax.lax.cond(structure_only, struct, full, (poses_, patches_))
        return (poses_, patches_), None

    (poses, patches), _ = jax.lax.scan(body, (poses, patches), None, length=iterations)
    return poses, patches
