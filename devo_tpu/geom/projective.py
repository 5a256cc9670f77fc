"""Projective patch geometry in pure JAX.

Replacement for /root/reference/devo/projective_ops.py: patch back-projection,
SE3 transform between frames, pinhole projection, analytic Jacobians
(Ji, Jj, Jz), point clouds and flow magnitude.

Layouts (single sample; batch via vmap where needed):
  poses       (N, 7)            world-to-camera SE3 (lietorch layout)
  patches     (M, 3, P, P)      channels [x, y, inv_depth] at feature res
  intrinsics  (N, 4)            [fx, fy, cx, cy] at feature res
  ii, jj, kk  (E,) int32        source frame / target frame / patch index

All edge-indexed functions take fixed-size index arrays; invalid (masked)
edges should carry in-range dummy indices — outputs for them are garbage the
caller masks out.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from devo_tpu.lie import se3

MIN_DEPTH = 0.2  # projective_ops.py:6


class TransformJacobians(NamedTuple):
    Ji: jnp.ndarray  # (E, 2, 6) d(proj)/d(pose_i tangent)
    Jj: jnp.ndarray  # (E, 2, 6) d(proj)/d(pose_j tangent)
    Jz: jnp.ndarray  # (E, 2, 1) d(proj)/d(inv depth)


def iproj(patches: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Back-project patches to homogeneous points (projective_ops.py:19-29).

    patches: (..., 3, P, P), intrinsics: (..., 4)
    returns X: (..., P, P, 4) = [xn, yn, 1, d]
    """
    x = patches[..., 0, :, :]
    y = patches[..., 1, :, :]
    d = patches[..., 2, :, :]
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X: jnp.ndarray, intrinsics: jnp.ndarray, depth: bool = False) -> jnp.ndarray:
    """Pinhole projection (projective_ops.py:32-50).

    X: (..., P, P, 4), intrinsics: (..., 4) -> (..., P, P, 2[+1])
    """
    Z = X[..., 2]
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    d = 1.0 / jnp.maximum(Z, 0.1)
    x = fx * (d * X[..., 0]) + cx
    y = fy * (d * X[..., 1]) + cy
    if depth:
        return jnp.stack([x, y, d], axis=-1)
    return jnp.stack([x, y], axis=-1)


def relative_poses(poses: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray) -> jnp.ndarray:
    """Gij = pose_j * pose_i^-1 for each edge."""
    return se3.mul(poses[jj], se3.inv(poses[ii]))


def transform(
    poses: jnp.ndarray,
    patches: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    kk: jnp.ndarray,
    depth: bool = False,
    valid: bool = False,
    jacobian: bool = False,
    tonly: bool = False,
):
    """Reproject patch kk from frame ii into frame jj (projective_ops.py:53-105).

    Returns coords (E, P, P, 2) and optionally a validity mask (E,) plus the
    analytic Jacobians evaluated at the patch center.
    """
    X0 = iproj(patches[kk], intrinsics[ii])  # (E, P, P, 4)
    Gij = relative_poses(poses, ii, jj)      # (E, 7)
    if tonly:
        Gij = Gij.at[..., 3:].set(jnp.asarray([0.0, 0.0, 0.0, 1.0], Gij.dtype))

    X1 = se3.act4(Gij[:, None, None, :], X0)  # (E, P, P, 4)
    coords = proj(X1, intrinsics[jj], depth=depth)

    p = X0.shape[-2]
    Zc = X1[..., p // 2, p // 2, 2]
    vmask = (Zc > MIN_DEPTH).astype(coords.dtype)

    if jacobian:
        Xc = X1[..., p // 2, p // 2, :]
        X, Y, Z, H = Xc[..., 0], Xc[..., 1], Xc[..., 2], Xc[..., 3]
        o = jnp.zeros_like(H)
        fx, fy = intrinsics[jj][..., 0], intrinsics[jj][..., 1]
        d = jnp.where(jnp.abs(Z) > 0.2, 1.0 / jnp.where(jnp.abs(Z) > 0.2, Z, 1.0), 0.0)

        # Ja: d(X1)/d(xi_j) with homogeneous generator layout
        # (projective_ops.py:83-88)
        Ja = jnp.stack(
            [
                H, o, o, o, Z, -Y,
                o, H, o, -Z, o, X,
                o, o, H, Y, -X, o,
                o, o, o, o, o, o,
            ],
            axis=-1,
        ).reshape(Xc.shape[:-1] + (4, 6))

        # Jp: d(proj)/d(X1) (projective_ops.py:90-93)
        Jp = jnp.stack(
            [
                fx * d, o, -fx * X * d * d, o,
                o, fy * d, -fy * Y * d * d, o,
            ],
            axis=-1,
        ).reshape(Xc.shape[:-1] + (2, 4))

        Jj_ = Jp @ Ja                                     # (E, 2, 6)
        Ji_ = -se3.adjT(Gij[:, None, :], Jj_)             # adjT row-wise
        Jz_ = Jp @ se3.matrix(Gij)[..., :, 3:]            # (E, 2, 1)
        return coords, vmask, TransformJacobians(Ji_, Jj_, Jz_)

    if valid:
        return coords, vmask
    return coords


def point_cloud(poses: jnp.ndarray, patches: jnp.ndarray,
                intrinsics: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Back-project patches to world frame (projective_ops.py:107-109)."""
    X = iproj(patches, intrinsics[ix])          # (M, P, P, 4)
    Ginv = se3.inv(poses[ix])                   # (M, 7)
    return se3.act4(Ginv[:, None, None, :], X)


def flow_mag(poses, patches, intrinsics, ii, jj, kk, beta: float = 0.3):
    """Blended rot/trans induced flow magnitude (projective_ops.py:111-121)."""
    coords0 = transform(poses, patches, intrinsics, ii, ii, kk)
    coords1 = transform(poses, patches, intrinsics, ii, jj, kk)
    coords2 = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True)
    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    return beta * flow1 + (1.0 - beta) * flow2
