"""Edge-wise projective geometry in TPU-friendly layout.

Performance twin of geom/projective.py. The generic implementation carries
(E, P, P, 4)-shaped tensors whose tiny trailing dims pad to (8, 128) tiles —
a 30x memory blowup per temporary on TPU. Here every intermediate is a
structure-of-arrays: scalar components live in 1-D (E,) or 2-D (E, P*P)
arrays whose minor dimension maps densely onto vector lanes, mirroring how
the reference's fused CUDA kernel holds them in registers
(/root/reference/devo/fastba/ba_cuda.cu:242-365).

Math is identical to projective.py (same conventions, same Jacobians); the
correctness tests cross-check the two implementations.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from devo_tpu.ops.lookup import lookup

MIN_DEPTH = 0.2


class LiveWindow(NamedTuple):
    """Live table window for one-hot lookups (ops/lookup.py): edge indices
    ii/jj must fall in [frame_base, frame_base + frames) and kk in
    [frame_base*M, frame_base*M + frames*M). Row gathers from the full
    buffers lower to ~us-per-row serial loops on TPU; one-hot MXU lookups
    over the live window are ~500x faster."""
    frame_base: jnp.ndarray   # () i32 (traced ok)
    frames: int               # static window length


def _tables(poses, intrinsics, flat_patches, ii, jj, kk,
            window: Optional[LiveWindow]):
    """Per-edge rows of the three tables, gather or windowed one-hot."""
    if window is None:
        return (poses[ii], poses[jj], intrinsics[ii], intrinsics[jj],
                flat_patches[kk])
    fb, F = window.frame_base, window.frames
    M = flat_patches.shape[0] // poses.shape[0]
    # clamp INTO the window: an out-of-window (masked/padded) edge must read
    # some real row — an all-zero one-hot would yield zero intrinsics and
    # NaN coords that poison downstream clips/casts
    ii = jnp.clip(ii, fb, fb + F - 1)
    jj = jnp.clip(jj, fb, fb + F - 1)
    kk = jnp.clip(kk, fb * M, fb * M + F * M - 1)
    pi = lookup(poses, ii, fb, F)
    pj = lookup(poses, jj, fb, F)
    gi = lookup(intrinsics, ii, fb, F)
    gj = lookup(intrinsics, jj, fb, F)
    pk = lookup(flat_patches, kk, fb * M, F * M)
    return pi, pj, gi, gj, pk


def _qrot(q, v):
    """Rotate vectors by quaternions; q = 4-tuple of (...,) arrays, v = 3-tuple."""
    qx, qy, qz, qw = q
    vx, vy, vz = v
    ux = 2.0 * (qy * vz - qz * vy)
    uy = 2.0 * (qz * vx - qx * vz)
    uz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * ux + (qy * uz - qz * uy),
        vy + qw * uy + (qz * ux - qx * uz),
        vz + qw * uz + (qx * uy - qy * ux),
    )


def _rel_pose(ti, qi, tj, qj):
    """G_ij = G_j * G_i^{-1} in components (cf. relSE3, ba_cuda.cu:56-67)."""
    ix, iy, iz, iw = qi
    jx, jy, jz, jw = qj
    # q_ij = q_j * conj(q_i)
    qij = (
        -jw * ix + jx * iw - jy * iz + jz * iy,
        -jw * iy + jy * iw - jz * ix + jx * iz,
        -jw * iz + jz * iw - jx * iy + jy * ix,
        jw * iw + jx * ix + jy * iy + jz * iz,
    )
    rx, ry, rz = _qrot(qij, ti)
    tij = (tj[0] - rx, tj[1] - ry, tj[2] - rz)
    return tij, qij


class EdgeGeometry(NamedTuple):
    """Everything one update iteration needs, in lane-friendly shapes."""
    coords_x: jnp.ndarray   # (E, P*P) reprojected x
    coords_y: jnp.ndarray   # (E, P*P)
    center_x: jnp.ndarray   # (E,)
    center_y: jnp.ndarray   # (E,)
    valid: jnp.ndarray      # (E,) center Z > MIN_DEPTH
    Ji: jnp.ndarray         # (E, 12) rows [x-row(6), y-row(6)]
    Jj: jnp.ndarray         # (E, 12)
    Jz: jnp.ndarray         # (E, 2)


def reproject(
    poses: jnp.ndarray,       # (N, 7)
    patches: jnp.ndarray,     # (Mp, 3, P, P)
    intrinsics: jnp.ndarray,  # (N, 4)
    ii: jnp.ndarray, jj: jnp.ndarray, kk: jnp.ndarray,
    jacobian: bool = False,
    window: Optional[LiveWindow] = None,
):
    """Reproject patches kk from frame ii into jj; optionally with the
    analytic center-pixel Jacobians (pops.transform semantics)."""
    E = ii.shape[0]
    # patches may be the generic (Mp, 3, P, P) layout or the engine's flat
    # (Mp, 3*P*P) table (tiny trailing dims tile-pad ~30x on TPU, so the
    # runtime stores patches flat)
    if patches.ndim == 4:
        P = patches.shape[-1]
        PP = P * P
        flat_patches = patches.reshape(patches.shape[0], 3 * PP)
    else:
        PP = patches.shape[-1] // 3
        flat_patches = patches

    gp_i, gp_j, intr_i, intr_j, pk = _tables(
        poses, intrinsics, flat_patches, ii, jj, kk, window)
    ti = (gp_i[:, 0], gp_i[:, 1], gp_i[:, 2])
    qi = (gp_i[:, 3], gp_i[:, 4], gp_i[:, 5], gp_i[:, 6])
    tj = (gp_j[:, 0], gp_j[:, 1], gp_j[:, 2])
    qj = (gp_j[:, 3], gp_j[:, 4], gp_j[:, 5], gp_j[:, 6])
    tij, qij = _rel_pose(ti, qi, tj, qj)

    fx_i, fy_i, cx_i, cy_i = intr_i[:, 0], intr_i[:, 1], intr_i[:, 2], intr_i[:, 3]
    fx_j, fy_j, cx_j, cy_j = intr_j[:, 0], intr_j[:, 1], intr_j[:, 2], intr_j[:, 3]
    px = pk[:, :PP]                        # (E, PP)
    py = pk[:, PP:2 * PP]
    pd = pk[:, 2 * PP:]

    # back-project (iproj), transform (act4), project — all on (E, PP)
    xn = (px - cx_i[:, None]) / fx_i[:, None]
    yn = (py - cy_i[:, None]) / fy_i[:, None]
    one = jnp.ones_like(xn)
    qb = tuple(c[:, None] for c in qij)
    X, Y, Z = _qrot(qb, (xn, yn, one))
    X = X + tij[0][:, None] * pd
    Y = Y + tij[1][:, None] * pd
    Z = Z + tij[2][:, None] * pd

    d = 1.0 / jnp.maximum(Z, 0.1)
    coords_x = fx_j[:, None] * X * d + cx_j[:, None]
    coords_y = fy_j[:, None] * Y * d + cy_j[:, None]

    c = PP // 2
    Xc, Yc, Zc, Wc = X[:, c], Y[:, c], Z[:, c], pd[:, c]
    valid = (Zc > MIN_DEPTH).astype(coords_x.dtype)

    if not jacobian:
        return EdgeGeometry(coords_x, coords_y, coords_x[:, c], coords_y[:, c],
                            valid, None, None, None)

    dc = jnp.where(jnp.abs(Zc) > 0.2, 1.0 / jnp.where(jnp.abs(Zc) > 0.2, Zc, 1.0), 0.0)
    d2 = dc * dc
    o = jnp.zeros_like(Zc)

    # d(proj)/d(xi_j): same closed form the CUDA kernel uses in registers
    # (ba_cuda.cu:290, 330); rows stacked as (E, 12) = [x-row, y-row]
    Jj_rows = jnp.stack([
        fx_j * Wc * dc, o, -fx_j * Xc * Wc * d2,
        -fx_j * Xc * Yc * d2, fx_j * (1.0 + Xc * Xc * d2), -fx_j * Yc * dc,
        o, fy_j * Wc * dc, -fy_j * Yc * Wc * d2,
        fy_j * (-1.0 - Yc * Yc * d2), fy_j * Xc * Yc * d2, fy_j * Xc * dc,
    ], axis=-1)  # (E, 12)

    # Ji = -AdjT(G_ij) applied per row (projective_ops.py:96). AdjT in
    # components: out_t = R^T a_t ; out_r = R^T a_r - R^T (t x a_t).
    qc = (-qij[0], -qij[1], -qij[2], qij[3])

    def adjT_row(row):  # row: (E, 6) -> -AdjT(G_ij) row
        at = (row[:, 0], row[:, 1], row[:, 2])
        ar = (row[:, 3], row[:, 4], row[:, 5])
        tx, ty, tz = tij
        cx_ = ty * at[2] - tz * at[1]   # t x a_t
        cy_ = tz * at[0] - tx * at[2]
        cz_ = tx * at[1] - ty * at[0]
        ot = _qrot(qc, at)              # R^T a_t
        orr = _qrot(qc, ar)             # R^T a_r
        rt = _qrot(qc, (cx_, cy_, cz_))  # R^T (t x a_t)
        orr = (orr[0] - rt[0], orr[1] - rt[1], orr[2] - rt[2])
        return jnp.stack([-ot[0], -ot[1], -ot[2], -orr[0], -orr[1], -orr[2]], -1)

    Ji_rows = jnp.concatenate(
        [adjT_row(Jj_rows[:, :6]), adjT_row(Jj_rows[:, 6:])], axis=-1)  # (E, 12)

    # Jz: d(proj)/d(inverse depth) = Jp @ (4th column of G_ij matrix) —
    # equivalently the translation column (ba_cuda.cu:289, 329)
    Jz = jnp.stack([
        fx_j * (tij[0] * dc - tij[2] * Xc * d2),
        fy_j * (tij[1] * dc - tij[2] * Yc * d2),
    ], axis=-1)  # (E, 2)

    return EdgeGeometry(coords_x, coords_y, coords_x[:, c], coords_y[:, c],
                        valid, Ji_rows, Jj_rows, Jz)


def coords_to_corr_format(geo: EdgeGeometry, P: int) -> jnp.ndarray:
    """(E, P, P, 2) view for the correlation op."""
    E = geo.coords_x.shape[0]
    return jnp.stack([geo.coords_x, geo.coords_y], -1).reshape(E, P, P, 2)


def flow_mag_edges(
    poses, patches, intrinsics, ii, jj, kk, beta: float = 0.5,
    window: Optional[LiveWindow] = None,
) -> jnp.ndarray:
    """Per-edge mean flow magnitude (pops.flow_mag over a small edge set).
    Returns (E,) mean over patch pixels."""
    g1 = reproject(poses, patches, intrinsics, ii, jj, kk, window=window)
    # translation-only transform: zero out rotation by using identity rel
    # rotation — reproduce pops.transform(tonly=True)
    fp = patches.reshape(patches.shape[0], -1) if patches.ndim == 4 else patches
    gp_i, gp_j, intr_i, intr_j, pk = _tables(
        poses, intrinsics, fp, ii, jj, kk, window)
    P2 = g1.coords_x.shape[1]
    ti = (gp_i[:, 0], gp_i[:, 1], gp_i[:, 2])
    qi = (gp_i[:, 3], gp_i[:, 4], gp_i[:, 5], gp_i[:, 6])
    tj = (gp_j[:, 0], gp_j[:, 1], gp_j[:, 2])
    qj = (gp_j[:, 3], gp_j[:, 4], gp_j[:, 5], gp_j[:, 6])
    tij, qij = _rel_pose(ti, qi, tj, qj)
    px = pk[:, :P2]
    py = pk[:, P2:2 * P2]
    pd = pk[:, 2 * P2:]
    xn = (px - intr_i[:, 2:3]) / intr_i[:, 0:1]
    yn = (py - intr_i[:, 3:4]) / intr_i[:, 1:2]
    X = xn + tij[0][:, None] * pd
    Y = yn + tij[1][:, None] * pd
    Z = 1.0 + tij[2][:, None] * pd
    d = 1.0 / jnp.maximum(Z, 0.1)
    tx = intr_j[:, 0:1] * X * d + intr_j[:, 2:3]
    ty = intr_j[:, 1:2] * Y * d + intr_j[:, 3:4]

    # the reference's coords0 = transform(..., ii, ii) is an identity
    # transform whose projection is algebraically the raw patch coords —
    # (px, py) replaces a third full reproject on the keyframe path
    f1 = jnp.sqrt((g1.coords_x - px) ** 2 + (g1.coords_y - py) ** 2)
    f2 = jnp.sqrt((tx - px) ** 2 + (ty - py) ** 2)
    return (beta * f1 + (1 - beta) * f2).mean(axis=-1)
