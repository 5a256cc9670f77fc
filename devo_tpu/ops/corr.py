"""Edge-indexed sparse patch correlation.

Replacement for the reference's `cuda_corr.forward/backward`
(/root/reference/devo/altcorr/correlation_kernel.cu:83-190, bilinear blend at
:221-232). For every patch-graph edge, the P x P patch feature gmap[kk] is
dotted against a (2r+2)^2 integer-grid neighborhood of the target feature map
fmap[jj] around the reprojected coordinates, then bilinearly blended down to
(2r+1)^2.

Output layout matches the reference's flattened ordering exactly
(correlation_kernel.cu:232 permutes the x-offset axis in front of the
y-offset axis): flattening yields [dx(7), dy(7), pi(P), pj(P), level], the
2*49*P*P corr feature consumed by the update operator (devo/enet.py:59).

TPU shape discipline: every intermediate is (E, P*P[, C]) — the patch-pixel
dim rides the sublanes and the channel dim the lanes, so nothing pads out
(an (E, 3, 3, C)-style layout would tile-pad ~30x). One gather of
(E*P*P, C) rows per integer tap; 64 taps per level. XLA keeps the
multiply-reduce fused into the gather consumer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def corr(
    gmap: jnp.ndarray,
    fmap: jnp.ndarray,
    coords: jnp.ndarray,
    kk: jnp.ndarray,
    jj: jnp.ndarray,
    radius: int = 3,
) -> jnp.ndarray:
    """Sparse local correlation.

    Args:
      gmap:   (M, P, P, C) patch (source) features.
      fmap:   (N, H, W, C) target feature maps (one pyramid level).
      coords: (E, P, P, 2) reprojected [x, y] at this level's resolution.
      kk:     (E,) int32 patch index into gmap.
      jj:     (E,) int32 frame index into fmap.
      radius: correlation radius r.

    Returns:
      (E, (2r+1)^2 * P*P) flat correlation, ordered [dx, dy, pi, pj].
    """
    N, H, W, C = fmap.shape
    E, P = coords.shape[0], coords.shape[1]
    PP = P * P
    D = 2 * radius + 2
    d = 2 * radius + 1

    g = gmap[kk].reshape(E, PP, C)

    x = coords[..., 0].reshape(E, PP).astype(jnp.float32)
    y = coords[..., 1].reshape(E, PP).astype(jnp.float32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = (x - x0).astype(fmap.dtype)  # (E, PP)
    dy = (y - y0).astype(fmap.dtype)

    flat = fmap.reshape(N * H * W, C)
    base = jj.astype(jnp.int32)[:, None] * (H * W)

    def tap(di: int, dj: int) -> jnp.ndarray:
        """Integer-grid correlation at tap (di=y-offset, dj=x-offset)."""
        iy = y0 + (di - radius)
        ix = x0 + (dj - radius)
        inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        idx = base + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        f = flat[idx.reshape(-1)].reshape(E, PP, C)
        s = jnp.einsum("epc,epc->ep", g, f,
                       preferred_element_type=jnp.float32)
        return jnp.where(inb, s, 0.0)

    grid = [[tap(di, dj) for dj in range(D)] for di in range(D)]

    dxf = dx.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    cols = []
    # x-offset outer so the flat order is [dx][dy][pixel]
    for djj in range(d):
        for dii in range(d):
            c00 = grid[dii][djj]
            c01 = grid[dii][djj + 1]
            c10 = grid[dii + 1][djj]
            c11 = grid[dii + 1][djj + 1]
            cols.append((1 - dxf) * (1 - dyf) * c00 + dxf * (1 - dyf) * c01
                        + (1 - dxf) * dyf * c10 + dxf * dyf * c11)
    return jnp.concatenate(cols, axis=-1)  # (E, d*d*PP)


def corr_pyramid(
    gmap: jnp.ndarray,
    pyramid,
    coords: jnp.ndarray,
    kk: jnp.ndarray,
    jj: jnp.ndarray,
    radius: int = 3,
    levels=(1, 4),
) -> jnp.ndarray:
    """Multi-level correlation feature (devo/enet.py:203-216, devo.py:210-217).

    coords is at level-1 resolution; each level divides it by its stride.
    Returns the flattened (E, L*(2r+1)^2*P*P) feature with reference ordering
    [dx, dy, pi, pj, level].
    """
    E = coords.shape[0]
    outs = [
        corr(gmap, fmap_l, coords / lvl, kk, jj, radius)
        for fmap_l, lvl in zip(pyramid, levels)
    ]
    return jnp.stack(outs, axis=-1).reshape(E, -1)
