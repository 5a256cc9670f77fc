"""Edge-indexed sparse patch correlation.

Replacement for the reference's `cuda_corr.forward/backward`
(/root/reference/devo/altcorr/correlation_kernel.cu:83-190, bilinear blend at
:221-232). For every patch-graph edge, the P x P patch feature gmap[kk] is
dotted against a (2r+2)^2 integer-grid neighborhood of the target feature map
fmap[jj] around the reprojected coordinates, then bilinearly blended down to
(2r+1)^2.

Output layout matches the reference's flattened ordering exactly
(correlation_kernel.cu:232 permutes so the x-offset axis precedes the
y-offset axis): (E, Dx, Dy, P, P) per level, so that
stack(levels, -1).reshape(E, -1) reproduces the 2*49*P*P corr feature vector
consumed by the update operator's corr MLP (devo/enet.py:59).

Strategy: loop over the (2r+2)^2 integer offsets; each step is one gather of
(E, P, P, C) rows plus a fused multiply-reduce. This keeps peak memory at
O(E P^2 C) instead of O(E P^2 D^2 C) while generating pure gather/dot HLO
that XLA pipelines well. A Pallas kernel can replace this hot path without
changing the interface.
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
      radius: correlation radius r (output window is (2r+1)^2).

    Returns:
      (E, 2r+1, 2r+1, P, P) with the first window axis being the x-offset.
    """
    N, H, W, C = fmap.shape
    E, P = coords.shape[0], coords.shape[1]
    D = 2 * radius + 2

    g = gmap[kk]  # (E, P, P, C)

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = (x - x0).astype(fmap.dtype)  # (E, P, P)
    dy = (y - y0).astype(fmap.dtype)

    flat = fmap.reshape(N * H * W, C)
    base = jj.astype(jnp.int32) * (H * W)

    def tap(di: int, dj: int) -> jnp.ndarray:
        """Correlation against the integer tap (di, dj) of the D x D grid."""
        iy = y0 + (di - radius)
        ix = x0 + (dj - radius)
        inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        idx = base[:, None, None] + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        f = flat[idx.reshape(-1)].reshape(E, P, P, C)
        s = jnp.sum(g * f, axis=-1)
        return jnp.where(inb, s, 0.0)

    # integer-grid correlations, laid out [y-offset][x-offset]
    grid = [[tap(di, dj) for dj in range(D)] for di in range(D)]

    d = 2 * radius + 1
    rows = []
    for di in range(d):
        row = []
        for dj in range(d):
            c00 = grid[di][dj]
            c01 = grid[di][dj + 1]
            c10 = grid[di + 1][dj]
            c11 = grid[di + 1][dj + 1]
            blended = ((1 - dx) * (1 - dy) * c00 + dx * (1 - dy) * c01
                       + (1 - dx) * dy * c10 + dx * dy * c11)
            row.append(blended)
        rows.append(row)
    out = jnp.stack([jnp.stack(r, axis=1) for r in rows], axis=1)  # (E, dy, dx, P, P)
    # reference permutes x-offset in front of y-offset (correlation_kernel.cu:232)
    return jnp.swapaxes(out, 1, 2)


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
    Returns the flattened (E, L*(2r+1)^2*P*P) feature with reference ordering.
    """
    E = coords.shape[0]
    outs = [
        corr(gmap, fmap_l, coords / lvl, kk, jj, radius)
        for fmap_l, lvl in zip(pyramid, levels)
    ]
    return jnp.stack(outs, axis=-1).reshape(E, -1)
