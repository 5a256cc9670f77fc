"""Patch extraction (gather + bilinear) in pure XLA.

Replacement for the reference's `cuda_corr.patchify_forward/backward`
(/root/reference/devo/altcorr/correlation_kernel.cu:17-80 and
correlation.py:51-68). The CUDA kernel gathers a (2R+2)^2 integer grid around
floor(coords) and the Python wrapper blends it bilinearly to (2R+1)^2; here
the gather and blend are expressed directly in XLA (differentiable — the
scatter-add backward comes for free from gather's transpose).

Feature maps are NHWC (TPU-native): fmap (N, H, W, C).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_patches(fmap: jnp.ndarray, coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Bilinearly extract (2r+1)x(2r+1) patches at fractional coords.

    Args:
      fmap:   (N, H, W, C) feature maps.
      coords: (N, M, 2) [x, y] patch centers (fractional, feature resolution).
      radius: patch radius r.

    Returns:
      (N, M, 2r+1, 2r+1, C) patches; out-of-bounds taps read as 0, matching
      the CUDA kernel's `within_bounds` guard.
    """
    N, H, W, C = fmap.shape
    M = coords.shape[1]
    D = 2 * radius + 2

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = (x - x0).astype(fmap.dtype)[..., None, None, None]
    dy = (y - y0).astype(fmap.dtype)[..., None, None, None]

    off = jnp.arange(D, dtype=jnp.int32) - radius
    iy = y0[..., None, None] + off[None, None, :, None]   # (N, M, D, 1)
    ix = x0[..., None, None] + off[None, None, None, :]   # (N, M, 1, D)
    iy = jnp.broadcast_to(iy, (N, M, D, D))
    ix = jnp.broadcast_to(ix, (N, M, D, D))
    inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    flat_idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)

    flat = fmap.reshape(N, H * W, C)
    gathered = jax.vmap(lambda f, i: f[i])(flat, flat_idx.reshape(N, -1))
    grid = gathered.reshape(N, M, D, D, C)
    grid = jnp.where(inb[..., None], grid, 0.0)

    d = 2 * radius + 1
    out = (
        (1 - dy) * (1 - dx) * grid[:, :, :d, :d]
        + (1 - dy) * dx * grid[:, :, :d, 1:]
        + dy * (1 - dx) * grid[:, :, 1:, :d]
        + dy * dx * grid[:, :, 1:, 1:]
    )
    return out


def coords_grid_with_index(disps: jnp.ndarray) -> jnp.ndarray:
    """Per-frame (x, y, disp) grids (devo/utils.py:38-59), NHWC-style.

    disps: (N, H, W) -> (N, H, W, 3) with channels [x, y, d].
    """
    N, H, W = disps.shape
    x = jnp.arange(W, dtype=disps.dtype)
    y = jnp.arange(H, dtype=disps.dtype)
    xg = jnp.broadcast_to(x[None, None, :], (N, H, W))
    yg = jnp.broadcast_to(y[None, :, None], (N, H, W))
    return jnp.stack([xg, yg, disps], axis=-1)
