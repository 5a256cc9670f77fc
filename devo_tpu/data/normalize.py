"""Event-voxel normalization, on device.

JAX counterpart of /root/reference/utils/voxel_utils.py (std / rescale) and
the inference-time normalization block in devo/devo.py:420-457. Shapes are
(..., bins, H, W) or any layout — statistics are taken over the trailing
`axes` collapsed set, matching the reference's sequence-wise vs voxel-wise
flattening.
"""
from __future__ import annotations

import jax.numpy as jnp


def std_normalize(vox: jnp.ndarray, axes=None) -> jnp.ndarray:
    """Standardize over the *nonzero* elements (voxel_utils.py:6-29).

    axes=None -> statistics over the whole array (sequence-wise); otherwise a
    tuple of axes to reduce (e.g. per-frame: all but the leading frame axis).
    If a reduction group has no events it is left untouched (reference skips
    normalization when any frame is empty).
    """
    if axes is None:
        axes = tuple(range(vox.ndim))
    nonzero = vox != 0.0
    num = jnp.sum(nonzero, axis=axes, keepdims=True).astype(jnp.float32)
    safe = jnp.maximum(num, 1.0)
    mean = jnp.sum(vox, axis=axes, keepdims=True, dtype=jnp.float32) / safe
    var = jnp.sum(vox**2, axis=axes, keepdims=True, dtype=jnp.float32) / safe - mean**2
    stddev = jnp.sqrt(jnp.maximum(var, 1e-12))
    out = jnp.where(nonzero, (vox - mean) / stddev, 0.0)
    return jnp.where(num > 0, out, vox).astype(vox.dtype)


def rescale_normalize(vox: jnp.ndarray, axes=None) -> jnp.ndarray:
    """Scale positive events into (0,1], negative into [-1,0)
    (voxel_utils.py:31-53)."""
    if axes is None:
        axes = tuple(range(vox.ndim))
    pos = vox > 0
    neg = vox < 0
    vx_max = jnp.max(jnp.where(pos, vox, 0.0), axis=axes, keepdims=True)
    vx_min = jnp.min(jnp.where(neg, vox, 0.0), axis=axes, keepdims=True)
    vx_max = jnp.where(vx_max > 0, vx_max, 1e-5)
    vx_min = jnp.where(vx_min < 0, vx_min, -1e-5)
    out = jnp.where(pos, vox / vx_max, jnp.where(neg, vox / -vx_min, vox))
    return out.astype(vox.dtype)


def normalize(vox: jnp.ndarray, mode: str, axes=None) -> jnp.ndarray:
    mode = mode.lower()
    if mode == "none":
        return vox
    if mode in ("rescale", "norm"):
        return rescale_normalize(vox, axes)
    if mode in ("standard", "std", "standard2", "std2"):
        return std_normalize(vox, axes)
    raise NotImplementedError(mode)
