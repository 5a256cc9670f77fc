"""Event-voxel random augmentation ("randaug"), on device.

JAX counterpart of /root/reference/utils/voxel_utils.py:55-137
(`voxel_augment`): the reference maps each voxel slice to a fake RGB image
(R = -neg events, G = 0, B = pos events), quantizes to uint8, applies one
randomly chosen torchvision image op (brightness / contrast / invert /
posterize / saturation / sharpness / solarize) at a random strength bin,
maps back to a signed voxel, and re-standardizes.

Here the whole pipeline is pure JAX (elementwise math + one 3x3 conv for
sharpness), so it runs inside the jitted training step with the op choice as
a `lax.switch` — no host round-trip. uint8 semantics (truncating casts,
clamp bounds) follow torchvision's tensor backend so trained behavior
matches; exact bit parity is untestable here (no torchvision in the image)
and irrelevant to training statistics.

Input layout is (..., H, W, bins) channel-last (frames x bins fold into the
batch); the reference's is (b, n, bins, H, W) — same math per 2-D slice.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .normalize import rescale_normalize, std_normalize

NUM_BINS = 10  # factor bins (voxel_utils.py:104)


def _to_rgb_u8(vox: jnp.ndarray) -> jnp.ndarray:
    """evs2rgb + uint8 quantization (voxel_utils.py:55-66, 79-81).

    vox in [-1, 1] -> (..., 3) uint8 stack [R=neg, G=0, B=pos] (as floats
    holding integer values, to keep the op math in one dtype)."""
    pos = jnp.clip(vox, 0.0, 1.0)
    neg = jnp.clip(-vox, 0.0, 1.0)
    rgb = jnp.stack([neg, jnp.zeros_like(vox), pos], axis=-1)
    return jnp.floor(255.0 * rgb)  # .to(uint8) truncates


def _from_rgb_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 round-trip + rgb2evs (voxel_utils.py:69-73, 91-95)."""
    rgb = rgb / 255.0
    return rgb[..., 2] - rgb[..., 0]


def _gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """torchvision rgb_to_grayscale on uint8 (truncating cast)."""
    return jnp.floor(0.2989 * rgb[..., 0] + 0.587 * rgb[..., 1]
                     + 0.114 * rgb[..., 2])


def _blend(img1: jnp.ndarray, img2: jnp.ndarray, ratio) -> jnp.ndarray:
    """torchvision _blend for uint8: clamp then truncate."""
    return jnp.floor(jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 255.0))


def _brightness(rgb, factor):
    return _blend(rgb, jnp.zeros_like(rgb), factor)


def _contrast(rgb, factor):
    # mean over the image's H, W (per (frame, bin) slice); rgb is
    # (..., H, W, 3) so reduce the two spatial axes
    mean = jnp.mean(_gray(rgb), axis=(-2, -1), keepdims=True)[..., None]
    return _blend(rgb, mean, factor)


def _invert(rgb, factor):
    return 255.0 - rgb


def _posterize(rgb, bits):
    # img & ~(2^(8-bits) - 1): zero the low (8-bits) bits
    shift = 2.0 ** (8.0 - bits)
    return jnp.floor(rgb / shift) * shift


def _saturation(rgb, factor):
    return _blend(rgb, _gray(rgb)[..., None], factor)


def _sharpness(rgb, factor):
    # blurred degenerate image: 3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13
    # applied to the interior only (borders keep the original)
    *lead, H, W, C = rgb.shape
    img = rgb.reshape(-1, H, W, C)
    k = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    kern = jnp.zeros((3, 3, C, C)).at[:, :, jnp.arange(C), jnp.arange(C)].set(
        k[:, :, None])
    blur = jax.lax.conv_general_dilated(
        img, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    blur = jnp.floor(jnp.clip(blur, 0.0, 255.0))
    out = img.at[:, 1:-1, 1:-1, :].set(
        _blend(img[:, 1:-1, 1:-1, :], blur, factor))
    return out.reshape(rgb.shape)


def _solarize(rgb, threshold):
    return jnp.where(rgb >= threshold, 255.0 - rgb, rgb)


_OPS = (_brightness, _contrast, _invert, _posterize, _saturation,
        _sharpness, _solarize)


def _factor_table() -> jnp.ndarray:
    """(7, NUM_BINS) strength table (voxel_utils.py:104-114)."""
    n = NUM_BINS
    lin = lambda a, b: jnp.linspace(a, b, n)
    return jnp.stack([
        lin(0.1, 0.2),                                        # brightness
        lin(0.05, 0.2),                                       # contrast
        jnp.zeros(n),                                         # invert (unused)
        8.0 - jnp.round(jnp.arange(n) / ((n - 1) / 4.0)),     # posterize bits
        lin(0.05, 0.2),                                       # saturation
        lin(0.9, 2.0),                                        # sharpness
        jnp.round(lin(0.0, 30.0)),                            # solarize
    ])


def voxel_augment(vox: jnp.ndarray, key: jax.Array,
                  rescaled: bool = False) -> jnp.ndarray:
    """Random single-op voxel augmentation (voxel_utils.py:117-137).

    vox: (..., H, W, bins) event voxels. Returns std-normalized voxels
    (sequence-wise), matching the reference's trailing `std(voxs)`.
    """
    if not rescaled:
        vox = rescale_normalize(vox)
    k_op, k_f = jax.random.split(key)
    op_i = jax.random.randint(k_op, (), 0, len(_OPS))
    f_i = jax.random.randint(k_f, (), 0, NUM_BINS)
    factor = _factor_table()[op_i, f_i]

    # ops work per (frame, bin) 2-D slice: move bins into the batch
    x = jnp.moveaxis(vox, -1, -3)                  # (..., bins, H, W)
    rgb = _to_rgb_u8(x)                            # (..., bins, H, W, 3)
    rgb = jax.lax.switch(op_i, list(_OPS), rgb, factor)
    x = _from_rgb_u8(rgb)
    vox = jnp.moveaxis(x, -3, -1)
    return std_normalize(vox.astype(jnp.float32))


def maybe_voxel_augment(vox: jnp.ndarray, key: jax.Array, norm: str,
                        prob: float = 0.33) -> jnp.ndarray:
    """Training-time gate (enet.py:261-269): with probability `prob`, apply
    voxel_augment; rescale-normalized inputs skip the re-rescale."""
    k_roll, k_aug = jax.random.split(key)
    do = jax.random.bernoulli(k_roll, prob)
    rescaled = norm in ("rescale", "norm")
    return jax.lax.cond(
        do, lambda v: voxel_augment(v, k_aug, rescaled=rescaled),
        lambda v: v, vox)
