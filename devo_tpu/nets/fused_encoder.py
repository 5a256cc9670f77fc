"""Block-diagonal fused fnet+inet encoder forward.

The matching and context encoders (BasicEncoder4Evs, extractor.py:269-335
in the reference) share one architecture and differ only in norm (instance
vs none) and output width (128 vs 384). Run separately, every stage-1
intermediate is a (H/2, W/2, 32) tensor whose 32 channels pad to 128 TPU
lanes — 4x wasted bandwidth on each of ~10 full-frame tensors, twice.
This module evaluates BOTH encoders as ONE network whose conv kernels are
block-diagonal concatenations of the two parameter sets: the fused
intermediates carry 64 (stage 1) / 128 (stage 2) channels, halving (stage
1) or eliminating (stage 2) the lane padding, and halving the op count.

Exactness: conv of channel-concatenated inputs with block-diagonal kernels
equals the channel-concatenation of the two convs (cross blocks are exact
zeros in any dtype); instance norm is per-channel, applied to the fnet
half only via a lane mask. Verified against the flax modules in
tests/test_fused_encoder.py.

Params are the UNMODIFIED flax trees of patchify.fnet / patchify.inet —
checkpoint import (utils/torch_import.py) is untouched; the block-diagonal
kernels are assembled at trace time (a few KB of concats per step).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5          # torch InstanceNorm2d default, encoder.make_norm


def _blockdiag(wf, wi):
    """(kh, kw, Cf_in, Cf_out) + (kh, kw, Ci_in, Ci_out) block-diagonal
    -> (kh, kw, Cf_in + Ci_in, Cf_out + Ci_out)."""
    kh, kw, cfi, cfo = wf.shape
    _, _, cii, cio = wi.shape
    top = jnp.concatenate([wf, jnp.zeros((kh, kw, cfi, cio), wf.dtype)], 3)
    bot = jnp.concatenate([jnp.zeros((kh, kw, cii, cfo), wi.dtype), wi], 3)
    return jnp.concatenate([top, bot], 2)


def _conv(x, pf, pi, stride, pad, dtype):
    w = _blockdiag(pf["kernel"], pi["kernel"]).astype(dtype)
    b = jnp.concatenate([pf["bias"], pi["bias"]]).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _inorm_fnet_half(y, cf: int):
    """Instance norm (per-sample per-channel spatial stats, no affine) on
    channels [0, cf); identity on the rest — one fused multiply-add, no
    channel split/concat. Stats in f32 (flax GroupNorm does the same)."""
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2), keepdims=True)          # (n,1,1,C)
    var = jnp.mean(jnp.square(y32), axis=(1, 2), keepdims=True) - mean ** 2
    isf = jnp.arange(y.shape[-1]) < cf
    scale = jnp.where(isf, jax.lax.rsqrt(var + EPS), 1.0)
    shift = jnp.where(isf, -mean * jax.lax.rsqrt(var + EPS), 0.0)
    return (y32 * scale + shift).astype(y.dtype)


def _resblock(x, pf, pi, cf_out: int, stride: int, dtype):
    """Fused ResidualBlock (encoder.py:33-60): fnet half instance-normed,
    inet half norm-free."""
    y = _conv(x, pf["conv1"], pi["conv1"], stride, 1, dtype)
    y = _inorm_fnet_half(y, cf_out)                            # norm1
    y = jax.nn.relu(y)
    y = _conv(y, pf["conv2"], pi["conv2"], 1, 1, dtype)
    y = _inorm_fnet_half(y, cf_out)                            # norm2
    y = jax.nn.relu(y)
    if "downsample" in pf:
        x = _conv(x, pf["downsample"], pi["downsample"], stride, 0, dtype)
        x = _inorm_fnet_half(x, cf_out)                        # norm3
    return jax.nn.relu(x + y)


def fused_encode(params_fnet, params_inet, voxels,
                 dtype=jnp.float32):
    """(n, H, W, bins) -> (fmap (n, H/4, W/4, 128), imap (..., 384)):
    both encoders in one block-diagonal pass. Param trees are the flax
    BasicEncoder4Evs trees (fnet norm_fn='instance', inet 'none')."""
    pf, pi = params_fnet, params_inet
    dim = pf["conv1"]["kernel"].shape[-1]          # 32

    # conv1 reads the SAME voxel input in both branches: concatenate on the
    # output dim only (block-diagonal starts from the first intermediate)
    w1 = jnp.concatenate([pf["conv1"]["kernel"],
                          pi["conv1"]["kernel"]], 3).astype(dtype)
    b1 = jnp.concatenate([pf["conv1"]["bias"],
                          pi["conv1"]["bias"]]).astype(dtype)
    x = jax.lax.conv_general_dilated(
        voxels.astype(dtype), w1, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    x = _inorm_fnet_half(x, dim)                   # fnet norm1
    x = jax.nn.relu(x)

    x = _resblock(x, pf["layer1_0"], pi["layer1_0"], dim, 1, dtype)
    x = _resblock(x, pf["layer1_1"], pi["layer1_1"], dim, 1, dtype)
    x = _resblock(x, pf["layer2_0"], pi["layer2_0"], 2 * dim, 2, dtype)
    x = _resblock(x, pf["layer2_1"], pi["layer2_1"], 2 * dim, 1, dtype)

    out = _conv(x, pf["conv2"], pi["conv2"], 1, 0, dtype)
    cfo = pf["conv2"]["kernel"].shape[-1]          # 128
    return out[..., :cfo], out[..., cfo:]
