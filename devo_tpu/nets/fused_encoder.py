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


# ---------------------------------------------------------------- s2d stage 1
# Space-to-depth(2) evaluation of conv1 + the stage-1 residual blocks: the
# (H/2, W/2, 64) intermediates pad their 64 channels to 128 TPU lanes (2x
# wasted bandwidth even fused, plus a measured 0.29 ms im2col relayout of
# the raw input for conv1 — profile r05). In block space every stage-1
# tensor is (H/4, W/4, 256): exact lanes, conv1 reads the raw image with a
# stride-4 entry kernel (no explicit reshape), and stride-2 layer2_0
# consumes the 2x2 blocks exactly (exit kernels), so the layout never
# needs an un-s2d relayout. The 3x3/s1 block-space kernels do 4x the taps
# (2-block window covers 6 rows for the 3 needed) — trading idle-MXU FLOPs
# for bandwidth, same as the scorer rewrite. Engine A/B in PERF_NOTES r05.


def _layer1_scatter(K: int = 3) -> "np.ndarray":
    """S[by,bx,py,px,qy,qx,dy,dx] for a 3x3/s1 conv in s2d(2) space:
    dy = 2*(by - 1) + py - qy + 1 (conv padding 1 block on each side)."""
    import numpy as np
    S = np.zeros((3, 3, 2, 2, 2, 2, K, K), np.float32)
    for by in range(3):
        for py in range(2):
            for qy in range(2):
                dy = 2 * by + py - qy - 1
                if not (0 <= dy < K):
                    continue
                for bx in range(3):
                    for px in range(2):
                        for qx in range(2):
                            dx = 2 * bx + px - qx - 1
                            if 0 <= dx < K:
                                S[by, bx, py, px, qy, qx, dy, dx] = 1.0
    return S


def _exit_scatter(K: int = 3) -> "np.ndarray":
    """S[u,v,py,px,dy,dx] for a stride-2 conv consuming s2d(2) input and
    emitting standard layout: dy = 2*u + py - 1 (kernel 2 blocks, padding
    (1, 0))."""
    import numpy as np
    S = np.zeros((2, 2, 2, 2, K, K), np.float32)
    for u in range(2):
        for py in range(2):
            dy = 2 * u + py - 1
            if not (0 <= dy < K):
                continue
            for v in range(2):
                for px in range(2):
                    dx = 2 * v + px - 1
                    if 0 <= dx < K:
                        S[u, v, py, px, dy, dx] = 1.0
    return S


def _bias4(b, dtype):
    """(C,) -> (4C,) in (qy, qx, c) channel order."""
    return jnp.broadcast_to(b, (4, b.shape[0])).reshape(-1).astype(dtype)


def _l1_kernel(pf, pi, dtype):
    import numpy as np
    w = _blockdiag(pf["kernel"], pi["kernel"])         # (3,3,Cf,Cf) fused
    S = jnp.asarray(_layer1_scatter())
    k2 = jnp.einsum("ABpPqQde,deio->ABpPiqQo", S, w)
    ci, co = w.shape[2], w.shape[3]
    return k2.reshape(3, 3, 4 * ci, 4 * co).astype(dtype)


def _exit_kernel(pf, pi, dtype, k: int):
    w = _blockdiag(pf["kernel"], pi["kernel"])         # (k,k,Ci,Co)
    if k == 1:                                          # 1x1/s2: pos (0,0)
        ci, co = w.shape[2], w.shape[3]
        z = jnp.zeros((1, 1, ci, co), w.dtype)
        top = jnp.concatenate([w, z, z, z], 2)          # (py,px)=(0,0) only
        return top.reshape(1, 1, 4 * ci, co).astype(dtype)
    S = jnp.asarray(_exit_scatter(k))
    k2 = jnp.einsum("UVpPde,deio->UVpPio", S, w)
    ci, co = w.shape[2], w.shape[3]
    return k2.reshape(2, 2, 4 * ci, co).astype(dtype)


def _inorm_fnet_half_s2d(y, cf: int, cg: int):
    """Instance norm of the fnet half in (pos, c) channel layout: stats per
    ORIGINAL channel pool over spatial x the 4 block positions. Static
    slices + concat only (a (.., 4, cg) reshape of the lane dim relayouts)."""
    npos = y.shape[-1] // cg
    y32 = y.astype(jnp.float32)
    parts = [y32[..., i * cg:(i + 1) * cg] for i in range(npos)]
    m1 = sum(jnp.mean(p, axis=(1, 2), keepdims=True) for p in parts) / npos
    m2 = sum(jnp.mean(jnp.square(p), axis=(1, 2), keepdims=True)
             for p in parts) / npos
    var = m2 - m1 ** 2
    isf = jnp.arange(cg) < cf
    inv = jax.lax.rsqrt(var + EPS)
    scale = jnp.where(isf, inv, 1.0)
    shift = jnp.where(isf, -m1 * inv, 0.0)
    scale = jnp.concatenate([scale] * npos, -1)
    shift = jnp.concatenate([shift] * npos, -1)
    return (y32 * scale + shift).astype(y.dtype)


def fused_encode_s2d(params_fnet, params_inet, voxels, dtype=jnp.float32):
    """fused_encode with stage 1 evaluated in space-to-depth(2) layout.
    Identical function (golden-tested vs fused_encode in
    tests/test_fused_encoder.py); see the block comment above."""
    from .scorer_s2d import entry_block_kernel

    pf, pi = params_fnet, params_inet
    dim = pf["conv1"]["kernel"].shape[-1]              # 32
    cg = 2 * dim                                       # fused stage-1 width

    # conv1 as a stride-4 entry conv: raw image -> s2d(2) of (H/2, W/2, cg)
    w1 = jnp.concatenate([pf["conv1"]["kernel"],
                          pi["conv1"]["kernel"]], 3)
    w1e = entry_block_kernel(w1, block=4, stride=2, dtype=dtype)  # (9,9,5,4cg)
    b1 = jnp.concatenate([pf["conv1"]["bias"], pi["conv1"]["bias"]])
    x = jax.lax.conv_general_dilated(
        voxels.astype(dtype), w1e, (4, 4), [(3, 2), (3, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + _bias4(b1, dtype)
    x = _inorm_fnet_half_s2d(x, dim, cg)               # fnet norm1
    x = jax.nn.relu(x)

    # stage-1 residual blocks in block space (no downsample branch: stride
    # 1, channels equal — encoder.py:54 never fires for layer1)
    for name in ("layer1_0", "layer1_1"):
        lf, li = pf[name], pi[name]
        y = jax.lax.conv_general_dilated(
            x, _l1_kernel(lf["conv1"], li["conv1"], dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + _bias4(jnp.concatenate([lf["conv1"]["bias"],
                                        li["conv1"]["bias"]]), dtype)
        y = jax.nn.relu(_inorm_fnet_half_s2d(y, dim, cg))
        y = jax.lax.conv_general_dilated(
            y, _l1_kernel(lf["conv2"], li["conv2"], dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + _bias4(jnp.concatenate([lf["conv2"]["bias"],
                                        li["conv2"]["bias"]]), dtype)
        y = jax.nn.relu(_inorm_fnet_half_s2d(y, dim, cg))
        x = jax.nn.relu(x + y)

    # layer2_0: stride-2 exit convs collapse the blocks to standard layout
    lf, li = pf["layer2_0"], pi["layer2_0"]
    y = jax.lax.conv_general_dilated(
        x, _exit_kernel(lf["conv1"], li["conv1"], dtype, 3), (1, 1),
        [(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.concatenate([lf["conv1"]["bias"],
                             li["conv1"]["bias"]]).astype(dtype)
    y = jax.nn.relu(_inorm_fnet_half(y, 2 * dim))      # norm1
    y = _conv(y, lf["conv2"], li["conv2"], 1, 1, dtype)
    y = jax.nn.relu(_inorm_fnet_half(y, 2 * dim))      # norm2
    xd = jax.lax.conv_general_dilated(
        x, _exit_kernel(lf["downsample"], li["downsample"], dtype, 1),
        (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xd = xd + jnp.concatenate([lf["downsample"]["bias"],
                               li["downsample"]["bias"]]).astype(dtype)
    xd = _inorm_fnet_half(xd, 2 * dim)                 # norm3
    x = jax.nn.relu(xd + y)

    x = _resblock(x, pf["layer2_1"], pi["layer2_1"], 2 * dim, 1, dtype)
    out = _conv(x, pf["conv2"], pi["conv2"], 1, 0, dtype)
    cfo = pf["conv2"]["kernel"].shape[-1]              # 128
    return out[..., :cfo], out[..., cfo:]


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
