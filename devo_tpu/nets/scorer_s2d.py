"""Space-to-depth scorer forward: the 4-conv score CNN on TPU-native layout.

The reference scorer (/root/reference/devo/selector.py:19-47) is four
VALID-padded 3x3 convs (bins->8->16->32->1) at FULL resolution followed by
a 4x4 max pool. On TPU every full-resolution intermediate pads its tiny
channel count to 128 vector lanes, so the stack is bandwidth-bound on
padded bytes (measured ~1.4 ms/frame of the engine step at 480x640 plus
~0.4 ms of layout copies, PERF_NOTES r04/r05).

This module computes the IDENTICAL function in space-to-depth(4) layout:
the image becomes an (H/4, W/4) grid of 4x4 blocks with 16*C channels, and
each 3x3/s1 conv becomes one 2x2 block-space conv whose kernel is a sparse
rearrangement of the original 3x3 weights (output channel (qy,qx,co) takes
input channel (py,px,ci) with weight W[dy,dx,ci,co] iff (4*by+py) -
(qy+dy) == 0 for a tap offset dy in [0,3), same in x). Channel counts
become 80 -> 128 -> 256 -> 512 -> 16: every intermediate fills the 128
lanes exactly, eliminating the padding. The arithmetic is ~7x the taps
(each output position reads all 64 pixels of a 2x2 block neighborhood, 49
of the 64 weights are zero) but it runs on the otherwise-idle MXU instead
of thrashing HBM.

Exactness: the input is zero-padded by 8 rows/cols before the block
reshape so every block-space conv keeps full blocks; garbage values from
the padding only ever reach full-resolution rows/cols that the reference's
VALID cropping discards (and they are finite, so zero weights annihilate
them). The final 4x4 max pool is exactly the max over the 16 position
channels of the last conv, because pool windows are block-aligned. Golden
test: tests/test_scorer_s2d.py (bitwise-tolerance vs nets/encoder.Scorer).

Parameters are the UNMODIFIED flax Scorer tree (patchify.scorer.scorer_*);
the block-space kernels are assembled at trace time from a constant 0/1
scatter tensor (a few KB), so checkpoint import is untouched.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _scatter_const(B: int = 4, K: int = 3) -> np.ndarray:
    """S[by,bx,py,px,qy,qx,dy,dx] = 1 iff the full-res tap (qy+dy, qx+dx)
    of output position (qy,qx) lands at position (py,px) of block offset
    (by,bx): 4*by + py == qy + dy (and same in x)."""
    S = np.zeros((2, 2, B, B, B, B, K, K), np.float32)
    for by in range(2):
        for py in range(B):
            for qy in range(B):
                dy = B * by + py - qy
                if not (0 <= dy < K):
                    continue
                for bx in range(2):
                    for px in range(B):
                        for qx in range(B):
                            dx = B * bx + px - qx
                            if 0 <= dx < K:
                                S[by, bx, py, px, qy, qx, dy, dx] = 1.0
    return S


_S = _scatter_const()


def _entry_scatter_const(block: int, stride: int, k: int) -> np.ndarray:
    """S[u,v,qy,qx,dy,dx] for the ENTRY conv that reads the RAW image and
    emits block layout directly: one stride-`block` conv whose kernel spans
    K2 = block - stride + k rows, where output position q (a stride-`stride`
    pixel within the block) takes original tap d at kernel row
    u = stride*q + d. Folding the space-to-depth transform into the first
    conv this way deletes the explicit reshape+transpose relayout
    (measured 0.27 ms/frame for the scorer's input, PERF_NOTES r05)."""
    nq = block // stride
    K2 = block - stride + k
    S = np.zeros((K2, K2, nq, nq, k, k), np.float32)
    for qy in range(nq):
        for dy in range(k):
            for qx in range(nq):
                for dx in range(k):
                    S[stride * qy + dy, stride * qx + dx,
                      qy, qx, dy, dx] = 1.0
    return S


def entry_block_kernel(w: jnp.ndarray, block: int, stride: int,
                       dtype) -> jnp.ndarray:
    """(k,k,Ci,Co) kernel of a stride-`stride` conv -> (K2,K2,Ci,nq*nq*Co)
    kernel of a stride-`block` conv on the raw image whose output channel
    order is (qy, qx, co) — i.e. the space-to-depth(block//stride) layout
    of the original output."""
    k, _, ci, co = w.shape
    S = jnp.asarray(_entry_scatter_const(block, stride, k))
    k2 = jnp.einsum("UVqQde,deio->UViqQo", S, w)
    nq = block // stride
    return k2.reshape(S.shape[0], S.shape[0], ci, nq * nq * co).astype(dtype)


def _block_kernel(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """(3,3,Ci,Co) full-res kernel -> (2,2,16*Ci,16*Co) block-space kernel
    with channel order (py,px,ci) / (qy,qx,co)."""
    ci, co = w.shape[2], w.shape[3]
    k2 = jnp.einsum("ABpPqQde,deio->ABpPiqQo", jnp.asarray(_S), w)
    return k2.reshape(2, 2, 16 * ci, 16 * co).astype(dtype)


def _block_bias(b: jnp.ndarray, dtype) -> jnp.ndarray:
    return jnp.broadcast_to(b, (16, b.shape[0])).reshape(-1).astype(dtype)


def scorer_s2d_forward(params, voxels: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Exact Scorer forward (nets/encoder.Scorer incl. its 4x4 max pool) in
    space-to-depth layout. params = the flax Scorer param tree
    {scorer_0, scorer_2, scorer_4, scorer_6: {kernel, bias}}.

    voxels (n, H, W, bins) with H, W % 4 == 0 -> scores (n, (H-8)//4,
    (W-8)//4) in f32, matching Scorer.__call__ output.
    """
    n, H, W, C = voxels.shape
    if H % 4 or W % 4:
        raise ValueError(f"scorer_s2d needs H, W % 4 == 0, got {H}x{W}")
    x = voxels.astype(dtype)
    # ENTRY conv: stage 1 as a stride-4 conv on the RAW image emitting the
    # block layout directly (no explicit space-to-depth relayout, which
    # measured 0.27 ms/frame). 6 zero rows/cols of bottom/right padding
    # keep all blocks full; the values they pollute are exactly the
    # rows/cols VALID cropping discards (see the module docstring for the
    # propagation argument).
    x = jnp.pad(x, ((0, 0), (0, 6), (0, 6), (0, 0)))
    p0 = params["scorer_0"]
    w0 = entry_block_kernel(p0["kernel"], block=4, stride=1, dtype=dtype)
    x = jax.lax.conv_general_dilated(
        x, w0, (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (n, H/4+1, W/4+1, 128)
    x = jax.nn.relu(x + _block_bias(p0["bias"], dtype))

    for name, act in (("scorer_2", True), ("scorer_4", True),
                      ("scorer_6", False)):
        p = params[name]
        w2 = _block_kernel(p["kernel"], dtype)
        x = jax.lax.conv_general_dilated(
            x, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + _block_bias(p["bias"], dtype)
        if act:
            x = jax.nn.relu(x)

    # final conv has Co=1: the 16 channels are the 16 positions of each
    # block = one aligned 4x4 max-pool window (selector.py:46)
    return jnp.max(x, axis=-1).astype(jnp.float32)
