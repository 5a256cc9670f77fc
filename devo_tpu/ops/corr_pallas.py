"""Pallas TPU kernel for edge-indexed sparse patch correlation.

Drop-in accelerator for ops/corr.py. The XLA fallback gathers
E x P^2 x (2r+2)^2 feature rows from HBM (~9 GB per level per update at full
edge capacity — bandwidth-bound at gather speed). This kernel keeps the
target feature map **resident in VMEM** (zero-padded so off-image taps read
exact zeros) and, per edge:

  1. slices one 16 x 16 x C window covering every patch pixel's 8x8 tap
     grid (3-D VMEM layout: Mosaic allows unaligned dynamic offsets on the
     major and sublane dims, unlike 2-D sublane slicing);
  2. computes all window-pixel x patch-pixel dot products as one MXU matmul
         R = W (256, C) @ G^T (C, 16)  ->  staged as (16, 16, 16) [y, x, p];
  3. extracts each pixel's 8x8 integer tap block with dynamic-offset slices
     and emits them lane-concatenated as an (8, 72) row — the bilinear blend
     happens outside in XLA with static lane selections (cheap shuffles).

Edges are pre-grouped by target frame slot with a scatter-free counting
rank, each group padded to the edge-block size, so the frame HBM->VMEM DMA
fires at most `mem` times across the whole grid. HBM traffic per level drops
to mem x frame + O(E) inputs/outputs (~0.5 GB).

Window coverage: each patch's tap grids must fit the 16x16 window anchored
at its min tap corner — holds unless projective distortion spreads a P x P
patch by > 8 px, in which case the farthest taps clamp into the window
(such edges are residual-gated in BA anyway).

Reference semantics: correlation_kernel.cu:83-136 (integer tap grid),
:221-232 (bilinear blend + x-major output ordering).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 16          # window rows (covers 8x8 taps + patch spread)
WINX = 24         # window cols: 16 + up to 7 for sublane alignment of x0
PAD = 12          # zero border so off-image taps read zeros exactly
BE = 64           # edges per grid step (amortizes ~18us per-step overhead)


def _kernel(slot_ref, y0_ref, x0_ref, ry_ref, rx_ref,
            gmap_ref, fmap_hbm, out_ref, fmap_vmem, r_scratch, prev_slot, sem,
            *, C: int, PP: int):
    b = pl.program_id(0)
    slot = slot_ref[b]

    @pl.when((b == 0) | (slot != prev_slot[0]))
    def _():
        cp = pltpu.make_async_copy(fmap_hbm.at[slot], fmap_vmem, sem)
        cp.start()
        cp.wait()
        prev_slot[0] = slot

    def edge_body(e, _):
        # dim0 (rows) is the major dim of the 3-D VMEM layout -> arbitrary
        # dynamic offset; dim1 (cols) is the sublane dim -> Mosaic demands a
        # provably 8-aligned start, so x0 arrives pre-aligned (x-window is
        # widened to 24 and the residual offset is resolved in the XLA blend)
        x0 = pl.multiple_of(x0_ref[e, 0] * 8, 8)
        win = fmap_vmem[pl.ds(y0_ref[e, 0], WIN), pl.ds(x0, WINX), :]
        win2 = win.reshape(WIN * WINX, C)
        g = gmap_ref[e]                                  # (16, C)
        R = jax.lax.dot_general(
            win2, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (384, 16)
        r_scratch[:, :WINX, :] = R.reshape(WIN, WINX, 16)  # [y, x, pixel]

        parts = []
        for p in range(PP):
            rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
            parts.append(
                r_scratch[pl.ds(ry_ref[e, p], 8), pl.ds(rx8, 16), p])
        out_ref[e] = jnp.concatenate(parts, axis=1)      # (8, 16*PP)
        return 0

    # fori_loop (not Python unroll) so only one edge's temporaries are live
    # in VMEM at a time — unrolling BE=64 blows the scoped-VMEM budget
    jax.lax.fori_loop(0, BE, edge_body, 0)


def corr_level_pallas(
    gmap: jnp.ndarray,    # (Mring, P, P, C)
    fmap: jnp.ndarray,    # (mem, H, W, C)
    coords: jnp.ndarray,  # (E, P, P, 2) at this level's resolution
    kk: jnp.ndarray,      # (E,) ring patch index
    jj: jnp.ndarray,      # (E,) ring frame slot
    mask: jnp.ndarray,    # (E,) bool
    radius: int = 3,
) -> jnp.ndarray:
    """Returns (E, 441) correlation ordered [dx, dy, pixel] (one level)."""
    assert radius == 3, "window constants assume r = 3"
    mem, H, W, C = fmap.shape
    E, P = coords.shape[0], coords.shape[1]
    PP = P * P
    R = radius

    x = coords[..., 0].reshape(E, PP).astype(jnp.float32)
    y = coords[..., 1].reshape(E, PP).astype(jnp.float32)
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    fx = (x - xf).astype(jnp.float32)
    fy = (y - yf).astype(jnp.float32)
    xf = xf.astype(jnp.int32)
    yf = yf.astype(jnp.int32)

    Hp, Wp = H + 2 * PAD, W + 2 * PAD
    x0 = jnp.clip(jnp.min(xf, axis=1) - R + PAD, 0, Wp - WINX)
    x0 = (x0 // 8) * 8   # sublane alignment (kernel re-multiplies by 8)
    y0 = jnp.clip(jnp.min(yf, axis=1) - R + PAD, 0, Hp - WIN)
    rx = jnp.clip(xf - R + PAD - x0[:, None], 0, WINX - 9)
    ry = jnp.clip(yf - R + PAD - y0[:, None], 0, WIN - 8)
    rx8 = (rx // 8)      # aligned strip start / 8 (kernel re-multiplies)
    rxo = rx - rx8 * 8   # residual offset inside the strip, in [0, 8)

    # ---- group by frame slot: scatter-free counting rank
    slot_key = jnp.where(mask, jj.astype(jnp.int32), mem)
    nb = mem + 1
    oh = (slot_key[None, :] == jnp.arange(nb)[:, None]).astype(jnp.int32)
    counts = oh.sum(axis=1)                                  # (nb,)
    rank = (jnp.cumsum(oh, axis=1) - 1)[slot_key, jnp.arange(E)]
    padded = ((counts + BE - 1) // BE) * BE
    pstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    EP = E + nb * BE
    dest = pstart[slot_key] + rank                           # (E,) injective
    src = jnp.zeros((EP,), jnp.int32).at[dest].set(
        jnp.arange(E, dtype=jnp.int32), mode="drop")
    q = jnp.arange(EP, dtype=jnp.int32)
    grp = jnp.searchsorted(pstart, q, side="right").astype(jnp.int32) - 1
    grp_c = jnp.clip(grp, 0, nb - 1)
    live = (q - pstart[grp_c] < counts[grp_c]) & (grp < mem)

    gm = gmap.reshape(-1, PP, C)[kk[src]]
    gm = jnp.pad(gm, ((0, 0), (0, 16 - PP), (0, 0))).astype(jnp.bfloat16)
    y0g = jnp.where(live, y0[src], 0).astype(jnp.int32)[:, None]
    x0g = jnp.where(live, x0[src] // 8, 0).astype(jnp.int32)[:, None]
    ryg = jnp.pad(ry[src], ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    rxg = jnp.pad(rx8[src], ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    block_slot = jnp.clip(grp[::BE], 0, mem - 1).astype(jnp.int32)

    fmap_padded = jnp.pad(
        fmap.astype(jnp.bfloat16), ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))

    nblocks = EP // BE
    bspec_vmem = lambda shape: pl.BlockSpec(
        shape, lambda b, *_: tuple([b] + [0] * (len(shape) - 1)),
        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            # NB: offsets ride in VMEM, not SMEM — Mosaic's alignment prover
            # rejects SMEM-sourced scalars as dynamic sublane slice offsets,
            # but accepts the same values read out of vector lanes.
            bspec_vmem((BE, 1)),          # y0
            bspec_vmem((BE, 1)),          # x0
            bspec_vmem((BE, 16)),         # ry
            bspec_vmem((BE, 16)),         # rx
            pl.BlockSpec((BE, 16, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # gmap
            pl.BlockSpec(memory_space=pl.ANY),       # fmap (HBM)
        ],
        out_specs=pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hp, Wp, C), jnp.bfloat16),
            pltpu.VMEM((WIN, WINX + 8, 16), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, C=C, PP=PP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
    )(block_slot, y0g, x0g, ryg, rxg, gm, fmap_padded)

    # ---- bilinear blend in XLA (shared with ops/corr.corr_window)
    from .corr import blend_strips
    res = out[dest]                                   # (E, 8, 16*PP)
    return blend_strips(res, fx, fy, rxo, mask, PP)


def corr_pyramid_pallas(gmap, pyramid, coords, kk, jj, mask, radius=3,
                        levels=(1, 4)):
    """Two-level pyramid with the Pallas kernel; output ordering matches
    ops/corr.corr_pyramid ([dx, dy, pixel, level])."""
    E = coords.shape[0]
    outs = [
        corr_level_pallas(gmap, fm, coords / lvl, kk, jj, mask, radius=radius)
        for fm, lvl in zip(pyramid, levels)
    ]
    return jnp.stack(outs, axis=-1).reshape(E, -1)
