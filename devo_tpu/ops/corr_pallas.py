"""Pallas TPU kernel for edge-indexed sparse patch correlation.

Drop-in accelerator for ops/corr.py (reference semantics:
correlation_kernel.cu:83-136 integer tap grid, :221-232 bilinear blend and
x-major output ordering). Measured XLA pathologies on v5e drove the design:
row gathers run at ~1-4 GB/s (5+ us/row), batched tiny matmuls at ~0.3
TFLOP/s, and any scatter/regroup preamble costs more than the kernel itself.
So this kernel processes edges in NATIVE table order with zero XLA
gathers/scatters around it:

  per edge e (BE edges per grid step, K DMAs in flight):
  1. DMA the (16, 24, C) feature window covering all of the patch's 8x8 tap
     grids straight from the padded HBM feature map (dynamic [slot, y0, x0]
     offsets from scalar-prefetch SMEM); K-deep rotation hides DMA latency
     behind compute.
  2. one MXU matmul  W (384, C) @ G_kk^T (C, 16) -> (384, 16)  computes all
     window-position x patch-pixel products; the patch features G live
     fully VMEM-resident (Mring x 16 x C bf16), indexed dynamically by kk —
     no gather.
  3. extract each pixel's 8x16 aligned tap strip with dynamic-offset slices
     over 4 ROTATING scratches (independent dependency chains overlap);
     emit (8, 16*PP) rows in native edge order.

The bilinear blend + masking stays in XLA (ops/corr.blend_strips): static
slices + an 8-way select, ~0.2 ms at full capacity.

Mosaic constraints baked in (probed, see PERF_NOTES.md): sublane-dim dynamic
slice starts must be provably 8-aligned (x offsets pre-aligned, residual
resolved in the blend); VMEM-value-derived scalars pass as slice offsets
where SMEM-sourced ones are rejected; DMA offsets may come from SMEM.

Window coverage: each patch's tap grids must fit the 16-row window anchored
at its min tap corner — holds unless projective distortion spreads a P x P
patch by > 8 px (such edges are residual-gated in BA anyway).
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
PAD = 12          # zero border so off-image taps read exact zeros
import os as _os

BE = int(_os.environ.get("DEVO_CORR_BE", "64"))
                  # edges per grid step (the split kernel's R
                  # buffer is VMEM-resident: 64 keeps it ~6 MB)
K = int(_os.environ.get("DEVO_CORR_K", "8"))
                  # window ring slots
IF = int(_os.environ.get("DEVO_CORR_IF", "4"))
                  # DMAs in flight (< K so a slot is never rewritten while
                  # the MXU may still be streaming it: K - IF edges of slack)
NSC = 4           # rotating result scratches
assert IF <= K and BE % NSC == 0, "corr pipeline knob constraint"


def _kernel(slot_ref, y0_ref, x08_ref,                    # scalar prefetch
            kk_ref, ry_ref, rx_ref,                       # per-edge VMEM
            gmap_ref, fmap_hbm,                           # full VMEM / HBM
            out_ref,
            win, r0, r1, r2, r3, sems,                    # scratch
            *, C: int, PP: int):
    scratches = (r0, r1, r2, r3)
    b = pl.program_id(0)

    def win_dma(e):
        slot = slot_ref[b * BE + e]
        y0 = y0_ref[b * BE + e]
        x0 = x08_ref[b * BE + e] * 8
        return pltpu.make_async_copy(
            fmap_hbm.at[slot, pl.ds(y0, WIN), pl.ds(x0, WINX), :],
            win.at[e % K], sems.at[e % K])

    for k in range(IF):                                   # prologue
        win_dma(k).start()

    def edge_body(e, sc):
        win_dma(e).wait()
        w2 = win[e % K].reshape(WIN * WINX, C)
        g = gmap_ref[kk_ref[e, 0]]                        # (16, C)
        R = jax.lax.dot_general(
            w2, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (384, 16)
        @pl.when(e + IF < BE)
        def _():
            win_dma(e + IF).start()
        sc[:, :WINX, :] = R.reshape(WIN, WINX, 16)        # [y, x, pixel]
        parts = []
        for p in range(PP):
            rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
            parts.append(sc[pl.ds(ry_ref[e, p], 8), pl.ds(rx8, 16), p])
        out_ref[e] = jnp.concatenate(parts, axis=1)       # (8, 16*PP)

    # NSC unrolled lanes over rotating scratches: one shared scratch would
    # serialize every edge behind its VMEM round-trip; independent chains
    # let Mosaic overlap them
    def group(i, _):
        for k in range(NSC):
            edge_body(i * NSC + k, scratches[k])
        return 0

    jax.lax.fori_loop(0, BE // NSC, group, 0)


def corr_level_pallas(
    gmap: jnp.ndarray,    # (Mring, P, P, C) patch features (ring)
    fmap: jnp.ndarray,    # (mem, H, W, C) target feature maps (ring)
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
    x08 = x0 // 8        # sublane alignment (kernel re-multiplies by 8)
    y0 = jnp.clip(jnp.min(yf, axis=1) - R + PAD, 0, Hp - WIN)
    rx = jnp.clip(xf - R + PAD - (x08 * 8)[:, None], 0, WINX - 9)
    ry = jnp.clip(yf - R + PAD - y0[:, None], 0, WIN - 8)
    rx8 = rx // 8        # aligned strip start / 8 (kernel re-multiplies)
    rxo = rx - rx8 * 8   # residual offset inside the strip, in [0, 8)

    EP = ((E + BE - 1) // BE) * BE
    padE = EP - E

    def pad0(a, val=0):
        return jnp.pad(a, [(0, padE)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=val)

    slot_g = pad0(jnp.where(mask, jj, 0).astype(jnp.int32))
    y0_g = pad0(jnp.where(mask, y0, 0).astype(jnp.int32))
    x08_g = pad0(jnp.where(mask, x08, 0).astype(jnp.int32))
    kk_g = pad0(jnp.where(mask, kk, 0).astype(jnp.int32))[:, None]
    ry_g = pad0(jnp.pad(ry, ((0, 0), (0, 16 - PP))).astype(jnp.int32))
    rx_g = pad0(jnp.pad(rx8, ((0, 0), (0, 16 - PP))).astype(jnp.int32))

    gm = jnp.pad(gmap.reshape(-1, PP, C),
                 ((0, 0), (0, 16 - PP), (0, 0))).astype(jnp.bfloat16)
    fmap_padded = jnp.pad(
        fmap.astype(jnp.bfloat16), ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(EP // BE,),
        in_specs=[
            pl.BlockSpec((BE, 1), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),        # kk
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),        # ry
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),        # rx8
            pl.BlockSpec(memory_space=pltpu.VMEM),        # gmap (resident)
            pl.BlockSpec(memory_space=pl.ANY),            # fmap (HBM)
        ],
        out_specs=pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, WIN, WINX, C), jnp.bfloat16),  # window ring
            pltpu.VMEM((WIN, WINX + 8, 16), jnp.float32),
            pltpu.VMEM((WIN, WINX + 8, 16), jnp.float32),
            pltpu.VMEM((WIN, WINX + 8, 16), jnp.float32),
            pltpu.VMEM((WIN, WINX + 8, 16), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, C=C, PP=PP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
    )(slot_g, y0_g, x08_g, kk_g, ry_g, rx_g, gm, fmap_padded)

    from .corr import blend_strips
    return blend_strips(out[:E], fx, fy, rxo, mask, PP)


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


# =========================================================================
# Banded-window kernel: one contiguous DMA per edge.
#
# The feature map is duplicated into overlapped x-bands of width BWIN at
# stride 8 (BWIN/8 x HBM), stored y-major per (slot, band): any 16-row
# window whose 8-aligned x origin falls in band b = x0/8 is ONE contiguous
# 16*BWIN*C block — a single-descriptor DMA (the strided 16-descriptor
# variant above measured 11 us/edge; contiguous restores DMA throughput).
# Because the window fetch no longer needs a VMEM-resident frame slot, the
# edges need no grouping preamble, no permutations, no output re-gather.
# A scalar-prefetched live-edge count lets whole blocks beyond the packed
# table prefix skip all work, so cost follows the LIVE edge count, not the
# bucket capacity.
#
# The per-slot pitch is STAGGERED by 3 rows (24 KB): groups of DMAs whose
# addresses are identical except the slot field (the dominant pattern —
# one patch correlated against every frame of the window) otherwise hit
# HBM at a uniform pitch that aliases the same translation/bank sets and
# run ~10000x slower (5520 ms vs 0.42 ms for the same work at E=12k,
# measured in scripts/bench_banded_ablate.py's flat-stagger probe).
# =========================================================================

BWIN = 24         # banded window x-width: strip anchors rx8*8 in {0, 8}
                  # plus 16-wide strips; rx = in-band offset(<=7) + patch
                  # spread(<=8) <= 15, so 24 covers every window (32 was
                  # 33% more DMA bytes and matmul rows for nothing)
STAGGER = 3       # extra rows per slot de-aliasing the slot pitch
SC_DTYPE = jnp.float32   # result-scratch dtype (bf16 probe: halves the
                         # dominant per-edge 128 KB scratch store)


def band_frame(fmap_hw: jnp.ndarray, pad: int = PAD) -> jnp.ndarray:
    """(H, W, C) feature frame -> (nbx*Hp + STAGGER, BWIN, C) bf16
    overlapped x-bands (flattened row-major by band) with a `pad` zero
    border (off-image taps must read exact zeros)."""
    H, W, C = fmap_hw.shape
    Hp, Wp = H + 2 * pad, W + 2 * pad
    Wp_b = ((max(Wp - BWIN, 0) + 7) // 8) * 8 + BWIN
    f = jnp.pad(fmap_hw.astype(jnp.bfloat16),
                ((pad, pad), (pad, pad + (Wp_b - Wp)), (0, 0)))
    nbx = (Wp_b - BWIN) // 8 + 1
    bands = jnp.stack([f[:, 8 * i:8 * i + BWIN, :] for i in range(nbx)], 0)
    return jnp.pad(bands.reshape(nbx * Hp, BWIN, C),
                   ((0, STAGGER), (0, 0), (0, 0)))


def banded_shape(H: int, W: int, pad: int = PAD):
    """(rows, Hp): flattened per-slot row count (stagger included) and the
    per-band height used to form row0 = band * Hp + y0."""
    Hp, Wp = H + 2 * pad, W + 2 * pad
    Wp_b = ((max(Wp - BWIN, 0) + 7) // 8) * 8 + BWIN
    nbx = (Wp_b - BWIN) // 8 + 1
    return (nbx * Hp + STAGGER, Hp)


def band_frame_i8(fmap_hw: jnp.ndarray, pad: int = PAD):
    """band_frame with int8 storage: (rows*BWIN, C) i8 flat layout + a ()
    f32 dequant scale.

    Halves the kernel's window-DMA bytes (the measured bottleneck stage:
    6.1 of 12.4 ms/level at 13.8k live edges, bench_banded_tune.py). The
    layout flattens (rows, BWIN) into one dim because int8's (32, 128)
    minimum VMEM tile would pad BWIN=24 sublanes by 33%; flat, a window is
    one contiguous (WIN*BWIN=384, C) i8 block — 384 % 32 == 0, no padding,
    and still a single DMA descriptor. Dequantization: the correlation is
    linear in f, so the kernel's bf16 convert multiplies through and one
    per-slot scale on the OUTPUT restores magnitudes (corr_level_banded)."""
    H, W, C = fmap_hw.shape
    f = fmap_hw.astype(jnp.float32)
    s = jnp.max(jnp.abs(f)) / 127.0
    s = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)
    bands = band_frame(q.astype(jnp.float32), pad)  # reuse banding (exact
    # int values <= 127 round-trip bf16 exactly)
    rows = bands.shape[0]
    return bands.astype(jnp.int8).reshape(rows * BWIN, C), s.astype(jnp.float32)


def _kernel_banded(nlive_ref, slot_ref, row0_ref,           # scalar prefetch
                   g_ref, ry_ref, rx_ref,                   # per-edge VMEM
                   fmap_hbm,                                # (mem, rows, BWIN, C)
                   out_ref,
                   win, *scr,                               # ring + NSC + sems
                   C: int, PP: int, wr: int = WIN,
                   ablate: str = "full"):
    scratches, sems = scr[:-1], scr[-1]
    b = pl.program_id(0)

    @pl.when(b * BE < nlive_ref[0])
    def _run():
        def win_dma(e):
            q = b * BE + e
            return pltpu.make_async_copy(
                fmap_hbm.at[slot_ref[q], pl.ds(row0_ref[q], wr)],
                win.at[e % K], sems.at[e % K])

        if ablate != "noDMA":
            for k in range(IF):
                win_dma(k).start()

        def edge_body(e, sc):
            if ablate != "noDMA":
                win_dma(e).wait()
            w2 = win[e % K].reshape(wr * BWIN, C)
            if ablate == "nomm":
                out_ref[e] = jnp.concatenate(
                    [w2[:8, :128], w2[:8, :16]], axis=1).astype(jnp.float32)
                if ablate != "noDMA":
                    @pl.when(e + IF < BE)
                    def _():
                        win_dma(e + IF).start()
                return
            R = jax.lax.dot_general(
                w2, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (512, 16)

            if ablate != "noDMA":
                @pl.when(e + IF < BE)
                def _():
                    win_dma(e + IF).start()

            if ablate == "noext":
                out_ref[e] = jnp.concatenate(
                    [R[8 * p:8 * p + 8, :] for p in range(PP)], axis=1)
                return
            sc[:, :BWIN, :] = R.reshape(wr, BWIN, 16).astype(sc.dtype)
            parts = []
            for p in range(PP):
                rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
                parts.append(sc[pl.ds(ry_ref[e, p], 8), pl.ds(rx8, 16), p])
            out_ref[e] = jnp.concatenate(parts, axis=1).astype(jnp.float32)

        def group(i, _):
            for k in range(NSC):
                edge_body(i * NSC + k, scratches[k])
            return 0

        jax.lax.fori_loop(0, BE // NSC, group, 0)


G8 = 8           # edges per block-diagonal matmul group
KW = 3           # group-window ring slots ((WIN, BWIN, G8*C) each)
IFG = 2          # group DMA batches in flight


def _kernel_banded_split(nlive_ref, slot_ref, row0_ref,     # scalar prefetch
                         scale_ref,                         # (EP,) f32 SMEM
                         g_ref, ry_ref, rx_ref,             # per-edge VMEM
                         fmap_hbm,                          # (mem, rows, 24, C)
                                                            # or flat i8
                                                            # (mem, rows*24, C)
                         out_ref,
                         win, rbuf, sems,
                         *, C: int, PP: int, wr: int = WIN,
                         wi8: bool = False):
    """Phase-split variant: phase A streams DMA+matmul for ALL block edges
    into a VMEM R-buffer (MXU back-to-back, no extraction interleaved);
    phase B runs pure-VPU extraction. Probes whether the per-edge cost of
    the interleaved kernel is pipeline stalls between engines.

    wi8: the banded ring is int8 in the flat (rows*BWIN, C) layout
    (band_frame_i8); row0 arrives pre-multiplied by BWIN and the window
    converts to bf16 right before the matmul (a (384, C) VPU convert,
    ~50 ns — the DMA byte halving is the point). The per-edge dequant
    scale is applied IN the extraction store (scale_ref scalar prefetch):
    doing it post-kernel in XLA cost 0.25 ms of broadcast-multiply plus a
    0.11 ms layout copy per level (profile r03, broadcast_multiply_fusion
    + copy.2863)."""
    b = pl.program_id(0)

    @pl.when(b * BE < nlive_ref[0])
    def _run():
        def win_dma(e):
            q = b * BE + e
            if wi8:
                # row0 arrives pre-multiplied by BWIN (=24, a multiple of 8)
                # so the sublane-dim start of this flat-layout slice is
                # always 8-aligned — but it is a dynamic SMEM scalar, so
                # Mosaic cannot prove it (real-TPU compile failure: "Failed
                # to prove that a tile index in dimension 1 is divisible by
                # the tiling (8)"). Assert it, as rx8 does below.
                r0 = pl.multiple_of(row0_ref[q], 8)
                return pltpu.make_async_copy(
                    fmap_hbm.at[slot_ref[q], pl.ds(r0, wr * BWIN)],
                    win.at[e % K], sems.at[e % K])
            return pltpu.make_async_copy(
                fmap_hbm.at[slot_ref[q], pl.ds(row0_ref[q], wr)],
                win.at[e % K], sems.at[e % K])

        for k in range(IF):
            win_dma(k).start()

        def mm_body(e, _):
            win_dma(e).wait()
            w2 = win[e % K].reshape(wr * BWIN, C)
            if wi8:
                w2 = w2.astype(jnp.bfloat16)
            R = jax.lax.dot_general(
                w2, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(e + IF < BE)
            def _():
                win_dma(e + IF).start()
            rbuf[e] = R.reshape(wr, BWIN, 16).astype(rbuf.dtype)
            return 0

        jax.lax.fori_loop(0, BE, mm_body, 0)

        def ext_body(e, _):
            parts = []
            for p in range(PP):
                rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
                parts.append(rbuf[e, pl.ds(ry_ref[e, p], 8),
                                  pl.ds(rx8, 16), p])
            strips = jnp.concatenate(parts, axis=1).astype(jnp.float32)
            if wi8:
                strips = strips * scale_ref[b * BE + e]
            out_ref[e] = strips
            return 0

        jax.lax.fori_loop(0, BE, ext_body, 0)


K2 = 32          # split2 window ring slots: must buffer enough in-flight
                 # windows to keep the DMA engine busy through the previous
                 # block's extraction phase (~BE * 0.38 us)
IF2 = 16         # split2 prologue DMA depth


def _kernel_banded_split2(nlive_ref, slot_ref, row0_ref,    # scalar prefetch
                          scale_ref,                        # (EP,) f32 SMEM
                          g_ref, ry_ref, rx_ref,            # per-edge VMEM
                          fmap_hbm,
                          out_ref,
                          win, rbuf, sems,
                          *, C: int, PP: int, nblk: int, wr: int = WIN,
                          wi8: bool = False):
    """Software-pipelined split: grid step b streams block b's window DMAs
    and matmuls while EXTRACTING block b-1 (whose R sits in the other rbuf
    parity). The plain split kernel's extraction phase (~0.38 us/edge of
    per-edge VPU slices) leaves the DMA engine idle; here it runs under
    block b's in-flight window stream. The out BlockSpec lags one step
    (index max(b-1, 0)) and the grid has one extra step for the tail.
    Per-edge scalar refs are sized EP + BE with one zero block appended so
    the tail step's (inactive) DMA helpers can still form addresses."""
    b = pl.program_id(0)

    # ---- phase A (blocks 0..nblk-1): stream DMAs + matmuls into rbuf[b%2]
    @pl.when((b < nblk) & (b * BE < nlive_ref[0]))
    def _mm():
        def win_dma(e):
            q = b * BE + e
            if wi8:
                r0 = pl.multiple_of(row0_ref[q], 8)
                return pltpu.make_async_copy(
                    fmap_hbm.at[slot_ref[q], pl.ds(r0, wr * BWIN)],
                    win.at[e % K2], sems.at[e % K2])
            return pltpu.make_async_copy(
                fmap_hbm.at[slot_ref[q], pl.ds(row0_ref[q], wr)],
                win.at[e % K2], sems.at[e % K2])

        for k in range(IF2):
            win_dma(k).start()

        def mm_body(e, _):
            win_dma(e).wait()
            w2 = win[e % K2].reshape(wr * BWIN, C)
            if wi8:
                w2 = w2.astype(jnp.bfloat16)
            R = jax.lax.dot_general(
                w2, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(e + IF2 < BE)
            def _():
                win_dma(e + IF2).start()
            rbuf[b % 2, e] = R.reshape(wr, BWIN, 16).astype(rbuf.dtype)
            return 0

        jax.lax.fori_loop(0, BE, mm_body, 0)

    # ---- phase B (blocks 1..nblk): extract block b-1 from rbuf[(b-1)%2]
    @pl.when((b > 0) & ((b - 1) * BE < nlive_ref[0]))
    def _ext():
        def ext_body(e, _):
            parts = []
            for p in range(PP):
                rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
                parts.append(rbuf[(b - 1) % 2, e, pl.ds(ry_ref[e, p], 8),
                                  pl.ds(rx8, 16), p])
            strips = jnp.concatenate(parts, axis=1).astype(jnp.float32)
            if wi8:
                strips = strips * scale_ref[(b - 1) * BE + e]
            out_ref[e] = strips
            return 0

        jax.lax.fori_loop(0, BE, ext_body, 0)


def _split2_call(nlive, slot_g, row0_g, s_e, g, ry_g, rx_g, fmap_b,
                 *, C, PP, wr, wi8, EP):
    """pallas_call plumbing for the pipelined split2 kernel: grid has one
    extra tail step; g/scalar inputs gain one zero block so step `nblk`'s
    (inactive) block indexing stays in range; ry/rx/out lag one block."""
    nblk = EP // BE
    padB = lambda a: jnp.pad(a, [(0, BE)] + [(0, 0)] * (a.ndim - 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblk + 1,),
        in_specs=[
            pl.BlockSpec((BE, 16, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),        # g (block b)
            pl.BlockSpec((BE, 16), lambda b, *_: (jnp.maximum(b - 1, 0), 0),
                         memory_space=pltpu.VMEM),        # ry (block b-1)
            pl.BlockSpec((BE, 16), lambda b, *_: (jnp.maximum(b - 1, 0), 0),
                         memory_space=pltpu.VMEM),        # rx8 (block b-1)
            pl.BlockSpec(memory_space=pl.ANY),            # fmap_b (HBM)
        ],
        out_specs=pl.BlockSpec((BE, 8, 16 * PP),
                               lambda b, *_: (jnp.maximum(b - 1, 0), 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K2, wr * BWIN, C), jnp.int8) if wi8
            else pltpu.VMEM((K2, wr, BWIN, C), jnp.bfloat16),
            pltpu.VMEM((2, BE, wr, BWIN, 16), jnp.bfloat16),  # R double-buf
            pltpu.SemaphoreType.DMA((K2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_banded_split2, C=C, PP=PP, nblk=nblk,
                          wr=wr, wi8=wi8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
    )(nlive, padB(slot_g), padB(row0_g), s_e,
      padB(g), ry_g, rx_g, fmap_b)


def _kernel_banded_g8(nlive_ref, slot_ref, row0_ref,        # scalar prefetch
                      gt_ref, ry_ref, rx_ref,               # per-edge VMEM
                      fmap_hbm,                             # (mem, rows, 24, C)
                      out_ref,
                      winw, gd, sc, sems,
                      *, C: int, PP: int, wr: int = WIN):
    """Block-diagonal group kernel: 8 edges share ONE full-width MXU matmul.

    W8 (WIN*BWIN, 8C) @ blockdiag(g_0^T..g_7^T) (8C, 128) -> (WIN*BWIN, 128)
    computes all 8 edges' correlation surfaces in one issue: the same MXU
    tile count as 8 thin (., 16)-wide matmuls (which ran the array at 1/8
    lane utilization), but 1/8 the instruction issues and 1/8 the result
    scratch-store traffic — the measured costs no DMA-pipelining knob could
    move. Off-diagonal gd blocks are zeroed once (first live block) and
    never written again; cross terms then multiply against zeros.
    """
    b = pl.program_id(0)
    NG = BE // G8

    @pl.when(b * BE < nlive_ref[0])
    def _run():
        @pl.when(b == 0)
        def _init():
            gd[...] = jnp.zeros_like(gd)

        def gdma(gi, j):
            q = b * BE + gi * G8 + j
            return pltpu.make_async_copy(
                fmap_hbm.at[slot_ref[q], pl.ds(row0_ref[q], wr)],
                winw.at[gi % KW, :, :, pl.ds(j * C, C)],
                sems.at[gi % KW, j])

        for gi in range(IFG):
            for j in range(G8):
                gdma(gi, j).start()

        def group_body(gi, _):
            for j in range(G8):
                gdma(gi, j).wait()
                gd[j * C:(j + 1) * C, 16 * j:16 * j + 16] = \
                    gt_ref[gi * G8 + j]
            W8 = winw[gi % KW].reshape(wr * BWIN, G8 * C)
            R8 = jax.lax.dot_general(
                W8, gd[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (WIN*BWIN, 128)

            @pl.when(gi + IFG < NG)
            def _():
                for j in range(G8):
                    gdma(gi + IFG, j).start()

            sc[:, :BWIN, :] = R8.reshape(wr, BWIN, G8 * 16)
            for j in range(G8):
                e = gi * G8 + j
                parts = []
                for p in range(PP):
                    rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
                    parts.append(sc[pl.ds(ry_ref[e, p], 8),
                                    pl.ds(rx8, 16), 16 * j + p])
                out_ref[e] = jnp.concatenate(parts, axis=1)
            return 0

        jax.lax.fori_loop(0, NG, group_body, 0)


def _kernel_banded_g8c(nlive_ref, slot_ref, row0_ref,       # scalar prefetch
                       gt_ref,                              # per-edge VMEM
                       fmap_hbm,                            # (mem, rows, 24, C)
                                                            # or flat i8
                                                            # (mem, rows*24, C)
                       out_ref,                             # (NGb, wr*24, 128)
                       winw, gd, sems,
                       *, C: int, wr: int = WIN, wi8: bool = False):
    """Compact block-diagonal group kernel: 8 edges share ONE full-width MXU
    matmul (as _kernel_banded_g8) but the kernel emits the raw (wr*BWIN, 128)
    correlation surface per group with NO in-kernel extraction — the
    extraction stage measured as the largest per-edge cost (+0.40 us/edge vs
    DMA 0.43 / matmul 0.17, scripts/bench_banded_tune.py ablations) because
    its per-edge dynamic-offset VMEM slices serialize on the VPU. The
    full-lane surface goes to HBM in bf16 (12 KB/edge at wr=16, zero lane
    padding: pixel lane = 16*j + p) and extraction + bilinear blend run as
    static-slice + select XLA ops over all edges at once (extract_blend_g8).

    NEGATIVE RESULT on real v5e (2026-08-19, scripts/bisect_g8c_compile.py):
    this kernel alone runs 18.4 us/live-edge (19x the full split kernel) and
    the XLA extraction alone 113 us/live-edge with a 4-minute compile — the
    (NG, 8, 16, 128) windowed select chains lower to layout-thrashing loop
    fusions. Kept as a probe/ablation with interpret-mode correctness tests;
    "split" (in-kernel extraction) remains the hardware default."""
    b = pl.program_id(0)
    NGb = BE // G8

    @pl.when(b * BE < nlive_ref[0])
    def _run():
        @pl.when(b == 0)
        def _init():
            gd[...] = jnp.zeros_like(gd)

        def gdma(gi, j):
            q = b * BE + gi * G8 + j
            if wi8:
                r0 = pl.multiple_of(row0_ref[q], 8)   # pre-multiplied by BWIN
                return pltpu.make_async_copy(
                    fmap_hbm.at[slot_ref[q], pl.ds(r0, wr * BWIN)],
                    winw.at[gi % KW, :, pl.ds(j * C, C)],
                    sems.at[gi % KW, j])
            return pltpu.make_async_copy(
                fmap_hbm.at[slot_ref[q], pl.ds(row0_ref[q], wr)],
                winw.at[gi % KW, :, :, pl.ds(j * C, C)],
                sems.at[gi % KW, j])

        for gi in range(IFG):
            for j in range(G8):
                gdma(gi, j).start()

        def group_body(gi, _):
            for j in range(G8):
                gdma(gi, j).wait()
                gd[j * C:(j + 1) * C, 16 * j:16 * j + 16] = \
                    gt_ref[gi * G8 + j]
            if wi8:
                W8 = winw[gi % KW].astype(jnp.bfloat16)
            else:
                W8 = winw[gi % KW].reshape(wr * BWIN, G8 * C)
            R8 = jax.lax.dot_general(
                W8, gd[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (wr*BWIN, 128)

            @pl.when(gi + IFG < NGb)
            def _():
                for j in range(G8):
                    gdma(gi + IFG, j).start()

            out_ref[gi] = R8.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, NGb, group_body, 0)


def extract_blend_g8(R8, ry, rx8, rxo, fx, fy, mask, PP: int, wr: int,
                     scale_e=None):
    """Extraction + bilinear blend over the g8c kernel's compact output.

    R8: (EP//G8, wr*BWIN, 128) surfaces, lane 16*j + p = edge (group, j)'s
    pixel p. All per-edge/pixel scalars lane-map to (NG, 128) so every
    select/blend term is a full-128-lane VPU op over STATIC slices of R8 —
    the layout-change-free XLA replacement for the kernels' per-edge
    dynamic-slice extraction (PERF_NOTES: static slices + select beat lane
    gathers ~1000x; candidate count is (wr-7) * 2 = 18 at wr=16, 6 at 10).
    Returns (EP, 49*PP) ordered [dx, dy, pixel] (blend_strips parity,
    correlation_kernel.cu:232). `scale_e`: (EP,) per-edge dequant scale
    (int8 rings)."""
    NG = R8.shape[0]
    R8 = R8.reshape(NG, wr, BWIN, 128)
    nb = (BWIN - 16) // 8 + 1                # rx8 candidates ({0, 1} at 24)

    def lanes(a, dtype=jnp.float32):         # (EP, PP) -> (NG, 128)
        a = jnp.pad(a.astype(dtype), ((0, 0), (0, 16 - PP)))
        return a.reshape(NG, 128)

    ryl = lanes(ry, jnp.int32)
    rxl = lanes(rx8, jnp.int32)
    S = jnp.zeros((NG, 8, 16, 128), jnp.float32)
    for a in range(wr - 7):
        for c in range(nb):
            sel = (ryl == a) & (rxl == c)
            S = jnp.where(sel[:, None, None, :],
                          R8[:, a:a + 8, 8 * c:8 * c + 16, :]
                          .astype(jnp.float32), S)
    if scale_e is not None:
        sl = jnp.broadcast_to(
            scale_e.astype(jnp.float32).reshape(NG, 8, 1), (NG, 8, 16)
        ).reshape(NG, 128)
        S = S * sl[:, None, None, :]

    fyl, fxl = lanes(fy)[:, None, None, :], lanes(fx)[:, None, None, :]
    rxol = lanes(rxo, jnp.int32)
    Y = (1 - fyl) * S[:, :7] + fyl * S[:, 1:8]           # (NG, 7, 16, 128)
    out = jnp.zeros((NG, 7, 7, 128), jnp.float32)
    for k in range(8):
        cand = (1 - fxl) * Y[:, :, k:k + 7] + fxl * Y[:, :, k + 1:k + 8]
        out = jnp.where((rxol == k)[:, None, None, :], cand, out)
    ml = jnp.broadcast_to(mask.reshape(NG, 8, 1), (NG, 8, 16)).reshape(NG, 128)
    out = jnp.where(ml[:, None, None, :], out, 0.0)
    # (NG, dy, dx, 8j*16p) -> (E, dx, dy, p) flat [dx, dy, p]
    out = out.reshape(NG, 7, 7, 8, 16).transpose(0, 3, 2, 1, 4)[..., :PP]
    return out.reshape(NG * 8, 7 * 7 * PP)


def corr_level_banded(
    gmap: jnp.ndarray,     # (Mring, P, P, C) patch features (ring)
    fmap_b: jnp.ndarray,   # (mem, nbx*Hp+STAGGER, BWIN, C) bf16 banded frames
    coords: jnp.ndarray,   # (E, P, P, 2) at this level's resolution
    kk: jnp.ndarray,       # (E,) ring patch index
    jj: jnp.ndarray,       # (E,) ring frame slot
    mask: jnp.ndarray,     # (E,) bool
    n_live,                # () int32 packed live-edge count (<= E)
    hp: int,               # per-band padded height (banded_shape(H, W)[1])
    radius: int = 3,
    ablate: str = "split", # kernel variant: "split" (phase-split DMA+MXU /
                           # extraction, the fastest measured), "full"
                           # (interleaved per-edge), "g8" (block-diagonal
                           # group matmul, 15% slower, kept as a probe);
                           # "nomm"/"noext"/"noDMA" skip stages (wrong
                           # results; scripts/bench_banded_tune.py)
    g=None,                # (E, 16, C) bf16 pre-looked-up patch features
                           # (both pyramid levels share it — one lookup)
    scale=None,            # () f32 per-ring-family dequant scale array
                           # (mem,) — required iff fmap_b is int8
    win_rows: int = WIN,   # DMA window rows: 8 (taps + bilinear) + allowed
                           # patch y-spread. Level 1 uses 16 (spread <= 8);
                           # upper pyramid levels divide coords by `lvl`, so
                           # the SAME edges fit a spread of 8/lvl and the
                           # window shrinks to 10 at lvl=4 — 37% fewer DMA
                           # bytes and matmul rows with zero extra clipping
) -> jnp.ndarray:
    """(E, 441) correlation ordered [dx, dy, pixel] (one level)."""
    assert radius == 3, "window constants assume r = 3"
    assert win_rows >= 8
    wr = win_rows
    wi8 = fmap_b.dtype == jnp.int8
    if wi8:
        assert scale is not None, "int8 banded rings need per-slot scales"
        assert ablate in ("split", "split2", "g8c", "g8c_kernel_only"), \
            "int8 rings implemented for 'split'/'split2'/'g8c' only"
        mem, rowsf, C = fmap_b.shape
        rows = rowsf // BWIN
    else:
        mem, rows, _, C = fmap_b.shape
    Hp = hp
    nbx = (rows - STAGGER) // Hp
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

    band = jnp.clip((jnp.min(xf, axis=1) - R + PAD) // 8, 0, nbx - 1)
    y0 = jnp.clip(jnp.min(yf, axis=1) - R + PAD, 0, Hp - wr)
    rx = jnp.clip(xf - R + PAD - band[:, None] * 8, 0, BWIN - 9)
    ry = jnp.clip(yf - R + PAD - y0[:, None], 0, wr - 8)
    rx8 = rx // 8            # aligned strip start / 8, in [0, BWIN//8 - 1]
                             # (rx clipped to BWIN - 9 above)
    rxo = rx - rx8 * 8

    if g is None:
        g = lookup_g(gmap, kk, mask)

    slot_g = jnp.where(mask, jj, 0).astype(jnp.int32)
    row0_g = jnp.where(mask, band * Hp + y0, 0).astype(jnp.int32)
    if wi8:
        row0_g = row0_g * BWIN       # flat (rows*BWIN, C) layout
    ry_g = jnp.pad(ry, ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    rx_g = jnp.pad(rx8, ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    nlive = jnp.asarray(n_live, jnp.int32).reshape(1)

    EP = ((E + BE - 1) // BE) * BE
    if EP != E:  # small edge sets (the motion probe) pad up to one block
        padn = EP - E
        pad1 = lambda a: jnp.pad(a, [(0, padn)] + [(0, 0)] * (a.ndim - 1))
        slot_g, row0_g = pad1(slot_g), pad1(row0_g)
        ry_g, rx_g, g = pad1(ry_g), pad1(rx_g), pad1(g)

    if ablate in ("split", "split2"):
        if wi8:
            # per-edge dequant scale, applied in-kernel at the extraction
            # store. (E, mem) one-hot matmul — a fancy gather of the (mem,)
            # scale table would lower to a serial loop.
            oh = (jnp.where(mask, jj, 0)[:, None]
                  == jnp.arange(mem)[None, :]).astype(jnp.float32)
            s_e = oh @ scale.astype(jnp.float32)
            if EP != E:
                s_e = jnp.pad(s_e, (0, EP - E))
        else:
            s_e = jnp.zeros((EP,), jnp.float32)   # unused (wi8=False)
        if ablate == "split2":
            out = _split2_call(nlive, slot_g, row0_g, s_e, g, ry_g, rx_g,
                               fmap_b, C=C, PP=PP, wr=wr, wi8=wi8, EP=EP)
            from .corr import blend_strips
            return blend_strips(out[:E], fx, fy, rxo, mask, PP)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(EP // BE,),
            in_specs=[
                pl.BlockSpec((BE, 16, C), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),    # g
                pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),    # ry
                pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),    # rx8
                pl.BlockSpec(memory_space=pl.ANY),        # fmap_b (HBM)
            ],
            out_specs=pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((K, wr * BWIN, C), jnp.int8) if wi8
                else pltpu.VMEM((K, wr, BWIN, C), jnp.bfloat16),
                pltpu.VMEM((BE, wr, BWIN, 16), jnp.bfloat16),  # R buffer
                pltpu.SemaphoreType.DMA((K,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_kernel_banded_split, C=C, PP=PP, wr=wr,
                              wi8=wi8),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
        )(nlive, slot_g, row0_g, s_e, g, ry_g, rx_g, fmap_b)
        from .corr import blend_strips
        return blend_strips(out[:E], fx, fy, rxo, mask, PP)

    if ablate in ("g8c", "g8c_kernel_only"):
        gt = g.transpose(0, 2, 1)                         # (EP, C, 16)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(EP // BE,),
            in_specs=[
                pl.BlockSpec((BE, C, 16), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),    # g^T
                pl.BlockSpec(memory_space=pl.ANY),        # fmap_b (HBM)
            ],
            out_specs=pl.BlockSpec((BE // G8, wr * BWIN, 128),
                                   lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((KW, wr * BWIN, G8 * C), jnp.int8) if wi8
                else pltpu.VMEM((KW, wr, BWIN, G8 * C), jnp.bfloat16),
                pltpu.VMEM((G8 * C, 128), jnp.bfloat16),  # blockdiag g
                pltpu.SemaphoreType.DMA((KW, G8)),
            ],
        )
        R8 = pl.pallas_call(
            functools.partial(_kernel_banded_g8c, C=C, wr=wr, wi8=wi8),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((EP // G8, wr * BWIN, 128),
                                           jnp.bfloat16),
        )(nlive, slot_g, row0_g, gt, fmap_b)
        if ablate == "g8c_kernel_only":   # Mosaic-vs-XLA compile bisect
            return R8.astype(jnp.float32).sum(axis=(1, 2))
        padE = EP - E
        padP = lambda a: jnp.pad(a, [(0, padE)] + [(0, 0)] * (a.ndim - 1))
        scale_e = None
        if wi8:
            oh = (jj[:, None] == jnp.arange(mem)[None, :]).astype(jnp.float32)
            scale_e = padP((oh @ scale.astype(jnp.float32))[:, None])[:, 0]
        out = extract_blend_g8(
            R8, padP(ry), padP(rx8), padP(rxo), padP(fx), padP(fy),
            padP(mask[:, None])[:, 0], PP, wr, scale_e=scale_e)
        return out[:E]

    if ablate == "g8":
        gt = g.transpose(0, 2, 1)                         # (EP, C, 16)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(EP // BE,),
            in_specs=[
                pl.BlockSpec((BE, C, 16), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),    # g^T
                pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),    # ry
                pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),    # rx8
                pl.BlockSpec(memory_space=pl.ANY),        # fmap_b (HBM)
            ],
            out_specs=pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((KW, wr, BWIN, G8 * C), jnp.bfloat16),
                pltpu.VMEM((G8 * C, 128), jnp.bfloat16),  # blockdiag g
                pltpu.VMEM((wr, BWIN + 8, G8 * 16), jnp.float32),
                pltpu.SemaphoreType.DMA((KW, G8)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_kernel_banded_g8, C=C, PP=PP, wr=wr),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
        )(nlive, slot_g, row0_g, gt, ry_g, rx_g, fmap_b)
        from .corr import blend_strips
        return blend_strips(out[:E], fx, fy, rxo, mask, PP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(EP // BE,),
        in_specs=[
            pl.BlockSpec((BE, 16, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),        # g
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),        # ry
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),        # rx8
            pl.BlockSpec(memory_space=pl.ANY),            # fmap_b (HBM)
        ],
        out_specs=pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((K, wr, BWIN, C), jnp.bfloat16)]   # window ring
            + [pltpu.VMEM((wr, BWIN + 8, 16), SC_DTYPE)
               for _ in range(NSC)]
            + [pltpu.SemaphoreType.DMA((K,))]
        ),
    )

    out = pl.pallas_call(
        functools.partial(_kernel_banded, C=C, PP=PP, wr=wr, ablate=ablate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
    )(nlive, slot_g, row0_g, g, ry_g, rx_g, fmap_b)

    from .corr import blend_strips
    return blend_strips(out[:E], fx, fy, rxo, mask, PP)


def lookup_g(gmap, kk, mask):
    """One-hot MXU lookup of per-edge patch features, padded to 16 pixel
    lanes: (E, 16, C) bf16.

    Probe note (r05): padding the TABLE to 16 pixels before the lookup
    (so the dot emits the kernel layout directly, deleting the ~0.22 ms
    pad+relayout-copy of the per-edge result) adds 7 zero pixel-columns
    to the dot's contraction surface — +78% MXU work (~+0.29 ms at
    E=10k), a net loss. The post-dot pad stays."""
    from .lookup import lookup
    PP = gmap.shape[1] * gmap.shape[2]
    C = gmap.shape[-1]
    E = kk.shape[0]
    g = lookup(gmap.reshape(-1, PP * C).astype(jnp.bfloat16),
               jnp.where(mask, kk, 0)).reshape(E, PP, C)
    return jnp.pad(g, ((0, 0), (0, 16 - PP), (0, 0)))


def level_win_rows(lvl: int) -> int:
    """Per-level DMA window rows: 8 (8x8 taps incl. bilinear) + the patch
    y-spread budget. Level 1 budgets a spread of 8 px (edges beyond that
    clip — projective distortion that large is residual-gated in BA
    anyway); level `lvl` sees the SAME edges at coords/lvl, so its budget
    is ceil(8/lvl) and the window shrinks with zero extra clipping."""
    return 8 + max(-(-8 // lvl), 1)


# =========================================================================
# Level-4 VMEM-resident kernel.
#
# The engine trace (profile r03) shows each pyramid level's pallas call at
# ~5 ms despite level 4 moving 37% fewer bytes: the per-edge window DMA is
# ISSUE-bound, not byte-bound — every live edge costs one descriptor per
# level regardless of size. Level 4's whole ring is tiny (30x40x128 i8 x 32
# slots ~= 5 MB + pad), so instead of 1 descriptor/edge the kernel below
# copies ALL slots HBM->VMEM once per call (ONE descriptor, ~13 us at HBM
# bandwidth) and slices every window directly out of VMEM. Requires int8
# rings (bf16 would be 21 MB — over the ~16 MB VMEM budget at 480x640);
# gated on footprint by the engine (VOConfig.CORR_L4_RESIDENT).
# =========================================================================

L4PADY = 8       # y zero border: >= 8 (8-row strip fallback for far-off-
                 # image pixels must land in zeros) and >= wr - 4 = 6
                 # (bottom window overhang after the y0 clip)
L4PADX = 12      # left x border: >= 9 (blend reads cols 0..8 of a window
                 # whose rx clipped to 0 — all must be zeros, mirroring the
                 # banded kernel's PAD=12 guarantee)


def l4_shape(h4: int, w4: int):
    """Padded (HP, WP) for the resident level-4 layout. WP is a multiple
    of 8 (sublane-aligned x window starts) with >= 9 right-pad columns
    past W4 + L4PADX: a far-off-image pixel's rx clips to BWIN - 9, and
    its blended columns x8max + 15 .. x8max + 23 must all be zeros."""
    hp = h4 + 2 * L4PADY
    wp = ((w4 + L4PADX + 9 + 7) // 8) * 8
    return hp, wp


def pad_frame_l4_i8(fmap_hw: jnp.ndarray):
    """(H4, W4, C) level-4 feature frame -> ((HP, WP, C) i8, () f32 scale):
    plain zero-padded layout (no banding — windows are sliced from VMEM, so
    there is no DMA-contiguity constraint to satisfy)."""
    H, W, C = fmap_hw.shape
    hp, wp = l4_shape(H, W)
    f = fmap_hw.astype(jnp.float32)
    s = jnp.max(jnp.abs(f)) / 127.0
    s = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)
    q = jnp.pad(q, ((L4PADY, hp - H - L4PADY), (L4PADX, wp - W - L4PADX),
                    (0, 0)))
    return q, s.astype(jnp.float32)


def _kernel_l4_resident(nlive_ref, slot_ref, y0_ref, x0_ref,  # scalar prefetch
                        scale_ref,                            # (EP,) f32 SMEM
                        g_ref, ry_ref, rx_ref,                # per-edge VMEM
                        fmap_hbm,                             # (mem, HP, WP, C)
                        out_ref,
                        ring, rbuf, sem,
                        *, C: int, PP: int, wr: int):
    """Split-kernel twin with the per-edge window DMA replaced by VMEM
    slices of the whole resident ring (loaded once at block 0; scratch
    persists across the sequential TPU grid)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _load():
        cp = pltpu.make_async_copy(fmap_hbm, ring, sem)
        cp.start()
        cp.wait()

    @pl.when(b * BE < nlive_ref[0])
    def _run():
        def mm_body(e, _):
            q = b * BE + e
            x0 = pl.multiple_of(x0_ref[q], 8)
            w = ring[slot_ref[q], pl.ds(y0_ref[q], wr), pl.ds(x0, BWIN), :]
            w2 = w.reshape(wr * BWIN, C).astype(jnp.bfloat16)
            R = jax.lax.dot_general(
                w2, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            rbuf[e] = R.reshape(wr, BWIN, 16).astype(rbuf.dtype)
            return 0

        jax.lax.fori_loop(0, BE, mm_body, 0)

        def ext_body(e, _):
            parts = []
            for p in range(PP):
                rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
                parts.append(rbuf[e, pl.ds(ry_ref[e, p], 8),
                                  pl.ds(rx8, 16), p])
            strips = jnp.concatenate(parts, axis=1).astype(jnp.float32)
            out_ref[e] = strips * scale_ref[b * BE + e]
            return 0

        jax.lax.fori_loop(0, BE, ext_body, 0)


def corr_level_l4_resident(
    gmap: jnp.ndarray,     # (Mring, P, P, C) patch features (ring)
    fmap_p: jnp.ndarray,   # (mem, HP, WP, C) i8 padded level-4 rings
    coords: jnp.ndarray,   # (E, P, P, 2) at level-4 resolution
    kk: jnp.ndarray,       # (E,) ring patch index
    jj: jnp.ndarray,       # (E,) ring frame slot
    mask: jnp.ndarray,     # (E,) bool
    n_live,                # () int32 packed live-edge count (<= E)
    radius: int = 3,
    g=None,                # (E, 16, C) bf16 pre-looked-up patch features
    scale=None,            # (mem,) f32 per-slot dequant scales
    win_rows: int = 10,
) -> jnp.ndarray:
    """(E, 49*PP) correlation ordered [dx, dy, pixel] — level-4, resident
    rings. Semantics identical to corr_level_banded (same clipping-into-
    zero-pad off-image behavior; L4PADY/L4PADX vs PAD=12 only slide windows
    within zero regions)."""
    assert radius == 3, "window constants assume r = 3"
    assert fmap_p.dtype == jnp.int8 and scale is not None, \
        "resident level-4 requires int8 rings + per-slot scales"
    wr = win_rows
    mem, HP, WP, C = fmap_p.shape
    E, P = coords.shape[0], coords.shape[1]
    PP = P * P

    x = coords[..., 0].reshape(E, PP).astype(jnp.float32)
    y = coords[..., 1].reshape(E, PP).astype(jnp.float32)
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    fx = (x - xf).astype(jnp.float32)
    fy = (y - yf).astype(jnp.float32)
    xf = xf.astype(jnp.int32)
    yf = yf.astype(jnp.int32)

    y0 = jnp.clip(jnp.min(yf, axis=1) - radius + L4PADY, 0, HP - wr)
    x8 = jnp.clip(((jnp.min(xf, axis=1) - radius + L4PADX) // 8) * 8,
                  0, WP - BWIN)
    rx = jnp.clip(xf - radius + L4PADX - x8[:, None], 0, BWIN - 9)
    ry = jnp.clip(yf - radius + L4PADY - y0[:, None], 0, wr - 8)
    rx8 = rx // 8
    rxo = rx - rx8 * 8

    if g is None:
        g = lookup_g(gmap, kk, mask)

    slot_g = jnp.where(mask, jj, 0).astype(jnp.int32)
    y0_g = jnp.where(mask, y0, 0).astype(jnp.int32)
    x0_g = jnp.where(mask, x8, 0).astype(jnp.int32)
    ry_g = jnp.pad(ry, ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    rx_g = jnp.pad(rx8, ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    nlive = jnp.asarray(n_live, jnp.int32).reshape(1)

    oh = (slot_g[:, None] == jnp.arange(mem)[None, :]).astype(jnp.float32)
    s_e = oh @ scale.astype(jnp.float32)

    EP = ((E + BE - 1) // BE) * BE
    if EP != E:
        padn = EP - E
        pad1 = lambda a: jnp.pad(a, [(0, padn)] + [(0, 0)] * (a.ndim - 1))
        slot_g, y0_g, x0_g = pad1(slot_g), pad1(y0_g), pad1(x0_g)
        ry_g, rx_g, g, s_e = pad1(ry_g), pad1(rx_g), pad1(g), pad1(s_e)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(EP // BE,),
        in_specs=[
            pl.BlockSpec((BE, 16, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),    # g
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),    # ry
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),    # rx8
            pl.BlockSpec(memory_space=pl.ANY),        # fmap_p (HBM)
        ],
        out_specs=pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((mem, HP, WP, C), jnp.int8),   # resident rings
            pltpu.VMEM((BE, wr, BWIN, 16), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_l4_resident, C=C, PP=PP, wr=wr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
    )(nlive, slot_g, y0_g, x0_g, s_e, g, ry_g, rx_g, fmap_p)
    from .corr import blend_strips
    return blend_strips(out[:E], fx, fy, rxo, mask, PP)


# =========================================================================
# Merged two-level kernel ("pair").
#
# The engine trace (profile r03) put the two per-level pallas calls at
# ~5 ms EACH with level 4 costing the same as level 1 despite 37% fewer
# bytes: the per-edge window DMA is LATENCY-bound per descriptor, and with
# the levels as separate sequential calls each level's DMA queue idles
# while the other level computes. This kernel runs both levels in ONE grid
# pass with independent DMA queues (two semaphore arrays): level-b windows
# stream while level-a matmuls issue and vice versa, doubling the
# descriptors in flight for the same per-edge compute. It also shares the
# per-block g DMA (identical patch features for both levels) and halves
# the fixed per-call overheads (dispatch, grid, scalar prefetch).
# =========================================================================


def _pair_level_index(coords, mask, jj, hp: int, nbx: int, wr: int,
                      radius: int, wi8: bool):
    """Per-level window indexing shared by the banded kernels: returns
    (fx, fy, rxo, row0_g, ry, rx8) for one pyramid level (the same
    arithmetic as corr_level_banded's preamble)."""
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
    band = jnp.clip((jnp.min(xf, axis=1) - R + PAD) // 8, 0, nbx - 1)
    y0 = jnp.clip(jnp.min(yf, axis=1) - R + PAD, 0, hp - wr)
    rx = jnp.clip(xf - R + PAD - band[:, None] * 8, 0, BWIN - 9)
    ry = jnp.clip(yf - R + PAD - y0[:, None], 0, wr - 8)
    rx8 = rx // 8
    rxo = rx - rx8 * 8
    row0_g = jnp.where(mask, band * hp + y0, 0).astype(jnp.int32)
    if wi8:
        row0_g = row0_g * BWIN           # flat (rows*BWIN, C) layout
    ry_g = jnp.pad(ry, ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    rx_g = jnp.pad(rx8, ((0, 0), (0, 16 - PP))).astype(jnp.int32)
    return fx, fy, rxo, row0_g, ry_g, rx_g


def _kernel_banded_pair(nlive_ref, slot_ref, row0a_ref, row0b_ref,  # prefetch
                        sa_ref, sb_ref,             # (EP,) f32 dequant scales
                        g_ref,                      # (BE, 16, C) shared
                        rya_ref, rxa_ref, ryb_ref, rxb_ref,
                        fa_hbm, fb_hbm,             # per-level banded rings
                        outa_ref, outb_ref,
                        wina, winb, rbufa, rbufb, semsa, semsb,
                        *, C: int, PP: int, wra: int, wrb: int,
                        wi8: bool):
    """Two pyramid levels in one phase-split pass. Each level keeps its own
    IF-deep window-DMA pipeline (independent semaphores) so the two
    descriptor streams overlap each other's latency AND both matmul
    streams; phase B extracts both levels per edge (same VPU work as two
    kernels, half the loop overhead)."""
    b = pl.program_id(0)

    @pl.when(b * BE < nlive_ref[0])
    def _run():
        def dma(e, row0_ref, f_hbm, win, sems, wr):
            q = b * BE + e
            if wi8:
                r0 = pl.multiple_of(row0_ref[q], 8)   # pre-multiplied by BWIN
                return pltpu.make_async_copy(
                    f_hbm.at[slot_ref[q], pl.ds(r0, wr * BWIN)],
                    win.at[e % K], sems.at[e % K])
            return pltpu.make_async_copy(
                f_hbm.at[slot_ref[q], pl.ds(row0_ref[q], wr)],
                win.at[e % K], sems.at[e % K])

        dma_a = functools.partial(dma, row0_ref=row0a_ref, f_hbm=fa_hbm,
                                  win=wina, sems=semsa, wr=wra)
        dma_b = functools.partial(dma, row0_ref=row0b_ref, f_hbm=fb_hbm,
                                  win=winb, sems=semsb, wr=wrb)

        for k in range(IF):
            dma_a(k).start()
            dma_b(k).start()

        def mm_body(e, _):
            dma_a(e).wait()
            wa = wina[e % K].reshape(wra * BWIN, C)
            if wi8:
                wa = wa.astype(jnp.bfloat16)
            Ra = jax.lax.dot_general(
                wa, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dma_b(e).wait()

            @pl.when(e + IF < BE)
            def _():
                dma_a(e + IF).start()
                dma_b(e + IF).start()

            wb = winb[e % K].reshape(wrb * BWIN, C)
            if wi8:
                wb = wb.astype(jnp.bfloat16)
            Rb = jax.lax.dot_general(
                wb, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            rbufa[e] = Ra.reshape(wra, BWIN, 16).astype(rbufa.dtype)
            rbufb[e] = Rb.reshape(wrb, BWIN, 16).astype(rbufb.dtype)
            return 0

        jax.lax.fori_loop(0, BE, mm_body, 0)

        def ext_body(e, _):
            parts_a, parts_b = [], []
            for p in range(PP):
                rxa8 = pl.multiple_of(rxa_ref[e, p] * 8, 8)
                parts_a.append(rbufa[e, pl.ds(rya_ref[e, p], 8),
                                     pl.ds(rxa8, 16), p])
                rxb8 = pl.multiple_of(rxb_ref[e, p] * 8, 8)
                parts_b.append(rbufb[e, pl.ds(ryb_ref[e, p], 8),
                                     pl.ds(rxb8, 16), p])
            sa = jnp.concatenate(parts_a, axis=1).astype(jnp.float32)
            sb = jnp.concatenate(parts_b, axis=1).astype(jnp.float32)
            if wi8:
                sa = sa * sa_ref[b * BE + e]
                sb = sb * sb_ref[b * BE + e]
            outa_ref[e] = sa
            outb_ref[e] = sb
            return 0

        jax.lax.fori_loop(0, BE, ext_body, 0)


def corr_pyramid_pair(
    gmap: jnp.ndarray,      # (Mring, P, P, C) patch features (ring)
    fa: jnp.ndarray,        # level-a banded ring (flat i8 or 4-D bf16)
    fb: jnp.ndarray,        # level-b banded ring
    coords: jnp.ndarray,    # (E, P, P, 2) at LEVEL-0 resolution
    kk: jnp.ndarray,        # (E,) ring patch index
    jj: jnp.ndarray,        # (E,) ring frame slot
    mask: jnp.ndarray,      # (E,) bool
    n_live,                 # () int32 packed live-edge count
    hw,                     # level-0 feature resolution (H, W)
    levels=(1, 4),
    radius: int = 3,
    scales=(None, None),    # per-level (mem,) f32 dequant scales (i8 rings)
    wins=None,              # per-level DMA window rows
) -> jnp.ndarray:
    """Both pyramid levels in ONE pallas call; output ordering matches
    corr_pyramid_banded ([dx, dy, pixel, level])."""
    assert radius == 3, "window constants assume r = 3"
    wi8 = fa.dtype == jnp.int8
    assert (fb.dtype == jnp.int8) == wi8, "pair levels must share a dtype"
    if wins is None:
        wins = tuple(level_win_rows(lvl) for lvl in levels)
    wra, wrb = wins
    if wi8:
        assert scales[0] is not None and scales[1] is not None
        mem, rowsf, C = fa.shape
    else:
        mem, _, _, C = fa.shape
    E, P = coords.shape[0], coords.shape[1]
    PP = P * P

    idx = []
    for f, lvl, wr in zip((fa, fb), levels, wins):
        h, w = hw[0] // lvl, hw[1] // lvl
        rows, hp = banded_shape(h, w)
        nbx = (rows - STAGGER) // hp
        idx.append(_pair_level_index(coords / lvl, mask, jj, hp, nbx, wr,
                                     radius, wi8))
    (fxa, fya, rxoa, row0a, rya, rxa) = idx[0]
    (fxb, fyb, rxob, row0b, ryb, rxb) = idx[1]

    g = lookup_g(gmap, kk, mask)
    slot_g = jnp.where(mask, jj, 0).astype(jnp.int32)
    nlive = jnp.asarray(n_live, jnp.int32).reshape(1)

    if wi8:
        # shared one-hot (a fancy gather of the (mem,) tables would lower
        # to a serial loop); two matvecs reuse it
        oh = (slot_g[:, None] == jnp.arange(mem)[None, :]).astype(jnp.float32)
        s_a = oh @ scales[0].astype(jnp.float32)
        s_b = oh @ scales[1].astype(jnp.float32)
    else:
        s_a = s_b = jnp.zeros((E,), jnp.float32)   # unused

    EP = ((E + BE - 1) // BE) * BE
    if EP != E:
        padn = EP - E
        pad1 = lambda a: jnp.pad(a, [(0, padn)] + [(0, 0)] * (a.ndim - 1))
        slot_g, row0a, row0b = pad1(slot_g), pad1(row0a), pad1(row0b)
        rya, rxa, ryb, rxb = pad1(rya), pad1(rxa), pad1(ryb), pad1(rxb)
        g, s_a, s_b = pad1(g), pad1(s_a), pad1(s_b)

    win_scr = (
        (lambda wr: pltpu.VMEM((K, wr * BWIN, C), jnp.int8)) if wi8
        else (lambda wr: pltpu.VMEM((K, wr, BWIN, C), jnp.bfloat16)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(EP // BE,),
        in_specs=[
            pl.BlockSpec((BE, 16, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),    # g (shared)
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),    # rya
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),    # rxa8
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),    # ryb
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),    # rxb8
            pl.BlockSpec(memory_space=pl.ANY),        # fa (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # fb (HBM)
        ],
        out_specs=[
            pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            win_scr(wra),                             # level-a window ring
            win_scr(wrb),                             # level-b window ring
            pltpu.VMEM((BE, wra, BWIN, 16), jnp.bfloat16),
            pltpu.VMEM((BE, wrb, BWIN, 16), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((K,)),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    outa, outb = pl.pallas_call(
        functools.partial(_kernel_banded_pair, C=C, PP=PP, wra=wra, wrb=wrb,
                          wi8=wi8),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32),
                   jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.float32)],
    )(nlive, slot_g, row0a, row0b, s_a, s_b,
      g, rya, rxa, ryb, rxb, fa, fb)

    from .corr import blend_strips
    outs = [blend_strips(outa[:E], fxa, fya, rxoa, mask, PP),
            blend_strips(outb[:E], fxb, fyb, rxob, mask, PP)]
    return jnp.stack(outs, axis=-1).reshape(E, -1)


BE2P = int(_os.environ.get("DEVO_CORR_BE2P", "32"))  # pair2 edge block size
K2P = int(_os.environ.get("DEVO_CORR_K2P", "32"))   # pair2 window-ring slots
IF2P = int(_os.environ.get("DEVO_CORR_IF2P", "24"))  # pair2 DMA issue depth
# pair2 VMEM: the R scratch layout (BE, wr, BWIN, 16) tile-pads its 16-lane
# minor dim to 128 (8x), so double-buffering both levels costs
# 2*2*BE2P*(wra+wrb)*BWIN*128*2B — at BE2P=32, wins=(16,10): 10.2 MB, plus
# window rings K2P*(wra+wrb)*BWIN*C i8 at K2P=32: 2.4 MB (~13.5 MB total;
# BE2P=64/K2P=64 OOMs at 24.4M > 16M).


def _kernel_banded_pair2(nlive_ref, slot_ref, row0a_ref, row0b_ref,  # prefetch
                         sa_ref, sb_ref,            # (EP+BE,) f32 dequant
                         g_ref,                     # (BE2P, 16, C) block b
                         rya_ref, rxa_ref, ryb_ref, rxb_ref,  # block b-1
                         fa_hbm, fb_hbm,            # per-level banded rings
                         outa_ref, outb_ref,        # block b-1 (lagged)
                         wina, winb, rbufa, rbufb, semsa, semsb,
                         *, C: int, PP: int, nblk: int, wra: int, wrb: int,
                         wi8: bool):
    """Two-level pair kernel with TRUE cross-block DMA continuation.

    The r04 descriptor-wall probe (scripts/probe_desc_wall.py) killed the
    issue-rate model: window DMA is STREAM-BANDWIDTH bound (~220 GB/s flat
    from 48 KB to 384 KB descriptors, ~0.09 us fixed issue cost, and
    multiple semaphore streams do NOT aggregate). The lever left is keeping
    that one stream busy 100% of the time. `pair` stalls it for ~BE*0.38 us
    every block while the extraction loop runs (DMA issue is a core
    instruction — nothing new is issued during extraction, so at most the
    IF in-flight windows stream). This kernel:

      - indexes the window-DMA sequence GLOBALLY (q = b*BE + e), so the
        issue-ahead of block b's matmul loop flows into block b+1's
        descriptors — bounded by the live-rounded edge count, preserving
        the early exit and leaking no semaphores;
      - runs extraction for block b-1 AFTER block b's matmul phase (out /
        ry / rx BlockSpecs lag one block, as _kernel_banded_split2), with
        up to IF2P windows x 2 levels in flight streaming beneath it;
      - sizes the ring as deep as the R-scratch VMEM blowup allows
        (K2P slots, IF2P in flight; ~1.9 MB in-flight bytes at wr 16/10
        covers ~70% of the ~12 us per-block extraction phase at the
        measured ~220 GB/s).
    """
    b = pl.program_id(0)
    nlive = nlive_ref[0]
    qlive = ((nlive + BE2P - 1) // BE2P) * BE2P   # issue bound (block-rounded)

    def dma(q, row0_ref, f_hbm, win, sems, wr):
        if wi8:
            r0 = pl.multiple_of(row0_ref[q], 8)   # pre-multiplied by BWIN
            return pltpu.make_async_copy(
                f_hbm.at[slot_ref[q], pl.ds(r0, wr * BWIN)],
                win.at[q % K2P], sems.at[q % K2P])
        return pltpu.make_async_copy(
            f_hbm.at[slot_ref[q], pl.ds(row0_ref[q], wr)],
            win.at[q % K2P], sems.at[q % K2P])

    dma_a = functools.partial(dma, row0_ref=row0a_ref, f_hbm=fa_hbm,
                              win=wina, sems=semsa, wr=wra)
    dma_b = functools.partial(dma, row0_ref=row0b_ref, f_hbm=fb_hbm,
                              win=winb, sems=semsb, wr=wrb)

    # ---- phase A (blocks 0..nblk-1): stream DMAs + matmuls into rbuf[b%2]
    @pl.when((b < nblk) & (b * BE2P < nlive))
    def _mm():
        @pl.when(b == 0)
        def _prologue():
            def pro(k, _):
                @pl.when(k < qlive)
                def _():
                    dma_a(k).start()
                    dma_b(k).start()
                return 0
            jax.lax.fori_loop(0, IF2P, pro, 0)

        def mm_body(e, _):
            q = b * BE2P + e
            dma_a(q).wait()

            @pl.when(q + IF2P < qlive)
            def _():
                dma_a(q + IF2P).start()
            wa = wina[q % K2P].reshape(wra * BWIN, C)
            if wi8:
                wa = wa.astype(jnp.bfloat16)
            Ra = jax.lax.dot_general(
                wa, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dma_b(q).wait()

            @pl.when(q + IF2P < qlive)
            def _():
                dma_b(q + IF2P).start()
            wb = winb[q % K2P].reshape(wrb * BWIN, C)
            if wi8:
                wb = wb.astype(jnp.bfloat16)
            Rb = jax.lax.dot_general(
                wb, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            rbufa[b % 2, e] = Ra.reshape(wra, BWIN, 16).astype(rbufa.dtype)
            rbufb[b % 2, e] = Rb.reshape(wrb, BWIN, 16).astype(rbufb.dtype)
            return 0

        jax.lax.fori_loop(0, BE2P, mm_body, 0)

    # ---- phase B (blocks 1..nblk): extract block b-1 from rbuf[(b-1)%2]
    @pl.when((b > 0) & ((b - 1) * BE2P < nlive))
    def _ext():
        def ext_body(e, _):
            parts_a, parts_b = [], []
            for p in range(PP):
                rxa8 = pl.multiple_of(rxa_ref[e, p] * 8, 8)
                parts_a.append(rbufa[(b - 1) % 2, e,
                                     pl.ds(rya_ref[e, p], 8),
                                     pl.ds(rxa8, 16), p])
                rxb8 = pl.multiple_of(rxb_ref[e, p] * 8, 8)
                parts_b.append(rbufb[(b - 1) % 2, e,
                                     pl.ds(ryb_ref[e, p], 8),
                                     pl.ds(rxb8, 16), p])
            sa = jnp.concatenate(parts_a, axis=1).astype(jnp.float32)
            sb = jnp.concatenate(parts_b, axis=1).astype(jnp.float32)
            if wi8:
                sa = sa * sa_ref[(b - 1) * BE2P + e]
                sb = sb * sb_ref[(b - 1) * BE2P + e]
            outa_ref[e] = sa.astype(outa_ref.dtype)
            outb_ref[e] = sb.astype(outb_ref.dtype)
            return 0

        jax.lax.fori_loop(0, BE2P, ext_body, 0)


def _kernel_banded_mono(nlive_ref, slot_ref, row0a_ref, row0b_ref,  # prefetch
                        sa_ref, sb_ref,            # (EP+BE2P,) f32 dequant
                        g_ref,                     # (BE2P, 16, C) block b
                        rya_ref, rxa_ref, ryb_ref, rxb_ref,  # block b-1
                        fa_hbm, fb_hbm,            # per-level banded rings
                        outa_ref, outb_ref,        # block b-1 (lagged)
                        win, rbufa, rbufb, sems,
                        *, C: int, PP: int, nblk: int, wra: int, wrb: int,
                        wi8: bool, step2: bool = False, adj2: bool = False):
    """Single-dot merged-loop two-level kernel.

    The pair/pair2 engine A/B (r04: 47.0 vs 47.6 FPS) showed the kernel is
    CORE-SERIAL bound, not DMA-wait bound: per edge the scalar core issues
    two small dots (each paying an MXU pipeline fill on (wr*BWIN, C) x
    (C, 16)), two window DMAs, and — in a separate serial phase — ~0.38 us
    of VPU extraction slices. This kernel attacks the core-serial path:

      - BOTH levels' windows land in ONE stacked VMEM buffer (level a at
        rows [0, wra*BWIN), level b at [wra*BWIN, ..), one semaphore slot
        signaled twice), so each edge runs ONE (wra*BWIN + wrb*BWIN, C) x
        (C, 16) dot — half the MXU pipeline fills;
      - extraction of block b-1's edge e is INLINED into the same loop
        iteration as block b's edge-e matmul, so the VPU slice chain and
        the MXU dot of consecutive iterations can overlap in the hardware
        scoreboard instead of running as two serial phases;
      - keeps pair2's global DMA indexing (cross-block issue-ahead,
        live-rounded bound, no semaphore leaks).
    """
    b = pl.program_id(0)
    nlive = nlive_ref[0]
    qlive = ((nlive + BE2P - 1) // BE2P) * BE2P
    WRA, WRB = wra * BWIN, wrb * BWIN
    TOT = WRA + WRB

    def dma_a(q):
        if wi8:
            r0 = pl.multiple_of(row0a_ref[q], 8)
            return pltpu.make_async_copy(
                fa_hbm.at[slot_ref[q], pl.ds(r0, WRA)],
                win.at[q % K2P, pl.ds(0, WRA)], sems.at[q % K2P])
        return pltpu.make_async_copy(
            fa_hbm.at[slot_ref[q], pl.ds(row0a_ref[q], wra)],
            win.at[q % K2P, pl.ds(0, wra)], sems.at[q % K2P])

    def dma_b(q):
        if wi8:
            r0 = pl.multiple_of(row0b_ref[q], 8)
            return pltpu.make_async_copy(
                fb_hbm.at[slot_ref[q], pl.ds(r0, WRB)],
                win.at[q % K2P, pl.ds(WRA, WRB)], sems.at[q % K2P])
        return pltpu.make_async_copy(
            fb_hbm.at[slot_ref[q], pl.ds(row0b_ref[q], wrb)],
            win.at[q % K2P, pl.ds(wra, wrb)], sems.at[q % K2P])

    def mm_edge(e, pair2x: bool = False):
        q = b * BE2P + e
        # two waits on the shared slot semaphore — each copy signals its
        # own byte count
        dma_a(q).wait()
        dma_b(q).wait()

        @pl.when(q + IF2P < qlive)
        def _():
            dma_a(q + IF2P).start()
            dma_b(q + IF2P).start()
        if pair2x:
            # second edge of a 2-edge step: wait/issue its stream too, then
            # ONE dot covers both edges' stacked windows against the
            # sublane-concatenated (32, C) pair of g blocks. The two cross
            # products (edge i's window x edge j's g) are wasted MXU lanes
            # — FLOPs are free here, pipeline fills are not.
            dma_a(q + 1).wait()
            dma_b(q + 1).wait()

            @pl.when(q + 1 + IF2P < qlive)
            def _():
                dma_a(q + 1 + IF2P).start()
                dma_b(q + 1 + IF2P).start()
            if adj2 and wi8:
                # mono4: e (and so q) is even and K2P is even, so the two
                # edges' ring slots are ADJACENT — read both as one slice
                # and collapse, skipping mono2's explicit VMEM concat copy
                # (the measured cause of its -3.2 FPS vs mono, r04)
                w2 = (win[pl.ds(q % K2P, 2)].astype(jnp.bfloat16)
                      .reshape(2 * TOT, C))
            else:
                w0 = win[q % K2P]
                w1 = win[(q + 1) % K2P]
                if wi8:
                    w0, w1 = w0.astype(jnp.bfloat16), w1.astype(jnp.bfloat16)
                else:
                    w0, w1 = w0.reshape(TOT, C), w1.reshape(TOT, C)
                w2 = jnp.concatenate([w0, w1], axis=0)      # (2*TOT, C)
            g2 = g_ref[pl.ds(e, 2)].reshape(32, C)          # (32, C)
            R = jax.lax.dot_general(
                w2, g2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (2*TOT, 32)
            rbufa[b % 2, e] = (R[0:WRA, 0:16]
                               .reshape(wra, BWIN, 16).astype(rbufa.dtype))
            rbufb[b % 2, e] = (R[WRA:TOT, 0:16]
                               .reshape(wrb, BWIN, 16).astype(rbufb.dtype))
            rbufa[b % 2, e + 1] = (R[TOT:TOT + WRA, 16:32]
                                   .reshape(wra, BWIN, 16).astype(rbufa.dtype))
            rbufb[b % 2, e + 1] = (R[TOT + WRA:2 * TOT, 16:32]
                                   .reshape(wrb, BWIN, 16).astype(rbufb.dtype))
            return
        w = win[q % K2P]
        if wi8:
            w = w.astype(jnp.bfloat16)      # flat (TOT, C) layout
        else:
            w = w.reshape(TOT, C)           # (wra + wrb, BWIN, C) layout
        R = jax.lax.dot_general(
            w, g_ref[e], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        rbufa[b % 2, e] = R[0:WRA].reshape(wra, BWIN, 16).astype(rbufa.dtype)
        rbufb[b % 2, e] = R[WRA:TOT].reshape(wrb, BWIN, 16).astype(rbufb.dtype)

    def ext_edge(e):
        parts_a, parts_b = [], []
        for p in range(PP):
            rxa8 = pl.multiple_of(rxa_ref[e, p] * 8, 8)
            parts_a.append(rbufa[(b - 1) % 2, e,
                                 pl.ds(rya_ref[e, p], 8),
                                 pl.ds(rxa8, 16), p])
            rxb8 = pl.multiple_of(rxb_ref[e, p] * 8, 8)
            parts_b.append(rbufb[(b - 1) % 2, e,
                                 pl.ds(ryb_ref[e, p], 8),
                                 pl.ds(rxb8, 16), p])
        sa = jnp.concatenate(parts_a, axis=1).astype(jnp.float32)
        sb = jnp.concatenate(parts_b, axis=1).astype(jnp.float32)
        if wi8:
            sa = sa * sa_ref[(b - 1) * BE2P + e]
            sb = sb * sb_ref[(b - 1) * BE2P + e]
        outa_ref[e] = sa.astype(outa_ref.dtype)
        outb_ref[e] = sb.astype(outb_ref.dtype)

    active_mm = (b < nblk) & (b * BE2P < nlive)
    ext_due = (b > 0) & ((b - 1) * BE2P < nlive)

    stride = 2 if step2 else 1

    @pl.when(active_mm & (b == 0))
    def _first():
        def pro(k, _):
            @pl.when(k < qlive)
            def _():
                dma_a(k).start()
                dma_b(k).start()
            return 0
        jax.lax.fori_loop(0, IF2P, pro, 0)

        def body(i, _):
            mm_edge(i * stride, pair2x=step2)
            return 0
        jax.lax.fori_loop(0, BE2P // stride, body, 0)

    @pl.when(active_mm & (b > 0))
    def _mm_ext():
        def body(i, _):
            e = i * stride
            mm_edge(e, pair2x=step2)
            ext_edge(e)
            if step2:
                ext_edge(e + 1)
            return 0
        jax.lax.fori_loop(0, BE2P // stride, body, 0)

    @pl.when((~active_mm) & ext_due)
    def _ext_only():
        def body(i, _):
            e = i * stride
            ext_edge(e)
            if step2:
                ext_edge(e + 1)
            return 0
        jax.lax.fori_loop(0, BE2P // stride, body, 0)


BE3 = int(_os.environ.get("DEVO_CORR_BE3", "64"))    # mono3 edge block size
K3 = int(_os.environ.get("DEVO_CORR_K3", "64"))      # mono3 window-ring slots
IF3 = int(_os.environ.get("DEVO_CORR_IF3", "48"))    # mono3 DMA issue depth


def _kernel_banded_mono3(nlive_ref, slot_ref, row0a_ref, row0b_ref,  # prefetch
                         sa_ref, sb_ref,            # (EP+BE3,) f32 dequant
                         g_ref,                     # (BE3, 16, C) block b
                         rya_ref, rxa_ref, ryb_ref, rxb_ref,  # block b
                         fa_hbm, fb_hbm,
                         outa_ref, outb_ref,        # block b (NO lag)
                         win, rba, rbb, sems,
                         *, C: int, PP: int, nblk: int, wra: int, wrb: int,
                         wi8: bool):
    """mono with a 2-slot rotating PER-EDGE R scratch instead of the
    per-block double buffer.

    First attempt sliced the dot-result VALUE directly (ry/rx loaded from
    VMEM = value-derived offsets) — Mosaic has no dynamic_slice lowering
    for values at all, so the scratch round-trip is forced. This variant
    keeps mono's same-iteration extraction but shrinks the R scratch from
    2 x BE x (both levels) (~8.7 MB lane-padded) to 2 edges (~340 KB):
    the freed VMEM doubles the block size (BE3 = 64, half the per-block
    overhead) and deepens the window ring (K3/IF3 = 64/48). The e%2
    rotation keeps iteration e+1's store independent of iteration e's
    extraction reads in the scoreboard."""
    b = pl.program_id(0)
    nlive = nlive_ref[0]
    qlive = ((nlive + BE3 - 1) // BE3) * BE3
    WRA, WRB = wra * BWIN, wrb * BWIN
    TOT = WRA + WRB

    def dma_a(q):
        if wi8:
            r0 = pl.multiple_of(row0a_ref[q], 8)
            return pltpu.make_async_copy(
                fa_hbm.at[slot_ref[q], pl.ds(r0, WRA)],
                win.at[q % K3, pl.ds(0, WRA)], sems.at[q % K3])
        return pltpu.make_async_copy(
            fa_hbm.at[slot_ref[q], pl.ds(row0a_ref[q], wra)],
            win.at[q % K3, pl.ds(0, wra)], sems.at[q % K3])

    def dma_b(q):
        if wi8:
            r0 = pl.multiple_of(row0b_ref[q], 8)
            return pltpu.make_async_copy(
                fb_hbm.at[slot_ref[q], pl.ds(r0, WRB)],
                win.at[q % K3, pl.ds(WRA, WRB)], sems.at[q % K3])
        return pltpu.make_async_copy(
            fb_hbm.at[slot_ref[q], pl.ds(row0b_ref[q], wrb)],
            win.at[q % K3, pl.ds(wra, wrb)], sems.at[q % K3])

    @pl.when(b * BE3 < nlive)
    def _run():
        @pl.when(b == 0)
        def _prologue():
            def pro(k, _):
                @pl.when(k < qlive)
                def _():
                    dma_a(k).start()
                    dma_b(k).start()
                return 0
            jax.lax.fori_loop(0, IF3, pro, 0)

        def body(e, _):
            q = b * BE3 + e
            dma_a(q).wait()
            dma_b(q).wait()

            @pl.when(q + IF3 < qlive)
            def _():
                dma_a(q + IF3).start()
                dma_b(q + IF3).start()
            w = win[q % K3]
            if wi8:
                w = w.astype(jnp.bfloat16)
            else:
                w = w.reshape(TOT, C)
            R = jax.lax.dot_general(
                w, g_ref[e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            rba[e % 2] = R[0:WRA].reshape(wra, BWIN, 16)
            rbb[e % 2] = R[WRA:TOT].reshape(wrb, BWIN, 16)

            parts_a, parts_b = [], []
            for p in range(PP):
                rxa8 = pl.multiple_of(rxa_ref[e, p] * 8, 8)
                parts_a.append(rba[e % 2, pl.ds(rya_ref[e, p], 8),
                                   pl.ds(rxa8, 16), p])
                rxb8 = pl.multiple_of(rxb_ref[e, p] * 8, 8)
                parts_b.append(rbb[e % 2, pl.ds(ryb_ref[e, p], 8),
                                   pl.ds(rxb8, 16), p])
            sa = jnp.concatenate(parts_a, axis=1)
            sb = jnp.concatenate(parts_b, axis=1)
            if wi8:
                sa = sa * sa_ref[q]
                sb = sb * sb_ref[q]
            outa_ref[e] = sa.astype(outa_ref.dtype)
            outb_ref[e] = sb.astype(outb_ref.dtype)
            return 0

        jax.lax.fori_loop(0, BE3, body, 0)


def corr_pyramid_pair2(gmap, fa, fb, coords, kk, jj, mask, n_live, hw,
                       levels=(1, 4), radius=3, scales=(None, None),
                       wins=None, variant="pair2"):
    """corr_pyramid_pair with the cross-block-pipelined pair2 kernel; same
    output contract ([dx, dy, pixel, level]). variant="mono" swaps in the
    single-dot merged-loop kernel (same plumbing, one stacked window buffer
    + one semaphore array)."""
    assert radius == 3, "window constants assume r = 3"
    wi8 = fa.dtype == jnp.int8
    assert (fb.dtype == jnp.int8) == wi8, "pair levels must share a dtype"
    if wins is None:
        wins = tuple(level_win_rows(lvl) for lvl in levels)
    wra, wrb = wins
    if wi8:
        assert scales[0] is not None and scales[1] is not None
        mem, rowsf, C = fa.shape
    else:
        mem, _, _, C = fa.shape
    E, P = coords.shape[0], coords.shape[1]
    PP = P * P

    idx = []
    for f, lvl, wr in zip((fa, fb), levels, wins):
        h, w = hw[0] // lvl, hw[1] // lvl
        rows, hp = banded_shape(h, w)
        nbx = (rows - STAGGER) // hp
        idx.append(_pair_level_index(coords / lvl, mask, jj, hp, nbx, wr,
                                     radius, wi8))
    (fxa, fya, rxoa, row0a, rya, rxa) = idx[0]
    (fxb, fyb, rxob, row0b, ryb, rxb) = idx[1]

    g = lookup_g(gmap, kk, mask)
    slot_g = jnp.where(mask, jj, 0).astype(jnp.int32)
    nlive = jnp.asarray(n_live, jnp.int32).reshape(1)

    if wi8:
        oh = (slot_g[:, None] == jnp.arange(mem)[None, :]).astype(jnp.float32)
        s_a = oh @ scales[0].astype(jnp.float32)
        s_b = oh @ scales[1].astype(jnp.float32)
    else:
        s_a = s_b = jnp.zeros((E,), jnp.float32)   # unused

    BE_ = BE3 if variant == "mono3" else BE2P
    EP = ((E + BE_ - 1) // BE_) * BE_
    if EP != E:
        padn = EP - E
        pad1 = lambda a: jnp.pad(a, [(0, padn)] + [(0, 0)] * (a.ndim - 1))
        slot_g, row0a, row0b = pad1(slot_g), pad1(row0a), pad1(row0b)
        rya, rxa, ryb, rxb = pad1(rya), pad1(rxa), pad1(ryb), pad1(rxb)
        g, s_a, s_b = pad1(g), pad1(s_a), pad1(s_b)

    # one extra zero block: the tail grid step's (inactive) phase-A helpers
    # and the scale lookups at block index nblk must stay in range
    # (mono3 has no lag/tail step but keeps the pad for its issue-ahead)
    nblk = EP // BE_
    padB = lambda a: jnp.pad(a, [(0, BE_)] + [(0, 0)] * (a.ndim - 1))

    win_scr_n = (
        (lambda wr, k: pltpu.VMEM((k, wr * BWIN, C), jnp.int8)) if wi8
        else (lambda wr, k: pltpu.VMEM((k, wr, BWIN, C), jnp.bfloat16)))
    win_scr = lambda wr: win_scr_n(wr, K2P)
    rbuf_scr = [pltpu.VMEM((2, BE2P, wra, BWIN, 16), jnp.bfloat16),
                pltpu.VMEM((2, BE2P, wrb, BWIN, 16), jnp.bfloat16)]
    if variant == "mono3":
        scratch = ([win_scr_n(wra + wrb, K3),
                    pltpu.VMEM((2, wra, BWIN, 16), jnp.float32),
                    pltpu.VMEM((2, wrb, BWIN, 16), jnp.float32)]
                   + [pltpu.SemaphoreType.DMA((K3,))])
        kfn = _kernel_banded_mono3
    elif variant in ("mono", "mono2", "mono4"):
        # one stacked window buffer (level a rows first) + one semaphore
        # array (each slot signaled by both levels' copies)
        scratch = ([win_scr(wra + wrb)] + rbuf_scr
                   + [pltpu.SemaphoreType.DMA((K2P,))])
        kfn = functools.partial(_kernel_banded_mono,
                                step2=(variant in ("mono2", "mono4")),
                                adj2=(variant == "mono4"))
    else:
        scratch = ([win_scr(wra), win_scr(wrb)] + rbuf_scr
                   + [pltpu.SemaphoreType.DMA((K2P,)),
                      pltpu.SemaphoreType.DMA((K2P,))])
        kfn = _kernel_banded_pair2
    if variant == "mono3":
        lag = lambda b, *_: (b, 0)                    # no pipeline lag
        oidx = lambda b, *_: (b, 0, 0)
        grid = (nblk,)
    else:
        lag = lambda b, *_: (jnp.maximum(b - 1, 0), 0)
        oidx = lambda b, *_: (jnp.maximum(b - 1, 0), 0, 0)
        grid = (nblk + 1,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BE_, 16, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),    # g (block b)
            pl.BlockSpec((BE_, 16), lag, memory_space=pltpu.VMEM),  # rya
            pl.BlockSpec((BE_, 16), lag, memory_space=pltpu.VMEM),  # rxa8
            pl.BlockSpec((BE_, 16), lag, memory_space=pltpu.VMEM),  # ryb
            pl.BlockSpec((BE_, 16), lag, memory_space=pltpu.VMEM),  # rxb8
            pl.BlockSpec(memory_space=pl.ANY),        # fa (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # fb (HBM)
        ],
        out_specs=[
            pl.BlockSpec((BE_, 8, 16 * PP), oidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((BE_, 8, 16 * PP), oidx, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    outa, outb = pl.pallas_call(
        functools.partial(kfn, C=C, PP=PP, nblk=nblk,
                          wra=wra, wrb=wrb, wi8=wi8),
        grid_spec=grid_spec,
        # bf16 out: every value already passed through the bf16 R scratch,
        # so f32 out only preserved the dequant-scale product's rounding;
        # bf16 halves the out write + the blend pass's read bandwidth
        out_shape=[jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.bfloat16),
                   jax.ShapeDtypeStruct((EP, 8, 16 * PP), jnp.bfloat16)],
    )(nlive, padB(slot_g), padB(row0a), padB(row0b), padB(s_a), padB(s_b),
      padB(g), rya, rxa, ryb, rxb, fa, fb)

    from .corr import blend_strips
    outs = [blend_strips(outa[:E], fxa, fya, rxoa, mask, PP),
            blend_strips(outb[:E], fxb, fyb, rxob, mask, PP)]
    return jnp.stack(outs, axis=-1).reshape(E, -1)


def corr_pyramid_banded(gmap, banded_pyramid, coords, kk, jj, mask, n_live,
                        hw, radius=3, levels=(1, 4), scales=None, wins=None,
                        variant="split"):
    """Two-level pyramid over banded feature rings; output ordering matches
    ops/corr.corr_pyramid ([dx, dy, pixel, level]). `hw` is the level-0
    feature resolution (H, W) (stride 4 below the input image). `scales`:
    per-level (mem,) f32 dequant scales, required iff the rings are int8
    (band_frame_i8 flat layout). `wins`: per-level DMA window rows
    (default level_win_rows: 16 at lvl 1, 10 at lvl 4). `variant`: kernel
    flavor — "split" (phase-split in-kernel extraction) or "g8c" (compact
    group matmul + XLA extraction).

    A level whose ring is 4-D int8 (pad_frame_l4_i8 layout) dispatches to
    the VMEM-resident kernel instead of the banded-DMA one (the engine
    gates this on VMEM footprint, VOConfig.CORR_L4_RESIDENT).

    variant="pair" runs BOTH levels in one kernel with independent DMA
    pipelines (requires exactly two flat-banded levels)."""
    E = coords.shape[0]
    if scales is None:
        scales = (None,) * len(banded_pyramid)
    if wins is None:
        wins = tuple(level_win_rows(lvl) for lvl in levels)
    if variant in ("pair", "pair2", "mono", "mono2", "mono3", "mono4"):
        assert len(banded_pyramid) == 2, "pair kernel is two-level"
        assert all(fb.ndim == (3 if fb.dtype == jnp.int8 else 4)
                   for fb in banded_pyramid), \
            "pair kernel needs flat-banded rings (no resident layout)"
        for fb, lvl in zip(banded_pyramid, levels):
            want = banded_shape(hw[0] // lvl, hw[1] // lvl)[0]
            got = (fb.shape[1] // BWIN if fb.dtype == jnp.int8
                   else fb.shape[1])
            assert got == want, (
                f"banded ring rows {got} != {want} expected for hw={hw} "
                f"level {lvl}")
        if variant == "pair":
            return corr_pyramid_pair(gmap, banded_pyramid[0],
                                     banded_pyramid[1], coords, kk, jj,
                                     mask, n_live, hw, levels=levels,
                                     radius=radius, scales=scales, wins=wins)
        return corr_pyramid_pair2(gmap, banded_pyramid[0], banded_pyramid[1],
                                  coords, kk, jj, mask, n_live, hw,
                                  levels=levels, radius=radius,
                                  scales=scales, wins=wins, variant=variant)
    # `hw` must be the resolution the rings were built at: a caller passing
    # a mismatched cfg.HT/WD would get wrong row0 addressing and
    # silently-garbage correlations (band_frame rows = nbx*Hp + STAGGER)
    def _resident(fb):
        return fb.dtype == jnp.int8 and fb.ndim == 4
    for fb, lvl in zip(banded_pyramid, levels):
        h, w = hw[0] // lvl, hw[1] // lvl
        if _resident(fb):
            want, got = l4_shape(h, w), tuple(fb.shape[1:3])
            assert got == want, (
                f"resident ring dims {got} != {want} expected for hw={hw} "
                f"level {lvl}")
            continue
        want = banded_shape(h, w)[0]
        got = fb.shape[1] // BWIN if fb.dtype == jnp.int8 else fb.shape[1]
        assert got == want, (
            f"banded ring rows {got} != {want} expected for "
            f"hw={hw} level {lvl}: hw disagrees with the resolution the "
            f"rings were banded at")
    g = lookup_g(gmap, kk, mask)          # shared by both levels
    outs = [
        corr_level_l4_resident(gmap, fb, coords / lvl, kk, jj, mask, n_live,
                               radius=radius, g=g, scale=sc, win_rows=w)
        if _resident(fb) else
        corr_level_banded(gmap, fb, coords / lvl, kk, jj, mask, n_live,
                          hp=banded_shape(hw[0] // lvl, hw[1] // lvl)[1],
                          radius=radius, g=g, scale=sc, win_rows=w,
                          ablate=variant)
        for fb, lvl, sc, w in zip(banded_pyramid, levels, scales, wins)
    ]
    return jnp.stack(outs, axis=-1).reshape(E, -1)
