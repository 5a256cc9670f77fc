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
import numpy as np
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


def corr_window(
    gmap: jnp.ndarray,    # (M, P, P, C)
    fmap: jnp.ndarray,    # (N, H, W, C)
    coords: jnp.ndarray,  # (E, P, P, 2)
    kk: jnp.ndarray,
    jj: jnp.ndarray,
    mask: jnp.ndarray,
    radius: int = 3,
) -> jnp.ndarray:
    """Window-gather correlation: same output as corr(), restructured for
    TPU gather economics.

    The naive form gathers E*P^2*(2r+2)^2 single feature rows (~35M rows per
    level at full capacity — gather-row-overhead bound). Here each edge
    fetches ONE contiguous (16, 24, C) window slice covering all of its tap
    grids (8x fewer, 400x larger gather rows), every window x patch-pixel
    product becomes a batched MXU contraction, and the per-pixel 8x8 tap
    blocks + bilinear blend reduce to static-slice selects (ry has 9 possible
    values, the aligned rx base 2, the residual x offset 8 — all enumerable).

    Window coverage caveat matches the Pallas kernel: patch spread > 8 px
    clamps the farthest taps (degenerate edges only; BA residual-gates them).
    """
    N, H, W, C = fmap.shape
    E, P = coords.shape[0], coords.shape[1]
    PP = P * P
    R = radius
    d = 2 * radius + 1
    WIN, WINX, PAD = 16, 24, 12

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
    x0 = (x0 // 8) * 8
    y0 = jnp.clip(jnp.min(yf, axis=1) - R + PAD, 0, Hp - WIN)
    rx = jnp.clip(xf - R + PAD - x0[:, None], 0, WINX - 9)
    ry = jnp.clip(yf - R + PAD - y0[:, None], 0, WIN - 8)
    rx8 = rx // 8            # aligned strip base: 0 or 1 (x8)
    rxo = rx - rx8 * 8

    fdt = fmap.dtype
    fmap_p = jnp.pad(fmap, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))

    # one strided window slice per edge
    starts = jnp.stack([jj.astype(jnp.int32), y0, x0], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    win = jax.lax.gather(
        fmap_p, starts, dnums, slice_sizes=(1, WIN, WINX, C),
        mode=jax.lax.GatherScatterMode.CLIP)             # (E, 16, 24, C)

    from .lookup import lookup
    g = lookup(gmap.reshape(-1, PP * C), kk).reshape(E, PP, C)
    # batched contraction on the MXU: all window x patch-pixel products.
    # output laid out (E, PP, 384) — keeping the 384 window positions on
    # lanes avoids the ~14x tile padding an (E, 16, 24, PP) layout would pay
    Rw = jax.lax.dot_general(
        g, win.reshape(E, WIN * WINX, C),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (E, PP, 384)
    Rp = Rw.reshape(E, PP, WIN, WINX)

    # per-pixel strip: rows [ry, ry+8), cols [8*rx8, 8*rx8+16) — both from
    # small enumerable sets, so STATIC slices + selects only (a dynamic
    # lane-dim gather here measures ~1000x slower than the select chain)
    s = jnp.zeros((E, PP, 8, WIN), jnp.float32)
    sel_x = (rx8 == 0)[:, :, None, None]
    for k in range(WIN - 8 + 1):                         # ry in [0, 8]
        cand = jnp.where(sel_x, Rp[:, :, k:k + 8, :WIN],
                         Rp[:, :, k:k + 8, 8:8 + WIN])
        s = jnp.where((ry == k)[:, :, None, None], cand, s)
    strip = s.transpose(0, 2, 1, 3)                      # (E, 8, PP, 16)

    return blend_strips(strip, fx, fy, rxo, mask, PP)


def blend_strips(strip, fx, fy, rxo, mask, PP: int) -> jnp.ndarray:
    """Bilinear blend of per-pixel tap strips (shared by corr_window and the
    Pallas kernel's post-processing).

    strip: (E, 8, PP, 16) integer taps; pixel p's 8x16 block starts at its
    aligned base, the true tap origin is rxo in [0, 8). Static slices +
    8-way rxo select only — no lane gathers. Returns (E, 49*PP) ordered
    [dx, dy, pixel] (correlation_kernel.cu:232 x-major flattening).
    """
    E = strip.shape[0]
    if strip.ndim == 3:                                  # (E, 8, 16*PP)
        strip = strip.reshape(E, 8, PP, 16)
    fy_b = fy[:, None, :, None]                          # (E, 1, PP, 1)
    fx_b = fx[:, None, :, None]
    # y-blend: (E, 7, PP, 16)
    Y = (1 - fy_b) * strip[:, :7] + fy_b * strip[:, 1:8]
    out = jnp.zeros((E, 7, PP, 7), jnp.float32)
    for k in range(8):                                   # rxo in [0, 8)
        cand = (1 - fx_b) * Y[..., k:k + 7] + fx_b * Y[..., k + 1:k + 8]
        out = jnp.where((rxo == k)[:, None, :, None], cand, out)
    out = jnp.where(mask[:, None, None, None], out, 0.0)
    # [dy, p, dx] -> flat [dx, dy, p]
    return out.transpose(0, 3, 1, 2).reshape(E, 7 * 7 * PP)


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


# ------------------------------------------------- training backward dropout

def _pyramid_fwd_only(gmap, pyramid, coords, kk, jj, radius, levels):
    """corr_pyramid with the feature-map path differentiable and the coord
    path severed — the reference's CUDA backward computes fmap1/fmap2 grads
    only and returns None for coords (correlation.py:27-30)."""
    return corr_pyramid(gmap, tuple(pyramid), jax.lax.stop_gradient(coords),
                        kk, jj, radius=radius, levels=levels)


def corr_pyramid_train(
    gmap: jnp.ndarray,
    pyramid,
    coords: jnp.ndarray,
    kk: jnp.ndarray,
    jj: jnp.ndarray,
    key: jax.Array,
    dropout: float = 0.2,
    radius: int = 3,
    levels=(1, 4),
) -> jnp.ndarray:
    """corr_pyramid with the reference's training backward semantics
    (/root/reference/devo/altcorr/correlation.py:18-30, wired with
    dropout=0.2 at enet.py:204):

      * the backward pass keeps a Bernoulli(dropout) subset of EDGES —
        dropped edges contribute NO gradient to gmap or the pyramid
        (no 1/p rescale: the expected gradient is dropout * full);
      * coords receive no gradient through the correlation (the CUDA
        backward returns None for them);
      * the forward value is exactly corr_pyramid's.

    `key` makes the edge subset explicit (the reference draws from the
    global CUDA RNG); dropout >= 1 disables the subsetting but keeps the
    severed coord path.
    """
    if dropout is None or dropout >= 1.0:
        return _pyramid_fwd_only(gmap, pyramid, coords, kk, jj, radius, levels)

    pyramid = tuple(pyramid)
    # the Bernoulli subset is drawn in the FORWARD and threaded through the
    # custom_vjp as a float 0/1 primal (a key closed over in the bwd
    # closure would leak a BatchTracer under vmap-of-grad — the per-sample
    # training path)
    keep = (jax.random.uniform(key, (kk.shape[0],)) < dropout
            ).astype(coords.dtype)

    @jax.custom_vjp
    def _corr(gmap, pyramid, coords, keep):
        return _pyramid_fwd_only(gmap, pyramid, coords, kk, jj, radius, levels)

    def _fwd(gmap, pyramid, coords, keep):
        return _corr(gmap, pyramid, coords, keep), (gmap, pyramid, coords,
                                                    keep)

    def _bwd(res, ct):
        gmap_r, pyramid_r, coords_r, keep_r = res
        ct = ct * keep_r[:, None]
        _, vjp = jax.vjp(
            lambda g, p: _pyramid_fwd_only(g, p, coords_r, kk, jj,
                                           radius, levels),
            gmap_r, pyramid_r)
        d_gmap, d_pyr = vjp(ct)
        return d_gmap, d_pyr, jnp.zeros_like(coords_r), jnp.zeros_like(keep_r)

    _corr.defvjp(_fwd, _bwd)
    return _corr(gmap, pyramid, coords, keep)
