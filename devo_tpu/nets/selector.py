"""Patch selection strategies.

JAX counterpart of /root/reference/devo/selector.py (`PatchSelector`): pooled
multinomial sampling ("multi", the eval default with a 2x2 grid partition),
pooled top-k, 3x-random (training), and plain random. torch.multinomial
without replacement becomes Gumbel top-k (exactly equivalent in
distribution); the within-window second multinomial becomes a categorical
draw. The padding / offset arithmetic reproduces selector.py:256-286
faithfully, including the unfold(padding=1) window shift.

All functions operate on a score map batch (n, h, w) and return integer
pixel coords (x, y) each of shape (n, ppi).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

KERNEL = 4
GRID = 2


def _pad_amounts(h: int, w: int, use_grid: bool):
    factor = GRID * KERNEL if use_grid else KERNEL
    ph = (factor - h % factor) % factor
    pw = (factor - w % factor) % factor
    top, bottom = (ph // 2, ph - ph // 2)
    left, right = (pw // 2, pw - pw // 2)
    return top, bottom, left, right


def _avg_pool4(s):
    n, h, w = s.shape
    return s.reshape(n, h // KERNEL, KERNEL, w // KERNEL, KERNEL).mean((2, 4))


def _gumbel_topk(key, weights, k):
    """Sample k items without replacement ~ multinomial(weights).

    weights: (..., n) nonnegative. Returns indices (..., k).
    """
    logw = jnp.log(jnp.maximum(weights, 1e-30))
    g = jax.random.gumbel(key, weights.shape, dtype=weights.dtype)
    _, idx = jax.lax.top_k(logw + g, k)
    return idx


def _window_gather(s_padded, idx_flat):
    """Gather the 4x4 unfold(padding=1) window for each pooled cell index.

    Window for cell (cy, cx) covers rows 4cy-1..4cy+2, cols 4cx-1..4cx+2
    (selector.py:138 uses F.unfold(kernel=4, stride=4, padding=1)).
    s_padded: (n, hp, wp); idx_flat: (n, k) into the (hp/4, wp/4) cell grid.
    Returns (n, k, 16) in row-major window order.
    """
    n, hp, wp = s_padded.shape
    w1 = wp // KERNEL
    cy = idx_flat // w1
    cx = idx_flat % w1
    oy, ox = jnp.meshgrid(jnp.arange(KERNEL), jnp.arange(KERNEL), indexing="ij")
    ry = cy[..., None] * KERNEL - 1 + oy.reshape(-1)[None, None, :]  # (n, k, 16)
    rx = cx[..., None] * KERNEL - 1 + ox.reshape(-1)[None, None, :]
    inb = (ry >= 0) & (ry < hp) & (rx >= 0) & (rx < wp)
    flat_idx = jnp.clip(ry, 0, hp - 1) * wp + jnp.clip(rx, 0, wp - 1)
    vals = jax.vmap(lambda f, i: f[i])(s_padded.reshape(n, -1),
                                       flat_idx.reshape(n, -1))
    vals = vals.reshape(ry.shape)
    return jnp.where(inb, vals, 0.0)


def select_multi(key, scores: jnp.ndarray, ppi: int, use_grid: bool = True):
    """Avg-pooled multinomial sampling (selector.py:107-150)."""
    n, h, w = scores.shape
    top, bottom, left, right = _pad_amounts(h, w, use_grid)
    s = jnp.pad(scores, ((0, 0), (top, bottom), (left, right)))
    hp, wp = s.shape[1:]

    avg = _avg_pool4(s)  # (n, h1, w1)
    h1, w1 = avg.shape[1:]
    k1, k2 = jax.random.split(key)

    if use_grid:
        h2, w2 = h1 // GRID, w1 // GRID
        # quadrants: [0]=TL, [1]=TR, [2]=BL, [3]=BR (selector.py:70-81)
        quads = jnp.stack([
            avg[:, :h2, :w2], avg[:, :h2, w2:], avg[:, h2:, :w2], avg[:, h2:, w2:],
        ], axis=1).reshape(n, 4, h2 * w2) + 1e-7
        idx_q = _gumbel_topk(k1, quads, ppi // 4)  # (n, 4, ppi/4)
        qx = idx_q % w2
        qy = idx_q // w2
        qx = qx + jnp.asarray([0, w2, 0, w2])[None, :, None]
        qy = qy + jnp.asarray([0, 0, h2, h2])[None, :, None]
        # interleave quadrants to match (ppi/4, 4) -> flatten ordering
        # (selector.py:130: idx.view(b*n,GRID**2,-1).transpose(-2,-1))
        cell_x = qx.transpose(0, 2, 1).reshape(n, ppi)
        cell_y = qy.transpose(0, 2, 1).reshape(n, ppi)
        idx_full = cell_y * w1 + cell_x
    else:
        idx_full = _gumbel_topk(k1, avg.reshape(n, -1) + 1e-7, ppi)
        cell_x = idx_full % w1
        cell_y = idx_full // w1

    windows = _window_gather(s, idx_full) + 1e-7  # (n, ppi, 16)
    off = jax.random.categorical(k2, jnp.log(windows))  # (n, ppi)
    x = KERNEL * cell_x + off % KERNEL
    y = KERNEL * cell_y + off // KERNEL

    x = jnp.clip(x - left, 0, w - 1)
    y = jnp.clip(y - top, 0, h - 1)
    return x, y


def select_topk(scores: jnp.ndarray, ppi: int, use_grid: bool = True):
    """Pooled top-k sampling (selector.py:152-192)."""
    n, h, w = scores.shape
    top, bottom, left, right = _pad_amounts(h, w, use_grid)
    s = jnp.pad(scores, ((0, 0), (top, bottom), (left, right)))
    hp, wp = s.shape[1:]
    h1, w1 = hp // KERNEL, wp // KERNEL

    blocks = s.reshape(n, h1, KERNEL, w1, KERNEL).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(n, h1, w1, KERNEL * KERNEL)
    max_scores = blocks.max(-1)
    max_idx = blocks.argmax(-1)  # offset within 4x4 window (no padding shift here)

    if use_grid:
        h2, w2 = h1 // GRID, w1 // GRID
        quads = jnp.stack([
            max_scores[:, :h2, :w2], max_scores[:, :h2, w2:],
            max_scores[:, h2:, :w2], max_scores[:, h2:, w2:],
        ], axis=1).reshape(n, 4, h2 * w2)
        _, idx_q = jax.lax.top_k(quads, ppi // 4)
        qx = idx_q % w2 + jnp.asarray([0, w2, 0, w2])[None, :, None]
        qy = idx_q // w2 + jnp.asarray([0, 0, h2, h2])[None, :, None]
        cell_x = qx.transpose(0, 2, 1).reshape(n, ppi)
        cell_y = qy.transpose(0, 2, 1).reshape(n, ppi)
        idx_full = cell_y * w1 + cell_x
    else:
        _, idx_full = jax.lax.top_k(max_scores.reshape(n, -1), ppi)
        cell_x = idx_full % w1
        cell_y = idx_full // w1

    off = jnp.take_along_axis(max_idx.reshape(n, -1), idx_full, axis=1)
    x = KERNEL * cell_x + off % KERNEL
    y = KERNEL * cell_y + off // KERNEL
    x = jnp.clip(x - left, 0, w - 1)
    y = jnp.clip(y - top, 0, h - 1)
    return x, y


def select_nms(scores: jnp.ndarray, ppi: int, use_grid: bool = False):
    """Pooled NMS sampling (selector.py:194-254).

    The reference runs torchvision batched_nms over 3x3 boxes with IoU 0.4 —
    for 3-px boxes that threshold suppresses exactly the 4-neighborhood of a
    kept peak ((3-|dx|)(3-|dy|) > 5.1). Greedy selection becomes a
    fixed-length fori_loop of argmax + neighborhood suppression, which stays
    on device (torchvision's sequential NMS has no TPU analogue).
    """
    n, h, w = scores.shape
    top, bottom, left, right = _pad_amounts(h, w, use_grid)
    s = jnp.pad(scores, ((0, 0), (top, bottom), (left, right)))
    hp, wp = s.shape[1:]
    h1, w1 = hp // KERNEL, wp // KERNEL

    blocks = s.reshape(n, h1, KERNEL, w1, KERNEL).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(n, h1, w1, KERNEL * KERNEL)
    max_scores = blocks.max(-1)           # (n, h1, w1) pooled peaks
    max_idx = blocks.argmax(-1)
    # peak coordinates in padded pixel space
    py = (jnp.arange(h1)[None, :, None] * KERNEL + max_idx // KERNEL)
    px = (jnp.arange(w1)[None, None, :] * KERNEL + max_idx % KERNEL)

    def body(i, carry):
        sc, xs, ys = carry
        flat = sc.reshape(n, -1)
        pick = jnp.argmax(flat, axis=-1)           # (n,)
        cy, cx = pick // w1, pick % w1
        xs = xs.at[:, i].set(px[jnp.arange(n), cy, cx])
        ys = ys.at[:, i].set(py[jnp.arange(n), cy, cx])
        # suppress the 4-neighborhood (IoU > 0.4 for 3x3 boxes)
        gy = jnp.arange(h1)[None, :, None]
        gx = jnp.arange(w1)[None, None, :]
        dist = jnp.abs(gy - cy[:, None, None]) + jnp.abs(gx - cx[:, None, None])
        sc = jnp.where(dist <= 1, -jnp.inf, sc)
        return sc, xs, ys

    xs = jnp.zeros((n, ppi), jnp.int32)
    ys = jnp.zeros((n, ppi), jnp.int32)
    _, xs, ys = jax.lax.fori_loop(0, ppi, body, (max_scores, xs, ys))
    x = jnp.clip(xs - left, 0, w - 1)
    y = jnp.clip(ys - top, 0, h - 1)
    return x, y


def select_random(key, n: int, h: int, w: int, ppi: int):
    """Uniform random selection (enet.py:144-147)."""
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (n, ppi), 1, w - 1)
    y = jax.random.randint(ky, (n, ppi), 1, h - 1)
    return x, y


def event_gradient(voxels: jnp.ndarray) -> jnp.ndarray:
    """Event-gradient selection map (enet.py:115-121, `__event_gradient`):
    sum the voxel bins, finite-difference gradient magnitude, 4x4 average
    pool (torch avg_pool2d floor semantics: trailing rows/cols dropped).

    voxels (n, H, W, bins) -> (n, (H-1)//4, (W-1)//4).
    """
    im = voxels.sum(-1)                                   # (n, H, W)
    dx = im[:, :-1, 1:] - im[:, :-1, :-1]
    dy = im[:, 1:, :-1] - im[:, :-1, :-1]
    g = jnp.sqrt(dx * dx + dy * dy)                       # (n, H-1, W-1)
    n, gh, gw = g.shape
    h4, w4 = gh // 4, gw // 4
    g = g[:, :h4 * 4, :w4 * 4].reshape(n, h4, 4, w4, 4).mean((2, 4))
    return g


def select_3xrandom(key, weights: jnp.ndarray, ppi: int):
    """PatchSelector('3xrandom') (selector.py:92-105): 3*ppi uniform
    candidates over the FULL map, keep the ppi with the largest weights,
    +1 shift on the returned coords. Used by the GRADIENT selector in
    training (enet.py:135-137)."""
    n, h, w = weights.shape
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (n, 3 * ppi), 0, w)
    y = jax.random.randint(ky, (n, 3 * ppi), 0, h)
    sc = gather_scores(weights, x, y)
    _, order = jax.lax.top_k(sc, ppi)
    x_sel = jnp.take_along_axis(x, order, 1) + 1
    y_sel = jnp.take_along_axis(y, order, 1) + 1
    return x_sel, y_sel


def gather_scores(scores: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Score values at integer coords (altcorr.patchify radius 0 on the score
    map, enet.py:157/169)."""
    n, h, w = scores.shape
    idx = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
    return jax.vmap(lambda f, i: f[i])(scores.reshape(n, -1), idx)


def select_training_scorer(key, scores: jnp.ndarray, ppi: int):
    """Training-time selection (enet.py:152-164): 3x random candidates,
    keep the ppi highest-scoring; returns coords (+1 shift) and their scores."""
    n, h, w = scores.shape
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (n, 3 * ppi), 0, w - 2)
    y = jax.random.randint(ky, (n, 3 * ppi), 0, h - 2)
    sc = gather_scores(scores, x, y)
    _, order = jax.lax.top_k(sc, ppi)  # largest ppi (reference sorts ascending, takes tail)
    x_sel = jnp.take_along_axis(x, order, 1) + 1
    y_sel = jnp.take_along_axis(y, order, 1) + 1
    s_sel = jnp.take_along_axis(sc, order, 1)
    return x_sel, y_sel, s_sel
