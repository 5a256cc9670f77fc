"""Golden tests for patchify / corr / graph ops.

Each op is checked against a direct NumPy transcription of the kernel
semantics documented in /root/reference/devo/altcorr/correlation_kernel.cu
and /root/reference/devo/fastba/ba.cpp (the executable specification).
"""
import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.ops import corr as corr_ops
from devo_tpu.ops import graph, patchify


def naive_patchify(fmap, coords, radius):
    """NumPy spec: integer D x D gather + bilinear blend."""
    N, H, W, C = fmap.shape
    M = coords.shape[1]
    D = 2 * radius + 2
    d = 2 * radius + 1
    out = np.zeros((N, M, d, d, C), np.float32)
    for n in range(N):
        for m in range(M):
            x, y = coords[n, m]
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            dx, dy = x - x0, y - y0
            grid = np.zeros((D, D, C), np.float32)
            for a in range(D):
                for b in range(D):
                    i, j = y0 + a - radius, x0 + b - radius
                    if 0 <= i < H and 0 <= j < W:
                        grid[a, b] = fmap[n, i, j]
            out[n, m] = ((1 - dy) * (1 - dx) * grid[:d, :d]
                         + (1 - dy) * dx * grid[:d, 1:]
                         + dy * (1 - dx) * grid[1:, :d]
                         + dy * dx * grid[1:, 1:])
    return out


def test_patchify_matches_naive():
    rng = np.random.default_rng(0)
    fmap = rng.standard_normal((3, 20, 24, 8)).astype(np.float32)
    coords = np.stack([rng.uniform(1, 22, (3, 5)), rng.uniform(1, 18, (3, 5))], -1).astype(np.float32)
    got = np.asarray(patchify.extract_patches(jnp.asarray(fmap), jnp.asarray(coords), 1))
    want = naive_patchify(fmap, coords, 1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_patchify_integer_coords_is_gather():
    rng = np.random.default_rng(1)
    fmap = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    coords = np.stack([rng.integers(2, 14, (2, 6)), rng.integers(2, 14, (2, 6))], -1).astype(np.float32)
    got = np.asarray(patchify.extract_patches(jnp.asarray(fmap), jnp.asarray(coords), 0))
    for n in range(2):
        for m in range(6):
            x, y = coords[n, m].astype(int)
            np.testing.assert_allclose(got[n, m, 0, 0], fmap[n, y, x], atol=1e-6)


def naive_corr(gmap, fmap, coords, kk, jj, radius):
    """NumPy spec of corr_forward_kernel + bilinear blend + permute."""
    E, P = coords.shape[0], coords.shape[1]
    N, H, W, C = fmap.shape
    D = 2 * radius + 2
    d = 2 * radius + 1
    full = np.zeros((E, D, D, P, P), np.float32)  # [dy][dx]
    for e in range(E):
        g = gmap[kk[e]]
        f = fmap[jj[e]]
        for pi in range(P):
            for pj in range(P):
                x, y = coords[e, pi, pj]
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                for a in range(D):
                    for b in range(D):
                        i, j = y0 + a - radius, x0 + b - radius
                        if 0 <= i < H and 0 <= j < W:
                            full[e, a, b, pi, pj] = np.dot(g[pi, pj], f[i, j])
    x = coords[..., 0]
    dx = (x - np.floor(x))[:, None, None]  # (E,1,1,P,P)
    y = coords[..., 1]
    dy = (y - np.floor(y))[:, None, None]
    out = ((1 - dx) * (1 - dy) * full[:, :d, :d]
           + dx * (1 - dy) * full[:, :d, 1:]
           + (1 - dx) * dy * full[:, 1:, :d]
           + dx * dy * full[:, 1:, 1:])
    return out.transpose(0, 2, 1, 3, 4)  # x-offset first (kernel.cu:232)


def test_corr_matches_naive():
    rng = np.random.default_rng(2)
    M, P, C = 7, 3, 16
    N, H, W = 3, 24, 32
    E = 11
    gmap = rng.standard_normal((M, P, P, C)).astype(np.float32)
    fmap = rng.standard_normal((N, H, W, C)).astype(np.float32)
    kk = rng.integers(0, M, E)
    jj = rng.integers(0, N, E)
    cx = rng.uniform(-3, W + 3, (E, 1, 1))
    cy = rng.uniform(-3, H + 3, (E, 1, 1))
    off = np.arange(P) - P // 2
    coords = np.stack([
        np.broadcast_to(cx + off[None, None, :], (E, P, P)),
        np.broadcast_to(cy + off[None, :, None], (E, P, P)),
    ], -1).astype(np.float32)
    got = np.asarray(corr_ops.corr(
        jnp.asarray(gmap), jnp.asarray(fmap), jnp.asarray(coords),
        jnp.asarray(kk, jnp.int32), jnp.asarray(jj, jnp.int32), radius=3))
    want = naive_corr(gmap, fmap, coords, kk, jj, 3)  # (E, dx, dy, pi, pj)
    np.testing.assert_allclose(got, want.reshape(E, -1), atol=1e-4, rtol=1e-4)


def naive_neighbors(kk, jj, mask):
    """NumPy spec of cuda_ba.neighbors (ba.cpp:104-149)."""
    E = len(kk)
    ix = -np.ones(E, np.int64)
    jx = -np.ones(E, np.int64)
    for u in np.unique(kk[mask]):
        idx = [e for e in range(E) if mask[e] and kk[e] == u]
        idx.sort(key=lambda e: jj[e])  # python sort is stable
        for a, e in enumerate(idx):
            ix[e] = idx[a - 1] if a > 0 else -1
            jx[e] = idx[a + 1] if a < len(idx) - 1 else -1
    return ix, jx


def test_neighbors_matches_naive():
    rng = np.random.default_rng(3)
    E = 64
    kk = rng.integers(0, 12, E)
    jj = rng.integers(0, 9, E)
    # dedupe (kk, jj) pairs to make ordering unambiguous
    seen, keep = set(), []
    for e in range(E):
        keep.append((kk[e], jj[e]) not in seen)
        seen.add((kk[e], jj[e]))
    mask = np.array(keep) & (rng.random(E) < 0.85)
    got_ix, got_jx = graph.neighbors(
        jnp.asarray(kk, jnp.int32), jnp.asarray(jj, jnp.int32), jnp.asarray(mask))
    want_ix, want_jx = naive_neighbors(kk, jj, mask)
    np.testing.assert_array_equal(np.asarray(got_ix), want_ix)
    np.testing.assert_array_equal(np.asarray(got_jx), want_jx)


def test_segment_softmax_sum():
    rng = np.random.default_rng(4)
    E, C, S = 32, 8, 5
    vals = rng.standard_normal((E, C)).astype(np.float32)
    logits = rng.standard_normal((E, C)).astype(np.float32)
    seg = rng.integers(0, S, E)
    mask = rng.random(E) < 0.8
    agg, gathered = graph.segment_softmax_sum(
        jnp.asarray(vals), jnp.asarray(logits), jnp.asarray(seg, jnp.int32), S,
        jnp.asarray(mask))
    agg = np.asarray(agg)
    for s in range(S):
        sel = (seg == s) & mask
        if not sel.any():
            np.testing.assert_allclose(agg[s], 0.0, atol=1e-6)
            continue
        w = np.exp(logits[sel] - logits[sel].max(0))
        w = w / w.sum(0)
        np.testing.assert_allclose(agg[s], (vals[sel] * w).sum(0), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gathered), agg[seg], atol=1e-6)


def test_segment_softmax_grad_finite_with_empty_segments():
    """Regression: the divisor guard max(denom, tiny) kept the forward
    finite for empty/underflowed segments but its VJP carries 1/denom^2 ->
    inf, and inf * 0-cotangent = NaN; this poisoned every update-operator
    gradient during training (trainer grad_nonfinite counter)."""
    rng = np.random.default_rng(5)
    E, C, S = 24, 4, 6
    vals = jnp.asarray(rng.standard_normal((E, C)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((E, C)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 3, E), jnp.int32)  # segments 3..5 empty
    mask = jnp.asarray(rng.random(E) < 0.5)

    for fn in (graph.segment_softmax_sum,
               lambda *a: graph.fast_segment_softmax_sum(*a)):
        def loss(v, lg):
            agg, gathered = fn(v, lg, seg, S, mask)
            return jnp.sum(agg) + jnp.sum(gathered)

        gv, gl = jax.grad(loss, argnums=(0, 1))(vals, logits)
        assert bool(jnp.all(jnp.isfinite(gv)))
        assert bool(jnp.all(jnp.isfinite(gl)))
