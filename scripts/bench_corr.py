"""Sub-time corr_window stages on the real TPU chip.

Measurement rules (PERF_NOTES.md): the axon runtime elides repeated identical
dispatches, so every timed call runs a DEPENDENT CHAIN — each iteration's
input is perturbed by the previous output.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.ops import corr as corr_ops

E = 20480          # bucket capacity seen in the steady-state bench
M_LIVE = 6144
N, H, W, C = 32, 120, 160, 128
P, PP = 3, 9
WIN, WINX, PAD = 16, 24, 12
Hp, Wp = H + 2 * PAD, W + 2 * PAD


def chain_time(fn, args, feedback, iters=8, name=""):
    """Time fn over a dependent chain: args[0] is perturbed by the previous
    output through `feedback(out) -> scalar`."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        eps = jnp.asarray(feedback(out), args[0].dtype)
        args = (args[0] + eps,) + args[1:]
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    gmap = jnp.asarray(rng.standard_normal((N * 96, P, P, C)), jnp.bfloat16)
    kk = jnp.asarray(rng.integers(0, N * 96, E), jnp.int32)
    jj = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    x = rng.uniform(8, W - 8, (E, PP)).astype(np.float32)
    y = rng.uniform(8, H - 8, (E, PP)).astype(np.float32)
    coords = jnp.asarray(np.stack([x, y], -1).reshape(E, P, P, 2))
    mask = jnp.asarray(np.arange(E) < M_LIVE)

    # ---------------- full corr_window
    f_full = jax.jit(functools.partial(corr_ops.corr_window, radius=3))
    chain_time(f_full, (gmap, fmap, coords, kk, jj, mask),
               lambda o: jnp.mean(o) * 1e-12, name="corr_window full")

    # ---------------- stage 1: pad + window gather only
    @jax.jit
    def gather_only(gmap, fmap, coords, kk, jj, mask):
        xf = jnp.floor(coords[..., 0].reshape(E, PP)).astype(jnp.int32)
        yf = jnp.floor(coords[..., 1].reshape(E, PP)).astype(jnp.int32)
        x0 = jnp.clip(jnp.min(xf, axis=1) - 3 + PAD, 0, Wp - WINX)
        x0 = (x0 // 8) * 8
        y0 = jnp.clip(jnp.min(yf, axis=1) - 3 + PAD, 0, Hp - WIN)
        fmap_p = jnp.pad(fmap, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        starts = jnp.stack([jj, y0, x0], axis=-1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        win = jax.lax.gather(fmap_p, starts, dnums,
                             slice_sizes=(1, WIN, WINX, C),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(win.astype(jnp.float32), axis=(1, 2, 3))

    chain_time(gather_only, (gmap, fmap, coords, kk, jj, mask),
               lambda o: jnp.mean(o) * 1e-12, name="window gather only")

    # ---------------- stage 2: gather + batched dot
    @jax.jit
    def gather_dot(gmap, fmap, coords, kk, jj, mask):
        xf = jnp.floor(coords[..., 0].reshape(E, PP)).astype(jnp.int32)
        yf = jnp.floor(coords[..., 1].reshape(E, PP)).astype(jnp.int32)
        x0 = (jnp.clip(jnp.min(xf, axis=1) - 3 + PAD, 0, Wp - WINX) // 8) * 8
        y0 = jnp.clip(jnp.min(yf, axis=1) - 3 + PAD, 0, Hp - WIN)
        fmap_p = jnp.pad(fmap, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        starts = jnp.stack([jj, y0, x0], axis=-1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        win = jax.lax.gather(fmap_p, starts, dnums,
                             slice_sizes=(1, WIN, WINX, C),
                             mode=jax.lax.GatherScatterMode.CLIP)
        g = gmap.reshape(-1, PP, C)[kk]
        Rw = jax.lax.dot_general(
            g, win.reshape(E, WIN * WINX, C), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(Rw, axis=(1, 2))

    chain_time(gather_dot, (gmap, fmap, coords, kk, jj, mask),
               lambda o: jnp.mean(o) * 1e-12, name="gather + batched dot")

    # ---------------- stage 3: dot alone on pre-gathered windows
    win0 = jnp.asarray(rng.standard_normal((E, WIN * WINX, C)), jnp.bfloat16)
    g0 = jnp.asarray(rng.standard_normal((E, PP, C)), jnp.bfloat16)

    @jax.jit
    def dot_only(g, win):
        Rw = jax.lax.dot_general(
            g, win, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(Rw, axis=(1, 2))

    chain_time(dot_only, (g0, win0), lambda o: (jnp.mean(o) * 1e-12).astype(jnp.bfloat16),
               name="batched dot only")

    # ---------------- stage 4: select-extraction + blend on fake Rp
    Rp0 = jnp.asarray(rng.standard_normal((E, PP, WIN, WINX)), jnp.float32)
    fx = jnp.asarray(rng.random((E, PP)), jnp.float32)
    ry = jnp.asarray(rng.integers(0, 9, (E, PP)), jnp.int32)
    rx8 = jnp.asarray(rng.integers(0, 2, (E, PP)), jnp.int32)
    rxo = jnp.asarray(rng.integers(0, 8, (E, PP)), jnp.int32)

    @jax.jit
    def extract_blend(Rp, fx, ry, rx8, rxo, mask):
        strips = []
        for p in range(PP):
            v = Rp[:, p]
            s = jnp.zeros((E, 8, WIN), jnp.float32)
            sel_x = (rx8[:, p] == 0)[:, None, None]
            for k in range(WIN - 8 + 1):
                cand = jnp.where(sel_x, v[:, k:k + 8, :WIN], v[:, k:k + 8, 8:8 + WIN])
                s = jnp.where((ry[:, p] == k)[:, None, None], cand, s)
            strips.append(s)
        strip = jnp.concatenate(strips, axis=-1)
        return corr_ops.blend_strips(strip, fx, fx, rxo, mask, PP)

    chain_time(extract_blend, (Rp0, fx, ry, rx8, rxo, mask),
               lambda o: jnp.mean(o) * 1e-12, name="select-extract + blend")

    # ---------------- alt: one fused (E*PP,1,C) x windows matmul layout
    @jax.jit
    def dot_flat(g, win):
        # contract each pixel row separately: (E*PP, C) . (E, 384, C)
        # via one big (E, PP, C) x (E, C, 384) batch is what dot_only does;
        # compare against folding PP into the batch with repeated win
        R = jax.lax.dot_general(
            g.reshape(E * PP, 1, C),
            jnp.repeat(win, PP, axis=0),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(R, axis=(1, 2))

    # skipped by default (jnp.repeat of 2GB); kept for reference

    # ---------------- alt: 8x8 per-pixel window gather (smaller reads)
    @jax.jit
    def gather_pp(fmap, coords, jj):
        xf = jnp.floor(coords[..., 0].reshape(E, PP)).astype(jnp.int32)
        yf = jnp.floor(coords[..., 1].reshape(E, PP)).astype(jnp.int32)
        fmap_p = jnp.pad(fmap, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        starts = jnp.stack([jnp.repeat(jj, PP),
                            (yf - 3 + PAD).reshape(-1),
                            (xf - 3 + PAD).reshape(-1)], axis=-1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        win = jax.lax.gather(fmap_p, starts, dnums, slice_sizes=(1, 8, 8, C),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(win.astype(jnp.float32), axis=(1, 2, 3))

    chain_time(gather_pp, (fmap, coords, jj),
               lambda o: jnp.mean(o) * 1e-12, name="per-pixel 8x8 gather")


if __name__ == "__main__":
    main()
