"""Bisect the g8c compile stall: compile (a) the Pallas kernel alone
(compact surface out, no extraction) and (b) extract_blend_g8 alone, each
timed separately on the real TPU, so a pathological compile can be pinned
to Mosaic vs the XLA select graph. Usage: bisect_g8c_compile.py {kernel,extract}
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    stage = sys.argv[1]
    from devo_tpu.ops import corr_pallas as cp

    MEM, C = 32, 128
    H0, W0 = 120, 160
    E = 10240
    LIVE = 6912
    rng = np.random.default_rng(0)
    wr = 16

    if stage == "extract":
        NG = E // 8
        R8 = jnp.asarray(rng.standard_normal((NG, wr * cp.BWIN, 128)),
                         jnp.bfloat16)
        ry = jnp.asarray(rng.integers(0, wr - 7, (E, 16)), jnp.int32)
        rx8 = jnp.asarray(rng.integers(0, 2, (E, 16)), jnp.int32)
        rxo = jnp.asarray(rng.integers(0, 8, (E, 16)), jnp.int32)
        fx = jnp.asarray(rng.random((E, 16)), jnp.float32)
        fy = jnp.asarray(rng.random((E, 16)), jnp.float32)
        mask = jnp.arange(E) < LIVE
        scale_e = jnp.ones((E,), jnp.float32)
        fn = jax.jit(lambda *a: cp.extract_blend_g8(*a, PP=16, wr=wr,
                                                    scale_e=scale_e))
        args = (R8, ry, rx8, rxo, fx, fy, mask)
    else:
        nbx, hp = cp.banded_shape(H0, W0)
        q, s = cp.band_frame_i8(jnp.asarray(
            rng.standard_normal((H0, W0, C)), jnp.float32))
        fmap_b = jnp.broadcast_to(q, (MEM,) + q.shape)
        scale = jnp.broadcast_to(s, (MEM,))
        gmap = jnp.asarray(rng.standard_normal((E, 4, 4, C)) * 0.1,
                           jnp.float32)
        coords = jnp.stack([
            jnp.asarray(rng.uniform(8, W0 - 8, (E,)), jnp.float32),
            jnp.asarray(rng.uniform(8, H0 - 8, (E,)), jnp.float32),
        ], -1)[:, None, None, :] + jnp.zeros((E, 4, 4, 2), jnp.float32)
        kk = jnp.arange(E, dtype=jnp.int32) % (MEM * 4)
        jj = jnp.asarray(rng.integers(0, MEM, (E,)), jnp.int32)
        mask = jnp.arange(E) < LIVE

        def run(g, fb, c, k, j, m, sc):
            # kernel-only: reuse corr_level_banded's g8c branch but sum the
            # compact surface instead of extracting (measures Mosaic alone)
            out = cp.corr_level_banded(g, fb, c, k, j, m, LIVE, hp=hp,
                                       scale=sc, ablate="g8c_kernel_only")
            return out
        fn = jax.jit(run)
        args = (gmap, fmap_b, coords, kk, jj, mask, scale)

    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"{stage}: compiled+ran in {time.time() - t0:.1f}s "
          f"out={np.asarray(out).ravel()[:2]}")
    o = out
    t0 = time.time()
    NIT = 20
    for _ in range(NIT):
        if stage == "extract":
            a2 = (args[0] + (o.ravel()[0] * 1e-12).astype(args[0].dtype),
                  ) + args[1:]
        else:
            a2 = (args[0] + (o.ravel()[0] * 1e-12).astype(args[0].dtype),
                  ) + args[1:]
        o = fn(*a2)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / NIT
    print(f"{stage}: chained {dt * 1e3:.2f} ms ({dt / LIVE * 1e6:.2f} "
          f"us/live-edge, 1 level)")


if __name__ == "__main__":
    main()
