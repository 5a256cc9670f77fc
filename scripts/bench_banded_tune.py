"""Tune the banded corr kernel's pipeline knobs (IF/K/NSC/BE) against a
realistic engine-shaped workload.

Calls the PRODUCTION corr_level_banded (no kernel copy to drift out of
date). Inputs drift every iteration (coords/slots change like a real
tracking step) and the timing chain threads the output back into gmap, so
the platform cannot elide repeated dispatches. Expectation from the engine
profile: ~1 us/live-edge/level at stock knobs.

Usage: bench_banded_tune.py [IF K NSC BE [E LIVE [JJMODE DRIFT [ABLATE]]]]
  JJMODE: cycle13 (engine-like) | random | const
  DRIFT:  1 (addresses change per iter) | 0 (warm)
  ABLATE: full | nomm (DMA only) | noext (DMA+matmul) | noDMA
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.ops import corr_pallas

    if len(sys.argv) >= 5:
        corr_pallas.IF = int(sys.argv[1])
        corr_pallas.K = int(sys.argv[2])
        corr_pallas.NSC = int(sys.argv[3])
        corr_pallas.BE = int(sys.argv[4])
    E = int(sys.argv[5]) if len(sys.argv) > 5 else 10240
    LIVE = int(sys.argv[6]) if len(sys.argv) > 6 else 6912
    H, W, C = 120, 160, 128          # level-1 feature resolution (480x640/4)
    MEM, MR = 32, 32 * 96

    rng = np.random.default_rng(0)
    fmap = [jnp.asarray(rng.standard_normal((H, W, C)) * 0.1, jnp.bfloat16)
            for _ in range(MEM)]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    hp = corr_pallas.banded_shape(H, W)[1]
    gmap = jnp.asarray(rng.standard_normal((MR, 3, 3, C)) * 0.1, jnp.bfloat16)

    # engine-like edge set: sorted by patch, slots cycling a ~13-frame
    # window, patch centers scattered over the image
    jjmode = sys.argv[7] if len(sys.argv) > 7 else "cycle13"
    drift = (sys.argv[8] != "0") if len(sys.argv) > 8 else True
    ablate = sys.argv[9] if len(sys.argv) > 9 else "full"
    if len(sys.argv) > 10 and sys.argv[10] == "bf16":
        corr_pallas.SC_DTYPE = jnp.bfloat16
    kk = jnp.asarray(np.sort(rng.integers(0, MR, E)), jnp.int32)
    jj = {
        "cycle13": np.arange(E) % 13,
        "random": rng.integers(0, 13, E),
        "const": np.zeros(E, np.int64),
    }[jjmode]
    jj = jnp.asarray(jj, jnp.int32)
    cx = rng.uniform(8, W - 8, (E, 1, 1))
    cy = rng.uniform(8, H - 8, (E, 1, 1))
    gx, gy = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="xy")
    coords0 = np.stack([cx + gx, cy + gy], -1).astype(np.float32)
    mask = jnp.arange(E) < LIVE

    # ONE dispatch per iteration: drift + feedback live inside the jit
    # (eager glue ops between calls cost ~30 ms dispatch each through the
    # axon tunnel and would swamp the kernel, PERF_NOTES.md)
    @jax.jit
    def fn(c, prev, i, g, fb, kk, jj):
        c = (c + (i % 3 - 1).astype(jnp.float32) if drift else c) \
            + prev[0, 0] * 1e-12
        out = corr_pallas.corr_level_banded(
            g, fb, c, kk, jj, mask, n_live=LIVE, hp=hp, ablate=ablate)
        return c, out

    coords = jnp.asarray(coords0)
    coords, out = fn(coords, jnp.zeros((E, 441), jnp.float32),
                     np.int32(0), gmap, fmap_b, kk, jj)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        coords, out = fn(coords, out, np.int32(i), gmap, fmap_b, kk, jj)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"IF={corr_pallas.IF} K={corr_pallas.K} NSC={corr_pallas.NSC} "
          f"BE={corr_pallas.BE} E={E} LIVE={LIVE} jj={jjmode} "
          f"drift={int(drift)} {ablate}: {dt:8.3f} ms "
          f"({dt / LIVE * 1e3:6.3f} us/live-edge)")


if __name__ == "__main__":
    main()
