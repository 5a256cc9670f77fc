"""Correctness + timing of the per-edge-DMA Pallas corr kernel on real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.ops import corr as corr_ops
from devo_tpu.ops import corr_pallas

E = 20480
MEM, H, W, C = 32, 120, 160, 128
P, PP = 3, 9
M = 96


def main():
    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.standard_normal((MEM, H, W, C)), jnp.bfloat16)
    gmap = jnp.asarray(rng.standard_normal((MEM * M, P, P, C)), jnp.bfloat16)
    kk = jnp.asarray(rng.integers(0, MEM * M, E), jnp.int32)
    jj = jnp.asarray(rng.integers(0, MEM, E), jnp.int32)
    x = rng.uniform(8, W - 8, (E, 1)) + rng.uniform(-1.2, 1.2, (E, PP))
    y = rng.uniform(8, H - 8, (E, 1)) + rng.uniform(-1.2, 1.2, (E, PP))
    coords = jnp.asarray(np.stack([x, y], -1).reshape(E, P, P, 2), jnp.float32)
    mask = jnp.asarray(np.arange(E) < 6144)

    fn = jax.jit(lambda g, f, c, k, j, m: corr_pallas.corr_level_pallas(
        g, f, c, k, j, m, radius=3))
    out = fn(gmap, fmap, coords, kk, jj, mask)
    jax.block_until_ready(out)
    print("compiled; output", out.shape)

    # correctness vs the naive gather reference (first 512 edges)
    S = 512
    ref = corr_ops.corr(gmap, fmap, coords[:S], kk[:S], jj[:S], radius=3)
    got = np.asarray(out[:S])
    refn = np.asarray(ref) * np.asarray(mask[:S])[:, None]
    err = np.abs(got - refn).max()
    den = np.abs(refn).max()
    print(f"max abs err vs reference: {err:.4f} (scale {den:.1f}, "
          f"rel {err / den:.2e})")

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        gmap = gmap + jnp.mean(out).astype(jnp.bfloat16) * 1e-12
        out = fn(gmap, fmap, coords, kk, jj, mask)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"corr_level_pallas(DMA): {dt:.2f} ms ({dt / E * 1e3:.2f} us/edge)")


if __name__ == "__main__":
    main()
