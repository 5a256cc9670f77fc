"""Time the Pallas correlation kernel on the real TPU (dependent chains)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    jj = jnp.asarray(np.sort(rng.integers(0, 20, E)), jnp.int32)
    x = rng.uniform(8, W - 8, (E, PP)).astype(np.float32)
    y = rng.uniform(8, H - 8, (E, PP)).astype(np.float32)
    coords = jnp.asarray(np.stack([x, y], -1).reshape(E, P, P, 2))
    mask = jnp.asarray(np.arange(E) < 6144)

    fn = jax.jit(lambda g, f, c, k, j, m: corr_pallas.corr_level_pallas(
        g, f, c, k, j, m, radius=3))
    out = fn(gmap, fmap, coords, kk, jj, mask)
    jax.block_until_ready(out)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        gmap = gmap + jnp.mean(out).astype(jnp.bfloat16) * 1e-12
        out = fn(gmap, fmap, coords, kk, jj, mask)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"corr_level_pallas (E={E}, live=6144): {dt:.2f} ms "
          f"({dt / E * 1e3:.2f} us/edge)")


if __name__ == "__main__":
    main()
