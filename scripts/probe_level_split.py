"""Per-level cost split of the banded corr pyramid on real TPU: times
level-1 (wr=16) and level-4 (wr=10) corr_level_banded separately so the
level-4 share (DMA descriptors it would save if VMEM-resident) is a
measured number, not a byte-count guess. PERF_NOTES r03."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from devo_tpu.ops import corr_pallas as cp

    MEM, C = 32, 128
    H0, W0 = 120, 160
    E = 10240
    LIVE = 6912
    rng = np.random.default_rng(0)

    gmap = jnp.asarray(rng.standard_normal((MEM * 96, 4, 4, C)) * 0.1,
                       jnp.bfloat16)
    kk = jnp.asarray(rng.integers(0, MEM * 96, (E,)), jnp.int32)
    jj = jnp.asarray(rng.integers(0, MEM, (E,)), jnp.int32)
    mask = jnp.arange(E) < LIVE

    rings, scales = {}, {}
    for lvl in (1, 4):
        H, W = H0 // lvl, W0 // lvl
        q, s = cp.band_frame_i8(jnp.asarray(
            rng.standard_normal((H, W, C)), jnp.float32))
        rings[lvl] = jnp.stack([q] * MEM)
        scales[lvl] = jnp.ones((MEM,), jnp.float32)
    coords = jnp.stack([
        jnp.asarray(rng.uniform(8, W0 - 8, (E,)), jnp.float32),
        jnp.asarray(rng.uniform(8, H0 - 8, (E,)), jnp.float32),
    ], -1)[:, None, None, :] + jnp.zeros((E, 4, 4, 2), jnp.float32)

    # the dependent chain runs INSIDE one jit: a host-side chain pays one
    # tunnel round-trip per iteration, which in degraded tunnel states
    # swamps the device time being measured (PERF_NOTES r03). All arrays
    # are jit ARGUMENTS — closure-captured arrays become HLO constants and
    # overflow the axon remote-compile request (HTTP 413).
    NIT = 30
    results = {}
    for name, levels in (("lvl1", (1,)), ("lvl4", (4,)),
                         ("pyramid", (1, 4))):
        ring = tuple(rings[l] for l in levels)
        sc = tuple(scales[l] for l in levels)

        @functools.partial(jax.jit, static_argnums=0)
        def chain(levels, g, ring, c, k, j, m, sc):
            def pyr(ci):
                return cp.corr_pyramid_banded(g, ring, ci, k, j, m, LIVE,
                                              hw=(H0, W0), levels=levels,
                                              scales=sc)

            def body(_, carry):
                o, ci = carry
                c2 = ci + (o[:, :1, None, None] * 1e-12).astype(ci.dtype)
                return pyr(c2), ci
            o, _ = jax.lax.fori_loop(0, NIT, body, (pyr(c), c))
            return o

        t0 = time.time()
        o = jax.block_until_ready(chain(levels, gmap, ring, coords, kk, jj,
                                        mask, sc))
        print(f"{name}: compiled+ran in {time.time() - t0:.1f}s")
        t0 = time.time()
        # value-different input: the platform elides value-identical
        # repeated dispatches (PERF_NOTES)
        o = jax.block_until_ready(chain(levels, gmap, ring, coords + 1e-3,
                                        kk, jj, mask, sc))
        dt = (time.time() - t0) / (NIT + 1)
        results[name] = dt
        print(f"{name}: {dt * 1e3:.2f} ms "
              f"({dt / LIVE * 1e6:.3f} us/live-edge)")
    print(f"lvl1+lvl4 = {(results['lvl1'] + results['lvl4']) * 1e3:.2f} ms "
          f"vs pyramid {results['pyramid'] * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
