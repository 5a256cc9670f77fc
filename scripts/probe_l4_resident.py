"""Compile + time the two-level pyramid with the level-4 VMEM-resident
kernel (lvl1 banded-DMA split + lvl4 resident) on real TPU, against the
all-banded baseline in the same process. PERF_NOTES r03."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from devo_tpu.ops import corr_pallas as cp

    MEM, C = 32, 128
    H0, W0 = 120, 160          # 480x640 image -> stride-4 feature res
    E = 10240
    LIVE = 6912
    rng = np.random.default_rng(0)

    gmap = jnp.asarray(rng.standard_normal((E, 4, 4, C)) * 0.1, jnp.float32)
    coords = jnp.stack([
        jnp.asarray(rng.uniform(8, W0 - 8, (E,)), jnp.float32),
        jnp.asarray(rng.uniform(8, H0 - 8, (E,)), jnp.float32),
    ], -1)[:, None, None, :] + jnp.zeros((E, 4, 4, 2), jnp.float32)
    kk = jnp.arange(E, dtype=jnp.int32) % (MEM * 4)
    jj = jnp.asarray(rng.integers(0, MEM, (E,)), jnp.int32)
    mask = jnp.arange(E) < LIVE

    f1 = jnp.asarray(rng.standard_normal((H0, W0, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((H0 // 4, W0 // 4, C)), jnp.float32)
    q1, s1 = cp.band_frame_i8(f1)
    ring1 = jnp.stack([q1] * MEM)
    sc1 = jnp.full((MEM,), s1)
    q2b, s2b = cp.band_frame_i8(f2)
    ring2b = jnp.stack([q2b] * MEM)
    q2r, s2r = cp.pad_frame_l4_i8(f2)
    ring2r = jnp.stack([q2r] * MEM)
    sc2 = jnp.full((MEM,), s2b)
    sc2r = jnp.full((MEM,), s2r)

    NIT = 32

    # the dependent chain runs INSIDE one jit: a host-side chain pays one
    # tunnel round-trip per iteration, which in degraded tunnel states
    # (7+ ms RTT observed) swamps the device time being measured. All
    # arrays are jit ARGUMENTS — closure-captured arrays become HLO
    # constants and overflow the axon remote-compile request (HTTP 413).
    @jax.jit
    def chain(g, r1, r2, c, k, j, m, s1, s2):
        def pyr(ci):
            return cp.corr_pyramid_banded(g, (r1, r2), ci, k, j, m, LIVE,
                                          hw=(H0, W0), scales=(s1, s2))

        def body(_, carry):
            o, ci = carry
            c2 = ci + (o[:, :1, None, None] * 1e-12).astype(ci.dtype)
            return pyr(c2), ci
        o, _ = jax.lax.fori_loop(0, NIT, body, (pyr(c), c))
        return o

    for name, r2, s2 in (("resident", ring2r, sc2r),
                         ("banded", ring2b, sc2)):
        t0 = time.time()
        o = jax.block_until_ready(chain(gmap, ring1, r2, coords, kk, jj,
                                        mask, sc1, s2))
        print(f"{name}: compiled+ran in {time.time() - t0:.1f}s "
              f"finite={bool(jnp.isfinite(o).all())}", flush=True)
        t0 = time.time()
        # value-different input: the platform elides value-identical
        # repeated dispatches (PERF_NOTES)
        o = jax.block_until_ready(chain(gmap, ring1, r2, coords + 1e-3, kk,
                                        jj, mask, sc1, s2))
        dt = (time.time() - t0) / (NIT + 1)
        print(f"{name}: chained pyramid {dt * 1e3:.2f} ms "
              f"({dt / LIVE * 1e6:.2f} us/live-edge, 2 levels)", flush=True)


if __name__ == "__main__":
    main()
