"""Compile + run probe: the int8 flat-layout banded corr kernel at the
engine's exact 480x640 shapes on the REAL TPU.

The i8 path was tuned pre-outage via microbenches whose row counts happened
to compile; the engine-integrated shapes hit a Mosaic 'tile index in
dimension 1 not provably divisible by 8' failure on the dynamic flat-layout
row offset (fixed with pl.multiple_of in _kernel_banded_split). This probe
exists so kernel-layout changes are compile-checked on hardware in ~2 min
without paying a full bench run.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.ops import corr_pallas as cp

    variant = sys.argv[1] if len(sys.argv) > 1 else "split"

    MEM, C = 32, 128
    H0, W0 = 120, 160          # 480x640 image -> stride-4 feature res
    E = 10240
    LIVE = 6144
    P, PP = 3, 9

    rng = np.random.default_rng(0)
    rings, scales = [], []
    for lvl in (1, 4):
        rows = cp.banded_shape(H0 // lvl, W0 // lvl)[0]
        rings.append(jnp.asarray(
            rng.integers(-127, 127, (MEM, rows * cp.BWIN, C)), jnp.int8))
        scales.append(jnp.asarray(rng.uniform(0.01, 0.02, (MEM,)), jnp.float32))
    gmap = jnp.asarray(rng.standard_normal((MEM * 96, P, P, C)), jnp.bfloat16)
    kk = jnp.asarray(rng.integers(0, MEM * 96, E), jnp.int32)
    jj = jnp.asarray(rng.integers(0, MEM, E), jnp.int32)
    x = rng.uniform(8, W0 - 8, (E, 1)) + rng.uniform(-1.2, 1.2, (E, PP))
    y = rng.uniform(8, H0 - 8, (E, 1)) + rng.uniform(-1.2, 1.2, (E, PP))
    coords = jnp.asarray(np.stack([x, y], -1).reshape(E, P, P, 2), jnp.float32)
    mask = jnp.asarray(np.arange(E) < LIVE)

    # timing: dependent chain INSIDE one jit. A host-side chain pays one
    # tunnel round-trip per iteration — in degraded tunnel states (7+ ms
    # RTT observed r03) that swamps the device time being measured; and
    # the platform elides repeated value-identical dispatches, so the
    # chain must be data-dependent (PERF_NOTES.md). All arrays are jit
    # ARGUMENTS — closure-captured arrays become HLO constants and
    # overflow the axon remote-compile request (HTTP 413).
    NIT = 32

    @jax.jit
    def chain(g, r1, r2, c, k, j, m, s1, s2):
        def pyr(ci):
            return cp.corr_pyramid_banded(g, (r1, r2), ci, k, j, m, LIVE,
                                          hw=(H0, W0), scales=(s1, s2),
                                          variant=variant)

        def body(_, carry):
            o, ci = carry
            c2 = ci + (o[:, :1, None, None] * 1e-12).astype(ci.dtype)
            return pyr(c2), ci
        o, _ = jax.lax.fori_loop(0, NIT, body, (pyr(c), c))
        return o

    print(f"variant={variant}")
    t0 = time.time()
    out = jax.block_until_ready(chain(gmap, rings[0], rings[1], coords,
                                      kk, jj, mask, scales[0], scales[1]))
    print(f"compiled+ran in {time.time() - t0:.1f}s; out {out.shape} "
          f"finite={bool(jnp.isfinite(out).all())} "
          f"max={float(jnp.abs(out).max()):.3f}")

    t0 = time.time()
    out = jax.block_until_ready(chain(gmap, rings[0], rings[1],
                                      coords + 1e-3, kk, jj, mask,
                                      scales[0], scales[1]))
    dt = (time.time() - t0) / (NIT + 1)
    print(f"chained pyramid call: {dt * 1e3:.2f} ms "
          f"({dt / LIVE * 1e6:.2f} us/live-edge, 2 levels)")


if __name__ == "__main__":
    main()
