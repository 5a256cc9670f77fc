"""Probe: patch-table layout — (T, 27) rows vs (27, T) planes (r06 prep).

The r05 saturated profile attributes ~0.3 ms/frame to layout copies around
the flat (BUFFER*M, 27) f32 patch table (copy.3329/3326: XLA flips between
{1,0} — 27 lanes padded to 128, 4.7x bytes — and {0,1} around the per-frame
dynamic_update_slice) plus ~0.25 ms of (E, 27) one-hot gather dots
(fusion.639/640). Before committing to the invasive transpose (every
consumer in engine/BA/geom touches the table), this probe measures the
three hot access patterns in BOTH layouts on the real chip:

  1. per-frame write: dynamic_update_slice of an (M, 27) block
  2. per-edge gather: one-hot dot of E rows out of the live window
  3. per-patch update: masked add into the live window (BA retraction)

Methodology per PERF_NOTES r03/r04: dependent chain inside ONE jit
(fori_loop), value-dependent carry, freshly randomized inputs per repeat,
min-of-repeats. Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_patch_layout.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from devo_tpu.utils.timing import enable_compilation_cache
    enable_compilation_cache()

    T = 4096 * 96          # BUFFER_SIZE * M rows
    M = 96                 # patches written per frame
    E = 12288              # edge bucket
    W = 2496               # live window rows (frame_span * M)
    ITERS = 300

    rng = np.random.default_rng(0)

    def chain(fn):
        """fori_loop dependent chain; the carry feeds the next iteration so
        the platform cannot elide dispatches."""
        def run(tab, idx, blk):
            def body(i, carry):
                t, s = carry
                t, s2 = fn(t, idx, blk, i)
                return (t, s + s2)
            t, s = lax.fori_loop(0, ITERS, body, (tab, jnp.float32(0)))
            return s + t.ravel()[0]
        return jax.jit(run)

    # ---- AoS (T, 27) ----------------------------------------------------
    def aos_write(t, idx, blk, i):
        base = (idx[i % E] % (T // M - 1)) * M
        t = lax.dynamic_update_slice(t, blk + t[0, 0], (base, 0))
        return t, t[base, 0]

    def aos_gather(t, idx, blk, i):
        sub = lax.dynamic_slice(t, (i % 2, 0), (W, 27))   # carry-dependent
        oh = (idx[:, None] == ((jnp.arange(W) + i) % W)[None, :]
              ).astype(jnp.float32)
        g = oh @ sub                               # (E, 27)
        return t, g.sum()

    def aos_update(t, idx, blk, i):
        sub = lax.dynamic_slice(t, (0, 0), (W, 27))
        t = lax.dynamic_update_slice(t, sub * 1.0000001, (0, 0))
        return t, t[1, 1]

    # ---- SoA (27, T) ----------------------------------------------------
    def soa_write(t, idx, blk, i):
        base = (idx[i % E] % (T // M - 1)) * M
        t = lax.dynamic_update_slice(t, blk.T + t[0, 0], (0, base))
        return t, t[0, base]

    def soa_gather(t, idx, blk, i):
        sub = lax.dynamic_slice(t, (0, i % 2), (27, W))   # carry-dependent
        oh = (idx[None, :] == ((jnp.arange(W) + i) % W)[:, None]
              ).astype(jnp.float32)
        g = sub @ oh                               # (27, E)
        return t, g.sum()

    def soa_update(t, idx, blk, i):
        sub = lax.dynamic_slice(t, (0, 0), (27, W))
        t = lax.dynamic_update_slice(t, sub * 1.0000001, (0, 0))
        return t, t[1, 1]

    cases = {
        "aos_write": ((T, 27), aos_write),
        "soa_write": ((27, T), soa_write),
        "aos_gather": ((T, 27), aos_gather),
        "soa_gather": ((27, T), soa_gather),
        "aos_update": ((T, 27), aos_update),
        "soa_update": ((27, T), soa_update),
    }

    print(f"T={T} W={W} E={E} iters={ITERS}; min of 4 repeats (one ~31 ms sync amortized over ITERS), "
          f"us per op instance")
    for name, (shape, fn) in cases.items():
        f = chain(fn)
        best = float("inf")
        for rep in range(5):
            # FRESH inputs every repeat, including the timed one — a timed
            # call value-identical to the warm call measures garbage
            # (PERF_NOTES r04 probe pitfall)
            tab = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            idx = jnp.asarray(rng.integers(0, W, E), jnp.int32)
            blk = jnp.asarray(rng.standard_normal((M, 27)), jnp.float32)
            t0 = time.perf_counter()
            out = float(f(tab, idx, blk))   # value FETCH: block_until_ready
                                            # alone was elided (r05 probe)
            dt = (time.perf_counter() - t0) / ITERS * 1e6
            if rep:                      # rep 0 pays the compile; discard
                best = min(best, dt)
        print(f"  {name:12s} {best:9.1f} us")


if __name__ == "__main__":
    main()
