"""Ablate the banded Pallas corr kernel stages on the real TPU chip.

Variants (all same grid/IO so dispatch cost is identical):
  full     — DMA + matmul + 9-slice extraction (current production kernel)
  noext    — DMA + matmul, out = first 8 rows of R (skips scratch+slices)
  nomm     — DMA only, out = window rows summed to shape
  noDMA    — matmul + extraction on a fixed VMEM scratch window
Each runs a dependent chain (axon elides identical dispatches).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from devo_tpu.ops.corr_pallas import BE, BWIN, IF, K, NSC, WIN

E = 15360
LIVE = 6144
MEM, Hp, NBX, C = 32, 144, 22, 128
PP = 9


def make_kernel(mode):
    def _kernel(nlive_ref, slot_ref, band_ref, y0_ref,
                g_ref, ry_ref, rx_ref, fmap_hbm, out_ref,
                win, r0, r1, r2, r3, sems):
        scratches = (r0, r1, r2, r3)
        b = pl.program_id(0)

        @pl.when(b * BE < nlive_ref[0])
        def _run():
            def win_dma(e):
                q = b * BE + e
                return pltpu.make_async_copy(
                    fmap_hbm.at[slot_ref[q], band_ref[q],
                                pl.ds(y0_ref[q], WIN)],
                    win.at[e % K], sems.at[e % K])

            if mode != "noDMA":
                for k in range(IF):
                    win_dma(k).start()

            def edge_body(e, sc):
                if mode != "noDMA":
                    win_dma(e).wait()
                w2 = win[e % K].reshape(WIN * BWIN, C)
                if mode == "nomm":
                    out_ref[e] = jnp.concatenate(
                        [w2[:8, :128], w2[:8, :16]], axis=1
                    ).astype(jnp.float32)
                    if mode != "noDMA":
                        @pl.when(e + IF < BE)
                        def _():
                            win_dma(e + IF).start()
                    return
                R = jax.lax.dot_general(
                    w2, g_ref[e], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if mode != "noDMA":
                    @pl.when(e + IF < BE)
                    def _():
                        win_dma(e + IF).start()
                if mode == "noext":
                    out_ref[e] = jnp.concatenate(
                        [R[8 * p:8 * p + 8, :] for p in range(PP)], axis=1)
                    return
                sc[:, :BWIN, :] = R.reshape(WIN, BWIN, 16)
                parts = []
                for p in range(PP):
                    rx8 = pl.multiple_of(rx_ref[e, p] * 8, 8)
                    parts.append(sc[pl.ds(ry_ref[e, p], 8), pl.ds(rx8, 16), p])
                out_ref[e] = jnp.concatenate(parts, axis=1)

            def group(i, _):
                for k in range(NSC):
                    edge_body(i * NSC + k, scratches[k])
                return 0

            jax.lax.fori_loop(0, BE // NSC, group, 0)

    return _kernel


def build(mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(E // BE,),
        in_specs=[
            pl.BlockSpec((BE, 16, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BE, 16), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BE, 8, 16 * PP), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, WIN, BWIN, C), jnp.bfloat16),
            pltpu.VMEM((WIN, BWIN + 8, 16), jnp.float32),
            pltpu.VMEM((WIN, BWIN + 8, 16), jnp.float32),
            pltpu.VMEM((WIN, BWIN + 8, 16), jnp.float32),
            pltpu.VMEM((WIN, BWIN + 8, 16), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )

    def fn(nlive, slot, band, y0, g, ry, rx, fmap_b):
        return pl.pallas_call(
            make_kernel(mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, 8, 16 * PP), jnp.float32),
        )(nlive, slot, band, y0, g, ry, rx, fmap_b)

    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    fmap_b = jnp.asarray(rng.standard_normal((MEM, NBX, Hp, BWIN, C)) * 0.1,
                         jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((E, 16, C)) * 0.1, jnp.bfloat16)
    ry = jnp.asarray(rng.integers(0, 8, (E, 16)), jnp.int32)
    rx = jnp.asarray(rng.integers(0, 3, (E, 16)), jnp.int32)
    nlive = jnp.asarray([LIVE], jnp.int32)

    idx = {
        "random": (jnp.asarray(rng.integers(0, MEM, E), jnp.int32),
                   jnp.asarray(rng.integers(0, NBX, E), jnp.int32),
                   jnp.asarray(rng.integers(0, Hp - WIN, E), jnp.int32)),
        "sorted": (jnp.asarray(np.sort(rng.integers(0, MEM, E)), jnp.int32),
                   jnp.asarray(rng.integers(0, NBX, E), jnp.int32),
                   jnp.asarray(rng.integers(0, Hp - WIN, E), jnp.int32)),
        "const": (jnp.zeros(E, jnp.int32), jnp.zeros(E, jnp.int32),
                  jnp.zeros(E, jnp.int32)),
        # production pattern: table sorted by (kk, jj) -> slot cycles the
        # lifetime window every edge; band/y0 drift slowly with flow
        "cyclic": (jnp.asarray(np.arange(E) % 13, jnp.int32),
                   jnp.asarray(np.clip((np.arange(E) // 13) % NBX
                                       + rng.integers(-1, 2, E), 0, NBX - 1),
                               jnp.int32),
                   jnp.asarray(np.clip(rng.integers(0, Hp - WIN, E // 13 + 1)
                                       .repeat(13)[:E]
                                       + rng.integers(-2, 3, E),
                                       0, Hp - WIN), jnp.int32)),
        # the real engine under constant keyframe merging: n stays 8, so
        # slot cycles 0..7 every edge while (band, y0) stay fixed per patch
        # group of 8 -> consecutive DMAs stride EXACTLY slot_pitch bytes
        "cycle8": (jnp.asarray(np.arange(E) % 8, jnp.int32),
                   jnp.asarray(rng.integers(0, NBX, (E // 8 + 1,))
                               .repeat(8)[:E], jnp.int32),
                   jnp.asarray(rng.integers(0, Hp - WIN, (E // 8 + 1,))
                               .repeat(8)[:E], jnp.int32)),
        # like cyclic but each patch group lands at a RANDOM (band, y0)
        # (patches are spatially scattered): slot cycles x random group base
        "grouped": (jnp.asarray(np.arange(E) % 13, jnp.int32),
                    jnp.asarray(np.clip(
                        rng.integers(0, NBX, E // 13 + 1).repeat(13)[:E]
                        + rng.integers(-1, 2, E), 0, NBX - 1), jnp.int32),
                    jnp.asarray(np.clip(
                        rng.integers(0, Hp - WIN, E // 13 + 1)
                        .repeat(13)[:E] + rng.integers(-2, 3, E),
                        0, Hp - WIN), jnp.int32)),
    }

    import sys
    drift = "--drift" in sys.argv  # vary DMA addresses per iteration (cold
    #                                TLB, as in the real engine step)
    for layout, (slot, band, y0) in idx.items():
        for mode in ("full", "noext", "nomm", "noDMA"):
            fn = build(mode)
            out = fn(nlive, slot, band, y0, g, ry, rx, fmap_b)
            jax.block_until_ready(out)
            iters = 12
            t0 = time.perf_counter()
            for _ in range(iters):
                g = (g + jnp.float32(out[0, 0, 0]).astype(jnp.bfloat16)
                     * 1e-12)
                if drift:
                    y0 = (y0 + 1) % (Hp - WIN)
                    band = (band + 1) % NBX
                out = fn(nlive, slot, band, y0, g, ry, rx, fmap_b)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"{layout:8s} {mode:8s} {dt:8.2f} ms  "
                  f"({dt / LIVE * 1e3:6.3f} us/live-edge)")


if __name__ == "__main__":
    main()
