"""DMA-descriptor-wall probe (round 4): what does a window DMA actually
cost, and what amortizes it?

The r03 engine trace put the two-level corr at ~19k window DMAs/frame x
~0.4-0.65 us each ~= 8 ms — flat per descriptor regardless of size, IF/K
depth saturated (PERF_NOTES "the corr descriptor wall"). This probe strips
the kernel to DMA issue + a token VPU touch and measures, at the engine's
exact banded i8 shapes:

  single    ND single-slot windows of (wr*BWIN, C) i8    — the baseline
  pair      ND/2 two-slot strided windows (2, wr*BWIN, C) — does a strided
            descriptor cost one issue or one per contiguous chunk?
  tallM     ND/M contiguous windows of (M*wr*BWIN, C)     — does the fixed
            cost amortize with chunk size (i.e. is a per-(slot,band)
            column fetch + VMEM-serving design worth building)?
  local     windows copied VMEM->VMEM out of a resident column — is the
            per-descriptor cost an HBM property or a copy-issue property?

Method per PERF_NOTES: dependent chain INSIDE one jit (host-side chains
are RTT-bound under a degraded tunnel); all arrays are jit arguments
(closure captures overflow the axon remote-compile request); each chain
iteration's DMA offsets depend on the previous result so XLA cannot
collapse the loop.
"""
import sys
import time

import numpy as np


def run(mode: str, nit: int = 16):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from devo_tpu.ops import corr_pallas as cp

    MEM, C = 32, 128
    H0, W0 = 120, 160
    rows = cp.banded_shape(H0, W0)[0]          # per-slot banded rows (lvl 1)
    wr, BWIN = 16, cp.BWIN
    WR = wr * BWIN                             # 384 flat rows per window
    ND = 9600                                  # descriptors ~= live edges
    K, IF = 8, 4

    if mode == "single":
        S, M, nd, NS = 1, 1, ND, 1
    elif mode == "pair":
        S, M, nd, NS = 2, 1, ND // 2, 1
    elif mode.startswith("tall"):
        S, M = 1, int(mode[4:])
        nd, NS = ND // M, 1
    elif mode == "local":
        S, M, nd, NS = 1, 1, ND, 1
    elif mode == "dual":
        S, M, nd, NS = 1, 1, ND, 2     # 2 independent rings+sems, same bytes
    elif mode == "quad":
        S, M, nd, NS = 1, 1, ND, 4
    else:
        raise SystemExit(f"unknown mode {mode}")

    rng = np.random.default_rng(0)
    ring = jnp.asarray(
        rng.integers(-127, 127, (MEM, rows * BWIN, C)), jnp.int8)
    # decorrelated addresses (slot, row0 both random) — the stagger rule
    # handles the aliasing pathology; keep the probe off it entirely
    slot = jnp.asarray(rng.integers(0, MEM - (S - 1), nd), jnp.int32)
    max_r0 = rows * BWIN - M * WR - 8
    row0 = jnp.asarray(
        (rng.integers(0, max_r0 // 8, nd) * 8), jnp.int32)

    def kernel_ns(slot_ref, row0_ref, f_hbm, out_ref, *scr):
        # NS independent (window-ring, semaphore-array) pairs, descriptors
        # issued round-robin: does Mosaic map them onto parallel DMA queues
        # whose bandwidth aggregates past the ~220 GB/s single-stream cap?
        wins, semss = scr[:NS], scr[NS:2 * NS]

        def dma(s, j):
            # descriptor index i = j * NS + s (stream s static)
            i = j * NS + s
            r0 = pl.multiple_of(row0_ref[i], 8)
            return pltpu.make_async_copy(
                f_hbm.at[slot_ref[i], pl.ds(r0, WR)],
                wins[s].at[j % K], semss[s].at[j % K])

        for j in range(IF):
            for s in range(NS):
                dma(s, j).start()

        def body(j, acc):
            # wait + reissue one descriptor per stream each iteration
            for s in range(NS):
                dma(s, j).wait()

            @pl.when(j + IF < nd // NS)
            def _():
                for s in range(NS):
                    dma(s, j + IF).start()
            for s in range(NS):
                acc = acc + wins[s][j % K, 0, :].astype(jnp.float32)
            return acc

        acc = jax.lax.fori_loop(0, nd // NS, body,
                                jnp.zeros((C,), jnp.float32))
        out_ref[0, :] = acc

    def kernel(slot_ref, row0_ref, f_hbm, out_ref, win, col, sems, csem):
        if mode == "local":
            @pl.when(pl.program_id(0) == 0)
            def _load():
                cpy = pltpu.make_async_copy(
                    f_hbm.at[0, pl.ds(0, COLR)], col, csem)
                cpy.start()
                cpy.wait()

        def dma(i):
            r0 = pl.multiple_of(row0_ref[i], 8)
            if mode == "local":
                r0 = pl.multiple_of(
                    jnp.minimum(r0, COLR - WR - 8) & ~7, 8)
                return pltpu.make_async_copy(
                    col.at[pl.ds(r0, WR)], win.at[i % K], sems.at[i % K])
            if S == 1:
                return pltpu.make_async_copy(
                    f_hbm.at[slot_ref[i], pl.ds(r0, M * WR)],
                    win.at[i % K], sems.at[i % K])
            return pltpu.make_async_copy(
                f_hbm.at[pl.ds(slot_ref[i], S), pl.ds(r0, WR)],
                win.at[i % K], sems.at[i % K])

        for k in range(IF):
            dma(k).start()

        def body(i, acc):
            dma(i).wait()

            @pl.when(i + IF < nd)
            def _():
                dma(i + IF).start()
            w = win[i % K]
            if S == 2:
                return (acc + w[0, 0, :].astype(jnp.float32)
                        + w[1, 0, :].astype(jnp.float32))
            return acc + w[0, :].astype(jnp.float32)

        acc = jax.lax.fori_loop(0, nd, body,
                                jnp.zeros((C,), jnp.float32))
        out_ref[0, :] = acc

    COLR = 4096                                 # local-mode resident rows
    win_shape = ((K, S, WR, C) if S == 2 else (K, M * WR, C))
    if NS > 1:
        scratch = ([pltpu.VMEM((K, WR, C), jnp.int8) for _ in range(NS)]
                   + [pltpu.SemaphoreType.DMA((K,)) for _ in range(NS)])
        kfn = kernel_ns
    else:
        scratch = [
            pltpu.VMEM(win_shape, jnp.int8),
            pltpu.VMEM((COLR, C), jnp.int8),
            pltpu.SemaphoreType.DMA((K,)),
            pltpu.SemaphoreType.DMA,
        ]
        kfn = kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(
        kfn, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32))

    @jax.jit
    def chain(sl, r0, f):
        def body(_, carry):
            acc, sl2 = carry
            o = call(sl2, r0, f)
            # data-dependence: fold a zero derived from o into the slots
            z = jnp.minimum(jnp.abs(o[0, 0]).astype(jnp.int32), 0)
            return acc + o[0, 0], sl2 + z
        acc, _ = jax.lax.fori_loop(
            0, nit, body, (jnp.float32(0), sl))
        return acc

    t0 = time.time()
    out = jax.block_until_ready(chain(slot, row0, ring))
    print(f"[{mode}] compiled+ran in {time.time() - t0:.1f}s acc={out:.1f}",
          flush=True)
    # repeats with FRESH host-generated random offsets each time: defeats
    # any content-keyed dispatch elision and exposes tunnel variance
    times = []
    for rep in range(5):
        sl2 = jnp.asarray(rng.integers(0, MEM - (S - 1), nd), jnp.int32)
        r02 = jnp.asarray((rng.integers(0, max_r0 // 8, nd) * 8), jnp.int32)
        jax.block_until_ready((sl2, r02))
        t0 = time.time()
        out = jax.block_until_ready(chain(sl2, r02, ring))
        times.append((time.time() - t0) / nit)
    times.sort()
    dt = times[0]
    per = dt / nd * 1e6
    mb = nd * S * M * WR * C / 1e6
    print(f"[{mode}] min {dt * 1e3:.2f} ms/call (med {times[2] * 1e3:.2f}, "
          f"max {times[-1] * 1e3:.2f})  {nd} DMAs x "
          f"{S * M * WR * C / 1024:.0f} KB"
          f"  -> {per:.3f} us/DMA  {mb / dt / 1e3:.0f} GB/s"
          f"  ({dt / (ND) * 1e6:.3f} us/edge-equiv)", flush=True)


def main():
    modes = sys.argv[1:] or ["single", "pair", "tall2", "tall4", "tall8",
                             "local"]
    for m in modes:
        run(m)


if __name__ == "__main__":
    main()
