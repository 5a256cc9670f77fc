"""Probe: E-row gathers vs one-hot MXU matmuls for the engine's hot lookups,
plus Pallas grouped-kernel and small-DMA rate probes."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 15360
T = 2496          # live patch slots
rng = np.random.default_rng(0)


def chain(fn, args, iters=8, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        eps = jnp.asarray(jnp.asarray(out, jnp.float32).ravel()[0] * 1e-20,
                          args[0].dtype)
        args = (args[0] + eps,) + args[1:]
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    tbl384 = jnp.asarray(rng.standard_normal((T, 384)), jnp.float32)
    tbl27 = jnp.asarray(rng.standard_normal((T, 27)), jnp.float32)
    tbl7 = jnp.asarray(rng.standard_normal((32, 7)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, T, E), jnp.int32)
    idx32 = jnp.asarray(rng.integers(0, 32, E), jnp.int32)

    chain(jax.jit(lambda t, i: t[i]), (tbl384, idx), name="gather E x (384,) f32")
    chain(jax.jit(lambda t, i: t[i]), (tbl27, idx), name="gather E x (27,) f32")
    chain(jax.jit(lambda t, i: t[i]), (tbl7, idx32), name="gather E x (7,) from (32,7)")

    def onehot_lookup(t, i):
        oh = (i[:, None] == jnp.arange(t.shape[0])[None, :])
        return jax.lax.dot_general(
            oh.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    chain(jax.jit(onehot_lookup), (tbl384, idx), name="one-hot matmul E x (384,)")
    chain(jax.jit(onehot_lookup), (tbl27, idx), name="one-hot matmul E x (27,)")
    chain(jax.jit(onehot_lookup), (tbl7, idx32), name="one-hot matmul E x (7,)")

    # f32 exactness variant: one-hot in f32 (ints < 2^24 exact)
    def onehot_f32(t, i):
        oh = (i[:, None] == jnp.arange(t.shape[0])[None, :]).astype(jnp.float32)
        return oh @ t

    chain(jax.jit(onehot_f32), (tbl384, idx), name="one-hot f32 E x (384,)")

    # ---- Pallas probe: grouped matmul-only kernel (VMEM-resident frame)
    C, PP = 128, 9
    WIN, WINX = 16, 24
    Hp, Wp = 144, 184
    BE = 128

    fmap1 = jnp.asarray(rng.standard_normal((Hp, Wp, C)), jnp.bfloat16)
    gm = jnp.asarray(rng.standard_normal((E, 16, C)), jnp.bfloat16)
    y0 = jnp.asarray(rng.integers(0, Hp - WIN, (E, 1)), jnp.int32)
    x08 = jnp.asarray(rng.integers(0, (Wp - WINX) // 8, (E, 1)), jnp.int32)
    ry = jnp.asarray(rng.integers(0, 9, (E, 16)), jnp.int32)
    rx8 = jnp.asarray(rng.integers(0, 2, (E, 16)), jnp.int32)

    def mk_kernel(extract: bool, nsc: int):
        def kern(y0_ref, x0_ref, ry_ref, rx_ref, gmap_ref, fmap_ref, out_ref,
                 *scratch):
            scratches = scratch[:nsc]

            def edge_body(e, sc):
                x0 = pl.multiple_of(x0_ref[e, 0] * 8, 8)
                win = fmap_ref[pl.ds(y0_ref[e, 0], WIN), pl.ds(x0, WINX), :]
                R = jax.lax.dot_general(
                    win.reshape(WIN * WINX, C), gmap_ref[e],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if extract:
                    sc[:, :WINX, :] = R.reshape(WIN, WINX, 16)
                    parts = []
                    for p in range(PP):
                        rx = pl.multiple_of(rx_ref[e, p] * 8, 8)
                        parts.append(sc[pl.ds(ry_ref[e, p], 8), pl.ds(rx, 16), p])
                    out_ref[e, :8] = jnp.concatenate(parts, axis=1)
                else:
                    out_ref[e] = R.reshape(WIN, WINX * 16)[:, :16 * PP]

            def group(i, _):
                for k in range(nsc):
                    edge_body(i * nsc + k, scratches[k])
                return 0

            jax.lax.fori_loop(0, BE // nsc, group, 0)

        rows = 8 if extract else WIN
        return pl.pallas_call(
            kern,
            grid=(E // BE,),
            in_specs=[
                pl.BlockSpec((BE, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BE, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BE, 16), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BE, 16), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BE, 16, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # fmap resident
            ],
            out_specs=pl.BlockSpec((BE, rows, 16 * PP), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, rows, 16 * PP), jnp.float32),
            scratch_shapes=[pltpu.VMEM((WIN, WINX + 8, 16), jnp.float32)
                            for _ in range(nsc)],
        )

    for extract in (True, False):
        for nsc in (1, 4):
            if not extract and nsc > 1:
                continue
            f = jax.jit(lambda g, fm, a=extract, n=nsc: mk_kernel(a, n)(
                y0, x08, ry, rx8, g, fm))
            try:
                d = chain(f, (gm, fmap1),
                          name=f"pallas grouped extract={extract} nsc={nsc}")
                print(f"   -> {d / E * 1e3:.3f} us/edge")
            except Exception as ex:
                print(f"pallas extract={extract} nsc={nsc} FAILED: "
                      f"{str(ex)[:200]}")


if __name__ == "__main__":
    main()
