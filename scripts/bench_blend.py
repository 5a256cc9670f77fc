"""Decompose corr post-processing cost: blend_strips (lane gathers) vs a
static-slice variant; pallas grouping preamble; pallas_call alone."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.ops import corr as corr_ops
from devo_tpu.ops import corr_pallas

E, PP = 20480, 9
MEM = 32


def chain(fn, args, iters=8, name="", pert=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        p = (jnp.asarray(pert(out), args[0].dtype) if pert
             else jnp.asarray(jnp.mean(out) * 1e-12, args[0].dtype))
        args = (args[0] + p,) + args[1:]
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {dt:8.2f} ms")


def blend_static(strip, fx, fy, rxo, mask, PP):
    """blend_strips with static slices instead of lane gathers: strip
    reshaped (E, 8, PP, 16); k-loop slices [k:k+8) on the last dim."""
    E = strip.shape[0]
    s4 = strip.reshape(E, 8, PP, 16)
    # blend y first: (E, 7, PP, 16)
    Y = (1 - fy[:, None, :, None]) * s4[:, :7] + fy[:, None, :, None] * s4[:, 1:8]
    out = jnp.zeros((E, 7, PP, 7), jnp.float32)
    for k in range(8):
        c0 = Y[..., k:k + 7]
        c1 = Y[..., k + 1:k + 8]
        cand = (1 - fx[:, None, :, None]) * c0 + fx[:, None, :, None] * c1
        out = jnp.where((rxo == k)[:, None, :, None], cand, out)
    out = jnp.where(mask[:, None, None, None], out, 0.0)
    # reorder [dy, p, dx] -> [dx, dy, p]
    return out.transpose(0, 3, 1, 2).reshape(E, 7 * 7 * PP)


def main():
    rng = np.random.default_rng(0)
    strip = jnp.asarray(rng.standard_normal((E, 8, 16 * PP)), jnp.float32)
    fx = jnp.asarray(rng.random((E, PP)), jnp.float32)
    fy = jnp.asarray(rng.random((E, PP)), jnp.float32)
    rxo = jnp.asarray(rng.integers(0, 8, (E, PP)), jnp.int32)
    mask = jnp.asarray(np.arange(E) < 6144)

    chain(jax.jit(functools.partial(corr_ops.blend_strips, PP=PP)),
          (strip, fx, fy, rxo, mask), name="blend_strips (lane gathers)")
    chain(jax.jit(functools.partial(blend_static, PP=PP)),
          (strip, fx, fy, rxo, mask), name="blend static-slice")

    # correctness cross-check (fy usage must match)
    a = corr_ops.blend_strips(strip[:64], fx[:64], fy[:64], rxo[:64],
                              mask[:64], PP)
    b = blend_static(strip[:64], fx[:64], fy[:64], rxo[:64], mask[:64], PP)
    print("blend variants match:", bool(jnp.allclose(a, b, atol=1e-5)))

    # grouping preamble alone
    jj = jnp.asarray(np.sort(rng.integers(0, 20, E)), jnp.int32)

    @jax.jit
    def preamble(jj, mask):
        slot_key = jnp.where(mask, jj, MEM)
        nb = MEM + 1
        oh = (slot_key[None, :] == jnp.arange(nb)[:, None]).astype(jnp.int32)
        counts = oh.sum(axis=1)
        rank = (jnp.cumsum(oh, axis=1) - 1)[slot_key, jnp.arange(E)]
        BE = corr_pallas.BE
        padded = ((counts + BE - 1) // BE) * BE
        pstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        EP = E + nb * BE
        dest = pstart[slot_key] + rank
        src = jnp.zeros((EP,), jnp.int32).at[dest].set(
            jnp.arange(E, dtype=jnp.int32), mode="drop")
        q = jnp.arange(EP, dtype=jnp.int32)
        grp = jnp.searchsorted(pstart, q, side="right").astype(jnp.int32) - 1
        return src, dest, grp

    chain(preamble, (jj, mask), name="pallas grouping preamble",
          pert=lambda o: (o[0][0] * 0).astype(jnp.int32))

    # out[dest] style re-gather
    big = jnp.asarray(rng.standard_normal((E + 33 * 64, 8, 144)), jnp.float32)
    dest = jnp.asarray(rng.permutation(E + 33 * 64)[:E], jnp.int32)

    @jax.jit
    def regather(big, dest):
        return big[dest]

    chain(regather, (big, dest), name="out[dest] re-gather (E rows)")


if __name__ == "__main__":
    main()
