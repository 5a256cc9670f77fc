"""Microbench the edge-table maintenance ops (_append_edges,
_remove_and_pack) at a pinned bucket: dependent chains with drifting inputs
(the platform elides repeated identical dispatches, PERF_NOTES.md).

Usage: bench_table_ops.py [E] [N_LIVE]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.runtime import engine
    from devo_tpu.runtime.config import VOConfig

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    LIVE = int(sys.argv[2]) if len(sys.argv) > 2 else 6144

    cfg = VOConfig()
    M, r = cfg.M, cfg.PATCH_LIFETIME
    rng = np.random.default_rng(0)

    # build a plausible sorted packed table: patches of frames [0, 8) x
    # target frames, sorted by (kk, jj)
    n = 8
    kk = np.repeat(np.arange(n * M), n)[:LIVE]
    jj = np.tile(np.arange(n), n * M)[:LIVE]
    ii = kk // M
    order = np.lexsort((jj, kk))
    kk, jj, ii = kk[order], jj[order], ii[order]

    pad = E - LIVE
    st = engine.init_state(cfg, 480, 640, 0, edge_cap=E)
    st = st._replace(
        ii=jnp.asarray(np.pad(ii, (0, pad)), jnp.int32),
        jj=jnp.asarray(np.pad(jj, (0, pad)), jnp.int32),
        kk=jnp.asarray(np.pad(kk, (0, pad)), jnp.int32),
        enet=jnp.asarray(rng.standard_normal((E, 384)), jnp.float32),
        n_edges=jnp.int32(LIVE),
        n=jnp.int32(n),
    )

    @jax.jit
    def run_append(st, i):
        st = st._replace(n=st.n + 0, enet=st.enet + 1e-9 * i)
        st2 = engine._append_edges(cfg, st)
        # feed back so chains depend; keep shapes static
        return st._replace(enet=st2.enet, ii=st2.ii, jj=st2.jj, kk=st2.kk,
                           n_edges=jnp.minimum(st2.n_edges, jnp.int32(LIVE)))

    @jax.jit
    def run_pack(st, i):
        drop = (st.jj == (i % 8)) & st.emask
        st2 = engine._remove_and_pack(st._replace(enet=st.enet + 1e-9 * i), drop)
        return st._replace(enet=st2.enet, ii=st2.ii, jj=st2.jj, kk=st2.kk,
                           n_edges=jnp.int32(LIVE))

    @jax.jit
    def run_gather_only(st, i):
        src = jnp.clip(jnp.arange(E, dtype=jnp.int32) + (i % 3), 0, E - 1)
        return st._replace(enet=st.enet[src] + 1e-9 * i, ii=st.ii[src],
                           jj=st.jj[src], kk=st.kk[src])

    for name, fn in [("append", run_append), ("pack", run_pack),
                     ("gather4", run_gather_only)]:
        s = st
        s = fn(s, jnp.int32(0))
        jax.block_until_ready(s.enet)
        t0 = time.perf_counter()
        iters = 20
        for i in range(1, iters + 1):
            s = fn(s, jnp.int32(i))
        jax.block_until_ready(s.enet)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:10s} E={E} live={LIVE}: {dt:8.3f} ms")


if __name__ == "__main__":
    main()
