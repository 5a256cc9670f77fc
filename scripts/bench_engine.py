"""Sub-time the engine's edge-table and keyframe ops on the real TPU.

Dependent-chain timing per PERF_NOTES.md (identical dispatches are elided).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.runtime import engine
from devo_tpu.runtime.config import VOConfig

cfg = VOConfig()
E = 20480
M, P = cfg.M, cfg.P


def make_state(n=30, ne=6144):
    st = engine.init_state(cfg, 480, 640, edge_cap=E)
    rng = np.random.default_rng(0)
    kk = np.sort(rng.integers((n - 20) * M, n * M, ne))
    jj = np.zeros(ne, np.int64)
    # sorted by (kk, jj): give each kk segment ascending jj
    for v in np.unique(kk):
        s = kk == v
        jj[s] = np.sort(rng.choice(np.arange(max(n - 13, 0), n), s.sum(),
                                   replace=False))
    ii = kk // M
    pad = E - ne
    st = st._replace(
        ii=jnp.asarray(np.concatenate([ii, np.zeros(pad)]), jnp.int32),
        jj=jnp.asarray(np.concatenate([jj, np.zeros(pad)]), jnp.int32),
        kk=jnp.asarray(np.concatenate([kk, np.zeros(pad)]), jnp.int32),
        enet=jnp.asarray(rng.standard_normal((E, cfg.DIM_INET)), jnp.float32),
        n_edges=jnp.int32(ne), n=jnp.int32(n),
        patches=jnp.asarray(rng.standard_normal(st.patches.shape), jnp.float32),
        initialized=jnp.asarray(True),
    )
    return st


def chain(fn, st, iters=10, name=""):
    out = fn(st)
    jax.block_until_ready(out.ii)
    t0 = time.perf_counter()
    for _ in range(iters):
        # perturb a scalar input so dispatches differ, keep shapes fixed
        st = st._replace(n_edges=out.n_edges - (out.n_edges - st.n_edges),
                         enet=st.enet + out.enet[0, 0] * 1e-20)
        out = fn(st)
    jax.block_until_ready(out.ii)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.2f} ms")


def main():
    st = make_state()

    append = jax.jit(lambda s: engine._append_edges(cfg, s))
    chain(append, st, name="_append_edges")

    def pack(s):
        drop = (s.kk % 7 == 0) & s.emask
        return engine._remove_and_pack(s, drop)
    chain(jax.jit(pack), st, name="_remove_and_pack (searchsorted)")

    def pack_where(s):
        drop = (s.kk % 7 == 0) & s.emask
        keep = s.emask & ~drop
        src = jnp.where(keep, size=E, fill_value=E - 1)[0]
        s = engine._gather_edges(s, src.astype(jnp.int32))
        return s._replace(n_edges=jnp.sum(keep).astype(jnp.int32))
    chain(jax.jit(pack_where), st, name="_remove_and_pack (where-size)")

    def pack_scatter(s):
        drop = (s.kk % 7 == 0) & s.emask
        keep = s.emask & ~drop
        dst = jnp.cumsum(keep.astype(jnp.int32)) - 1
        src = jnp.zeros((E,), jnp.int32).at[
            jnp.where(keep, dst, E - 1)].set(jnp.arange(E, dtype=jnp.int32),
                                             mode="drop")
        s = engine._gather_edges(s, src)
        return s._replace(n_edges=dst[-1] + 1)
    chain(jax.jit(pack_scatter), st, name="_remove_and_pack (scatter-inv)")

    kf = jax.jit(lambda s: engine._remove_keyframe(cfg, s, s.n - 4))
    chain(kf, st, name="_remove_keyframe")

    kfull = jax.jit(lambda s: engine._keyframe(cfg, s)[0])
    chain(kfull, st, name="_keyframe (full)")

    # isolate the frame-buffer shifts
    def shifts_only(s):
        k = s.n - 4
        N = cfg.BUFFER_SIZE
        fidx = jnp.arange(N)
        fsrc = jnp.where(fidx >= k, jnp.minimum(fidx + 1, N - 1), fidx)
        pidx = jnp.arange(N * M)
        psrc = jnp.where(pidx >= k * M, jnp.minimum(pidx + M, N * M - 1), pidx)
        return s._replace(poses=s.poses[fsrc], patches=s.patches[psrc])
    chain(jax.jit(shifts_only), st, name="frame shifts (full gather)")

    def shifts_window(s):
        k = s.n - 4
        L = (cfg.KEYFRAME_INDEX - 1) * M
        mv = jax.lax.dynamic_slice(s.patches, ((k + 1) * M, 0),
                                   (L, s.patches.shape[1]))
        patches = jax.lax.dynamic_update_slice(s.patches, mv, (k * M, 0))
        mvp = jax.lax.dynamic_slice(s.poses, (k + 1, 0),
                                    (cfg.KEYFRAME_INDEX - 1, 7))
        poses = jax.lax.dynamic_update_slice(s.poses, mvp, (k, 0))
        return s._replace(poses=poses, patches=patches)
    chain(jax.jit(shifts_window), st, name="frame shifts (windowed)")

    def ring_shifts(s):
        return s._replace(
            fmap1=engine._shift_ring(s.fmap1, s.n, s.n - 4, cfg.MEM),
            fmap2=engine._shift_ring(s.fmap2, s.n, s.n - 4, cfg.MEM))
    chain(jax.jit(ring_shifts), st, name="fmap ring shifts")


if __name__ == "__main__":
    main()
