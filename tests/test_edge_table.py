"""Invariant tests for the sorted-packed edge table.

Simulates frame-by-frame graph growth/removal and checks against a direct
transcription of the reference's edge bookkeeping (devo.py:361-380 appends,
devo.py:279-306 removals): the live edge multiset must match exactly, and
the table must stay sorted by (kk, jj) and packed at all times.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.runtime.config import VOConfig
from devo_tpu.runtime import engine as eng

CFG = VOConfig(BUFFER_SIZE=64, PATCHES_PER_FRAME=4, PATCH_LIFETIME=5,
               REMOVAL_WINDOW=7, MEM=16, DIM_INET=8, DIM_FNET=8, DIM=8,
               OPTIMIZATION_WINDOW=4)


def ref_edges_after_frames(n_frames, M, r):
    """Reference append semantics (devo.py:366-380)."""
    edges = []
    for n in range(1, n_frames + 1):
        t0, t1 = M * max(n - r, 0), M * max(n - 1, 0)
        for k in range(t0, t1):                      # forward
            edges.append((k, n - 1))
        for k in range(M * (n - 1), M * n):          # backward
            for j in range(max(n - r, 0), n):
                edges.append((k, j))
    return edges


def get_table(st):
    ne = int(st.n_edges)
    return (np.asarray(st.kk[:ne]), np.asarray(st.jj[:ne]),
            np.asarray(st.ii[:ne]))


def check_invariants(st, M):
    kk, jj, ii = get_table(st)
    # sorted by (kk, jj)
    key = kk.astype(np.int64) * 100000 + jj
    assert (np.diff(key) > 0).all(), "table not strictly (kk, jj)-sorted"
    assert (ii == kk // M).all()


def test_append_matches_reference():
    M, r = CFG.M, CFG.PATCH_LIFETIME
    st = eng.init_state(CFG, 32, 32)
    for n in range(1, 7):
        st = st._replace(n=jnp.int32(n))
        st = eng._append_edges(CFG, st)
        check_invariants(st, M)
        kk, jj, _ = get_table(st)
        got = sorted(zip(kk.tolist(), jj.tolist()))
        want = sorted(ref_edges_after_frames(n, M, r))
        assert got == want, f"frame {n}: {len(got)} vs {len(want)} edges"


def test_remove_and_pack_preserves_order():
    M = CFG.M
    st = eng.init_state(CFG, 32, 32)
    for n in range(1, 6):
        st = st._replace(n=jnp.int32(n))
        st = eng._append_edges(CFG, st)
    kk0, jj0, _ = get_table(st)
    drop_np = np.zeros(CFG.EDGE_CAP, bool)
    rng = np.random.default_rng(0)
    drop_np[: int(st.n_edges)] = rng.random(int(st.n_edges)) < 0.3
    st2 = eng._remove_and_pack(st, jnp.asarray(drop_np))
    kk1, jj1, _ = get_table(st2)
    keep = ~drop_np[: len(kk0)]
    np.testing.assert_array_equal(kk1, kk0[keep])
    np.testing.assert_array_equal(jj1, jj0[keep])
    check_invariants(st2, M)


def test_keyframe_removal_shifts_indices():
    """Removing frame k: edges touching k vanish, later indices shift by one
    frame / M patches (devo.py:285-287), order intact."""
    M = CFG.M
    st = eng.init_state(CFG, 32, 32)
    for n in range(1, 6):
        st = st._replace(n=jnp.int32(n))
        st = eng._append_edges(CFG, st)
    k = 2
    kk0, jj0, ii0 = get_table(st)
    st2 = eng._remove_keyframe(CFG, st, jnp.int32(k))

    # the cull is DEFERRED: it only marks pending_drop (exactly the edges
    # touching k) and decrements indices; the pack happens at the next
    # append merge (or the standalone-update flush)
    ne = int(st.n_edges)
    pend = np.asarray(st2.pending_drop[:ne])
    touches_k = (kk0 // M == k) | (jj0 == k)
    np.testing.assert_array_equal(pend, touches_k)
    assert not np.asarray(st2.pending_drop[ne:]).any()
    assert int(st2.n) == int(st.n) - 1

    want = []
    for kkv, jjv in zip(kk0.tolist(), jj0.tolist()):
        if kkv // M == k or jjv == k:
            continue
        nk = kkv - M if kkv // M > k else kkv
        nj = jjv - 1 if jjv > k else jjv
        want.append((nk, nj))

    # path 1: the standalone-update flush
    st3 = eng._remove_and_pack(st2, st2.pending_drop)._replace(
        pending_drop=jnp.zeros_like(st2.pending_drop))
    kk1, jj1, _ = get_table(st3)
    assert list(zip(kk1.tolist(), jj1.tolist())) == sorted(want)
    check_invariants(st3, M)

    # path 2: the next frame's append merge absorbs the pending drops
    n_next = int(st2.n) + 1
    st4 = eng._append_edges(CFG, st2._replace(n=jnp.int32(n_next)))
    kk2, jj2, _ = get_table(st4)
    r = CFG.PATCH_LIFETIME
    new = [(kv, n_next - 1)
           for kv in range(M * max(n_next - r, 0), M * (n_next - 1))]
    new += [(kv, j) for kv in range(M * (n_next - 1), M * n_next)
            for j in range(max(n_next - r, 0), n_next)]
    assert list(zip(kk2.tolist(), jj2.tolist())) == sorted(want + new)
    assert not np.asarray(st4.pending_drop).any()
    check_invariants(st4, M)


def test_hidden_state_follows_edges():
    """enet rows must move with their edges through append/remove."""
    M = CFG.M
    st = eng.init_state(CFG, 32, 32)
    for n in range(1, 5):
        st = st._replace(n=jnp.int32(n))
        st = eng._append_edges(CFG, st)
    ne = int(st.n_edges)
    # tag each edge's hidden state with its (kk, jj)
    kk, jj, _ = get_table(st)
    tags = (kk * 1000 + jj).astype(np.float32)
    enet = np.zeros(st.enet.shape, np.float32)
    enet[:ne, 0] = tags
    st = st._replace(enet=jnp.asarray(enet))

    st = st._replace(n=jnp.int32(5))
    st = eng._append_edges(CFG, st)
    kk1, jj1, _ = get_table(st)
    net1 = np.asarray(st.enet[: int(st.n_edges), 0])
    for a in range(int(st.n_edges)):
        if jj1[a] == 4 or kk1[a] >= 4 * M:
            assert net1[a] == 0.0  # fresh edge
        else:
            assert net1[a] == kk1[a] * 1000 + jj1[a]
