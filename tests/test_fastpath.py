"""Tests for the TPU fast-path primitives: edgewise geometry vs the generic
projective implementation, scatter-free segment reductions, sorted-table
neighbor lookup, and the packed edge-table merge/remove index arithmetic."""
import jax.numpy as jnp
import numpy as np

from devo_tpu.geom import edgewise
from devo_tpu.geom import projective as pops
from devo_tpu.ops import graph
from tests.test_projective import make_scene


def test_edgewise_matches_projective():
    poses, patches, intr, ii, jj, kk = make_scene(7)
    coords, valid, (Ji, Jj, Jz) = pops.transform(
        poses, patches, intr, ii, jj, kk, jacobian=True)
    geo = edgewise.reproject(poses, patches, intr, ii, jj, kk, jacobian=True)
    P = patches.shape[-1]
    E = ii.shape[0]

    np.testing.assert_allclose(
        np.asarray(geo.coords_x), np.asarray(coords[..., 0]).reshape(E, -1),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(geo.coords_y), np.asarray(coords[..., 1]).reshape(E, -1),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(geo.valid), np.asarray(valid), atol=0)
    np.testing.assert_allclose(np.asarray(geo.Ji),
                               np.asarray(Ji).reshape(E, 12), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(geo.Jj),
                               np.asarray(Jj).reshape(E, 12), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(geo.Jz),
                               np.asarray(Jz).reshape(E, 2), atol=2e-3, rtol=2e-3)


def test_edgewise_flow_mag_matches_projective():
    poses, patches, intr, ii, jj, kk = make_scene(8)
    want = pops.flow_mag(poses, patches, intr, ii, jj, kk, beta=0.5).mean(axis=(1, 2))
    got = edgewise.flow_mag_edges(poses, patches, intr, ii, jj, kk, beta=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)


def test_onehot_segment_sum():
    rng = np.random.default_rng(0)
    E, S, C = 200, 17, 8
    vals = rng.standard_normal((E, C)).astype(np.float32)
    ids = rng.integers(0, S, E)
    got = np.asarray(graph.onehot_segment_sum(jnp.asarray(vals),
                                              jnp.asarray(ids, jnp.int32), S))
    want = np.zeros((S, C), np.float32)
    np.add.at(want, ids, vals)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sorted_segment_sum():
    rng = np.random.default_rng(1)
    E, S, C = 300, 23, 4
    ids = np.sort(rng.integers(0, S, E))
    vals = rng.standard_normal((E, C)).astype(np.float32)
    mask = rng.random(E) < 0.8
    ids_m = np.where(mask, ids, S)  # masked rows past the last boundary
    order = np.argsort(ids_m, kind="stable")
    got = np.asarray(graph.sorted_segment_sum(
        jnp.asarray(vals[order]), jnp.asarray(ids_m[order], jnp.int32), S))
    want = np.zeros((S, C), np.float32)
    np.add.at(want, ids[mask], vals[mask])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fast_segment_softmax_matches_exact():
    rng = np.random.default_rng(2)
    E, S, C = 120, 9, 16
    vals = rng.standard_normal((E, C)).astype(np.float32)
    logits = rng.standard_normal((E, C)).astype(np.float32) * 3
    ids = rng.integers(0, S, E)
    mask = rng.random(E) < 0.85
    agg_f, gat_f = graph.fast_segment_softmax_sum(
        jnp.asarray(vals), jnp.asarray(logits), jnp.asarray(ids, jnp.int32),
        S, jnp.asarray(mask))
    agg_e, gat_e = graph.segment_softmax_sum(
        jnp.asarray(vals), jnp.asarray(logits), jnp.asarray(ids, jnp.int32),
        S, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(agg_f), np.asarray(agg_e), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gat_f), np.asarray(gat_e), atol=1e-5, rtol=1e-5)


def test_sorted_neighbors_matches_generic():
    from tests.test_ops import naive_neighbors
    rng = np.random.default_rng(3)
    E = 80
    # build a (kk, jj)-sorted table with unique (kk, jj)
    kk = np.sort(rng.integers(0, 10, E))
    jj = np.zeros(E, np.int64)
    for u in np.unique(kk):
        sel = kk == u
        jj[sel] = np.sort(rng.choice(50, sel.sum(), replace=False))
    n_valid = 64
    mask = np.arange(E) < n_valid
    got_ix, got_jx = graph.sorted_neighbors(jnp.asarray(kk[:], jnp.int32),
                                            jnp.asarray(mask))
    want_ix, want_jx = naive_neighbors(kk, jj, mask)
    # sorted_neighbors returns adjacency in table order == (kk, jj) order
    np.testing.assert_array_equal(np.asarray(got_ix)[mask], want_ix[mask])
    np.testing.assert_array_equal(np.asarray(got_jx)[mask], want_jx[mask])
