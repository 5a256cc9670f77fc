"""Training-backward semantics of corr_pyramid_train (ops/corr.py):
the reference's CUDA corr backward (a) keeps only a Bernoulli(dropout)
subset of edges (correlation.py:20-26, no 1/p rescale), (b) returns no
gradient for coords (correlation.py:30). Forward values are unchanged."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.ops import corr as corr_ops


def _fixture(E=12, M=6, N=3, H=16, W=20, C=8, P=3, seed=0):
    rng = np.random.default_rng(seed)
    gmap = jnp.asarray(rng.standard_normal((M, P, P, C)), jnp.float32)
    pyr = (jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32),
           jnp.asarray(rng.standard_normal((N, H // 4, W // 4, C)),
                       jnp.float32))
    coords = jnp.asarray(
        rng.uniform(2, min(H, W) - 3, (E, P, P, 2)), jnp.float32)
    kk = jnp.asarray(rng.integers(0, M, E), jnp.int32)
    jj = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    return gmap, pyr, coords, kk, jj


def test_forward_value_unchanged():
    gmap, pyr, coords, kk, jj = _fixture()
    want = corr_ops.corr_pyramid(gmap, pyr, coords, kk, jj)
    for dr in (1.0, 0.5):
        got = corr_ops.corr_pyramid_train(
            gmap, pyr, coords, kk, jj, jax.random.PRNGKey(3), dropout=dr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_no_coord_gradient():
    gmap, pyr, coords, kk, jj = _fixture()
    for dr in (1.0, 0.5):
        g = jax.grad(lambda c: jnp.sum(jnp.sin(corr_ops.corr_pyramid_train(
            gmap, pyr, c, kk, jj, jax.random.PRNGKey(0), dropout=dr))))(coords)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_dropout_masks_edge_contributions():
    """grad with dropout == grad of the full path with the cotangent zeroed
    on dropped edges (the exact reference semantics: the kept subset's
    contributions, unrescaled)."""
    gmap, pyr, coords, kk, jj = _fixture()
    key = jax.random.PRNGKey(42)
    dropout = 0.5
    keep = jax.random.uniform(key, (kk.shape[0],)) < dropout
    assert 0 < int(keep.sum()) < kk.shape[0], "fixture must mix kept/dropped"

    def fwd(g, p):
        return corr_ops.corr_pyramid(g, p, jax.lax.stop_gradient(coords),
                                     kk, jj)

    out, vjp = jax.vjp(fwd, gmap, pyr)
    ct = jnp.cos(out)                       # d/dout of sum(sin(out))
    want_g, want_p = vjp(jnp.where(keep[:, None], ct, 0.0))

    got_g, got_p = jax.grad(
        lambda g, p: jnp.sum(jnp.sin(corr_ops.corr_pyramid_train(
            g, p, coords, kk, jj, key, dropout=dropout))), argnums=(0, 1))(
        gmap, pyr)

    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-5, atol=1e-6)
    for got, want in zip(got_p, want_p):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_dropout_one_equals_full():
    gmap, pyr, coords, kk, jj = _fixture(seed=1)

    def loss_train(g, p):
        return jnp.sum(jnp.sin(corr_ops.corr_pyramid_train(
            g, p, coords, kk, jj, jax.random.PRNGKey(0), dropout=1.0)))

    def loss_full(g, p):
        return jnp.sum(jnp.sin(corr_ops.corr_pyramid(
            g, p, jax.lax.stop_gradient(coords), kk, jj)))

    got = jax.grad(loss_train, argnums=(0, 1))(gmap, pyr)
    want = jax.grad(loss_full, argnums=(0, 1))(gmap, pyr)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
