"""Exactness of the block-diagonal fused fnet+inet forward vs the two flax
encoders (nets/fused_encoder.py): conv with block-diagonal kernels over
channel-concatenated inputs must equal per-branch conv exactly, and the
lane-masked instance norm must match flax GroupNorm(num_groups=C)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.nets.encoder import BasicEncoder4Evs
from devo_tpu.nets.evonet import EVONet
from devo_tpu.nets.fused_encoder import fused_encode


def _nets(dim=8, df=16, di=24):
    fnet = BasicEncoder4Evs(output_dim=df, dim=dim, norm_fn="instance")
    inet = BasicEncoder4Evs(output_dim=di, dim=dim, norm_fn="none")
    return fnet, inet


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_separate(dtype):
    fnet, inet = _nets()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 40, 5)),
                    jnp.float32)
    pf = fnet.init(jax.random.PRNGKey(0), x)["params"]
    pi = inet.init(jax.random.PRNGKey(1), x)["params"]

    fnet_t = BasicEncoder4Evs(output_dim=16, dim=8, norm_fn="instance",
                              dtype=dtype)
    inet_t = BasicEncoder4Evs(output_dim=24, dim=8, norm_fn="none",
                              dtype=dtype)
    want_f = fnet_t.apply({"params": pf}, x)
    want_i = inet_t.apply({"params": pi}, x)
    got_f, got_i = fused_encode(pf, pi, x, dtype=dtype)

    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got_f, np.float32),
                               np.asarray(want_f, np.float32),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(got_i, np.float32),
                               np.asarray(want_i, np.float32),
                               atol=tol, rtol=tol)


def test_patchifier_fused_flag_matches():
    """run_patchify with fused_encoders=True returns the same fmap and the
    same selected patches as the unfused path (same params, same key)."""
    kw = dict(P=3, dim_inet=32, dim_fnet=16, dim=8, patch_selector="scorer")
    net0 = EVONet(**kw)
    net1 = EVONet(**kw, fused_encoders=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 48, 64, 5)),
                    jnp.float32)
    params = net0.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    key = jax.random.PRNGKey(7)
    out0 = net0.apply({"params": params}, x, key, patches_per_image=8,
                      method=EVONet.run_patchify)
    out1 = net1.apply({"params": params}, x, key, patches_per_image=8,
                      method=EVONet.run_patchify)
    np.testing.assert_allclose(np.asarray(out1["fmap"]),
                               np.asarray(out0["fmap"]), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out1["coords"]),
                                  np.asarray(out0["coords"]))
    np.testing.assert_allclose(np.asarray(out1["imap"]),
                               np.asarray(out0["imap"]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["gmap"]),
                               np.asarray(out0["gmap"]), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_s2d_matches_fused(dtype):
    """fused_encode_s2d (stage 1 in space-to-depth(2) layout) must equal
    fused_encode: the entry/block/exit kernels are sparse rearrangements of
    the same weights and the pos-grouped instance norm pools the same
    statistics."""
    from devo_tpu.nets.fused_encoder import fused_encode_s2d

    fnet, inet = _nets()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 32, 48, 5)),
                    jnp.float32)
    pf = fnet.init(jax.random.PRNGKey(0), x)["params"]
    pi = inet.init(jax.random.PRNGKey(1), x)["params"]

    want_f, want_i = fused_encode(pf, pi, x, dtype=dtype)
    got_f, got_i = fused_encode_s2d(pf, pi, x, dtype=dtype)

    tol = 1e-4 if dtype == jnp.float32 else 6e-2
    np.testing.assert_allclose(np.asarray(got_f, np.float32),
                               np.asarray(want_f, np.float32),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(got_i, np.float32),
                               np.asarray(want_i, np.float32),
                               atol=tol, rtol=tol)
