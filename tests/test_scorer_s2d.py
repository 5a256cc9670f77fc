"""Exactness of the space-to-depth scorer (nets/scorer_s2d.py) vs the flax
Scorer + 4x4 max pool (nets/encoder.Scorer, reference selector.py:19-47):
the block-space conv with rearranged weights must reproduce every score the
VALID-cropped full-resolution stack produces, including at the padded
bottom/right border."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.nets.encoder import Scorer
from devo_tpu.nets.evonet import EVONet
from devo_tpu.nets.scorer_s2d import scorer_s2d_forward


@pytest.mark.parametrize("hw", [(64, 64), (48, 80), (480, 640)])
def test_matches_flax_scorer_f32(hw):
    H, W = hw
    scorer = Scorer(bins=5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, H, W, 5)),
                    jnp.float32)
    params = scorer.init(jax.random.PRNGKey(0), x)["params"]
    want = scorer.apply({"params": params}, x)
    got = scorer_s2d_forward(params, x)
    assert got.shape == want.shape == (2, (H - 8) // 4, (W - 8) // 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_matches_flax_scorer_bf16():
    """bf16 compute: both paths accumulate in f32 inside the conv, so they
    agree to bf16 rounding of the taps."""
    scorer = Scorer(bins=5, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 96, 5)),
                    jnp.float32)
    params = Scorer(bins=5).init(jax.random.PRNGKey(0), x)["params"]
    want = scorer.apply({"params": params}, x)
    got = scorer_s2d_forward(params, x, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_patchifier_s2d_flag_matches():
    """run_patchify with scorer_s2d=True selects the same patches and
    returns the same selected scores as the full-res scorer path."""
    kw = dict(P=3, dim_inet=32, dim_fnet=16, dim=8, patch_selector="scorer")
    net0 = EVONet(**kw)
    net1 = EVONet(**kw, scorer_s2d=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 48, 64, 5)),
                    jnp.float32)
    params = net0.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    key = jax.random.PRNGKey(7)
    out0 = net0.apply({"params": params}, x, key, patches_per_image=8,
                      method=EVONet.run_patchify)
    out1 = net1.apply({"params": params}, x, key, patches_per_image=8,
                      method=EVONet.run_patchify)
    np.testing.assert_array_equal(np.asarray(out0["coords"]),
                                  np.asarray(out1["coords"]))
    np.testing.assert_allclose(np.asarray(out0["scores"]),
                               np.asarray(out1["scores"]),
                               atol=1e-5, rtol=1e-5)
