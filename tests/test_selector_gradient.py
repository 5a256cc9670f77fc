"""GRADIENT patch selector (reference enet.py:115-141): pooled event-
gradient magnitude map + sampler, with torch.avg_pool2d as the pooling
oracle and the Patchifier wiring checked end-to-end."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devo_tpu.nets import selector as sel
from devo_tpu.nets.evonet import EVONet


def test_event_gradient_matches_torch_oracle():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    vox = rng.standard_normal((2, 33, 47, 5)).astype(np.float32)

    got = np.asarray(sel.event_gradient(jnp.asarray(vox)))

    im = torch.from_numpy(vox).sum(dim=-1)           # (n, H, W)
    dx = im[:, :-1, 1:] - im[:, :-1, :-1]
    dy = im[:, 1:, :-1] - im[:, :-1, :-1]
    g = torch.sqrt(dx ** 2 + dy ** 2)
    want = F.avg_pool2d(g.unsqueeze(1), 4, 4).squeeze(1).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_select_3xrandom_picks_top_weights():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.random((2, 12, 17)), jnp.float32)
    key = jax.random.PRNGKey(3)
    x, y = sel.select_3xrandom(key, w, ppi=6)
    assert x.shape == y.shape == (2, 6)
    # reproduce the candidate draw and verify the kept ones are the top-6
    kx, ky = jax.random.split(key)
    cx = np.asarray(jax.random.randint(kx, (2, 18), 0, 17))
    cy = np.asarray(jax.random.randint(ky, (2, 18), 0, 12))
    wn = np.asarray(w)
    for n in range(2):
        cand = wn[n, cy[n], cx[n]]
        kept = wn[n, np.asarray(y)[n] - 1, np.asarray(x)[n] - 1]
        np.testing.assert_allclose(np.sort(kept),
                                   np.sort(cand)[-6:], rtol=1e-6)


@pytest.mark.parametrize("mode", ["multi", "topk"])
def test_patchifier_gradient_selector(mode):
    net = EVONet(P=3, dim_inet=32, dim_fnet=16, dim=8,
                 patch_selector="gradient")
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 48, 64, 5)),
                    jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    assert "scorer" not in params["patchify"], \
        "gradient selector must not allocate scorer parameters"
    out = net.apply({"params": params}, x, jax.random.PRNGKey(5),
                    patches_per_image=8, scorer_eval_mode=mode,
                    method=EVONet.run_patchify)
    coords = np.asarray(out["coords"])      # (1, ppi, 2) at feature res
    h, w = 48 // 4, 64 // 4
    assert coords.shape == (1, 8, 2)
    assert (coords[..., 0] >= 1).all() and (coords[..., 0] <= w - 2).all()
    assert (coords[..., 1] >= 1).all() and (coords[..., 1] <= h - 2).all()
    # training path: 3xrandom, no scores
    out_t = net.apply({"params": params}, x, jax.random.PRNGKey(6),
                      patches_per_image=8, training=True,
                      method=EVONet.run_patchify)
    assert out_t["scores"] is None
