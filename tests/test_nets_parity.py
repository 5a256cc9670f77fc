"""Weight-import parity tests against the torch reference modules.

The reference encoder (devo/extractor.py) imports cleanly with CPU torch, so
we instantiate it with random weights, convert the state_dict through
utils/torch_import.py, and require the flax forward to match bit-for-bit
(within f32 tolerance). This validates conv layout, padding, instance-norm
eval semantics and the parameter naming contract that DEVO.pth import
relies on (devo.py:103-133).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from devo_tpu.nets.encoder import BasicEncoder4Evs, Scorer
from devo_tpu.utils.torch_import import convert_state_dict


def _strip_prefix(params, prefix):
    node = params
    for p in prefix.split("/"):
        node = node[p]
    return node


@pytest.mark.parametrize("norm_fn", ["instance", "none"])
def test_encoder_matches_torch_reference(norm_fn):
    from devo.extractor import BasicEncoder4Evs as TorchEnc

    torch.manual_seed(0)
    tenc = TorchEnc(output_dim=64, dim=16, norm_fn=norm_fn).eval()

    sd = {f"patchify.fnet.{k}": v for k, v in tenc.state_dict().items()}
    params = convert_state_dict(sd)["patchify"]["fnet"]

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 48, 64, 5)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))[None]  # (1, n, c, h, w)
        want = tenc(xt)[0].numpy().transpose(0, 2, 3, 1)

    enc = BasicEncoder4Evs(output_dim=64, dim=16, norm_fn=norm_fn)
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_scorer_matches_torch_reference():
    """Scorer is defined in devo/selector.py which needs torchvision; rebuild
    the same Sequential with plain torch as the executable spec
    (selector.py:19-47)."""
    torch.manual_seed(1)
    tnet = torch.nn.Sequential(
        torch.nn.Conv2d(5, 8, 3), torch.nn.ReLU(),
        torch.nn.Conv2d(8, 16, 3), torch.nn.ReLU(),
        torch.nn.Conv2d(16, 32, 3), torch.nn.ReLU(),
        torch.nn.Conv2d(32, 1, 3), torch.nn.MaxPool2d(4, 4),
    ).eval()

    sd = {f"patchify.scorer.scorer.{k}": v for k, v in tnet.state_dict().items()}
    params = convert_state_dict(sd)["patchify"]["scorer"]

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 56, 72, 5)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()[:, 0]

    got = np.asarray(Scorer().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_update_matches_torch_spec():
    """Update-operator parity: plain-torch transcription of enet.py:32-99
    (with scatter_softmax/scatter_sum and neighbors done in numpy) vs the
    flax Update on identical weights."""
    import torch.nn as tnn

    dim, P = 48, 3
    corr_dim = 2 * 49 * P * P

    class TorchUpdate(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Sequential(tnn.Linear(dim, dim), tnn.ReLU(), tnn.Linear(dim, dim))
            self.c2 = tnn.Sequential(tnn.Linear(dim, dim), tnn.ReLU(), tnn.Linear(dim, dim))
            self.norm = tnn.LayerNorm(dim, eps=1e-3)
            for agg in ("agg_kk", "agg_ij"):
                mod = tnn.Module()
                mod.f = tnn.Linear(dim, dim)
                mod.g = tnn.Linear(dim, dim)
                mod.h = tnn.Linear(dim, dim)
                setattr(self, agg, mod)
            gate1, gate3 = tnn.Module(), tnn.Module()
            for g in (gate1, gate3):
                g.gate = tnn.Sequential(tnn.Linear(dim, dim), tnn.Sigmoid())
                g.res = tnn.Sequential(tnn.Linear(dim, dim), tnn.ReLU(), tnn.Linear(dim, dim))
            self.gru = tnn.ModuleList([tnn.LayerNorm(dim, eps=1e-3), gate1,
                                       tnn.LayerNorm(dim, eps=1e-3), gate3])
            self.corr = tnn.Sequential(
                tnn.Linear(corr_dim, dim), tnn.ReLU(), tnn.Linear(dim, dim),
                tnn.LayerNorm(dim, eps=1e-3), tnn.ReLU(), tnn.Linear(dim, dim))
            self.d = tnn.Sequential(tnn.ReLU(), tnn.Linear(dim, 2))
            self.w = tnn.Sequential(tnn.ReLU(), tnn.Linear(dim, 2), tnn.Sigmoid())

        def softagg(self, mod, x, ix):
            _, jx = np.unique(ix, return_inverse=True)
            jx = torch.from_numpy(jx)
            S = int(jx.max()) + 1
            g = mod.g(x)
            f = mod.f(x)
            w = torch.zeros(S, dim)
            mx = torch.full((S, dim), -1e30)
            for s in range(S):
                mx[s] = g[jx == s].max(0).values
            ex = torch.exp(g - mx[jx])
            den = torch.zeros(S, dim).index_add_(0, jx, ex)
            y = torch.zeros(S, dim).index_add_(0, jx, f * ex / den[jx])
            return mod.h(y)[jx]

        def gated(self, g, x):
            return x + g.gate(x) * g.res(x)

        def forward(self, net, inp, corr, kk, jj, ixn, jxn):
            net = net + inp + self.corr(corr)
            net = self.norm(net)
            mask_ix = torch.from_numpy((ixn >= 0).astype(np.float32))[:, None]
            mask_jx = torch.from_numpy((jxn >= 0).astype(np.float32))[:, None]
            net = net + self.c1(mask_ix * net[ixn])
            net = net + self.c2(mask_jx * net[jxn])
            net = net + self.softagg(self.agg_kk, net, kk)
            net = net + self.softagg(self.agg_ij, net, kk * 0 + (kk * 12345 + jj))
            net = self.gru[0](net)
            net = self.gated(self.gru[1], net)
            net = self.gru[2](net)
            net = self.gated(self.gru[3], net)
            return net, self.d(net), self.w(net)

    torch.manual_seed(2)
    tupd = TorchUpdate().eval()

    # rename gru gated-residual children to Sequential-style indices
    sd = {}
    for k, v in tupd.state_dict().items():
        k2 = ("update." + k)
        sd[k2] = v
    params = convert_state_dict(sd)["update"]

    rng = np.random.default_rng(2)
    E = 40
    kk = rng.integers(0, 9, E).astype(np.int64)
    jj = rng.integers(0, 6, E).astype(np.int64)
    net0 = rng.standard_normal((E, dim)).astype(np.float32)
    ctx = rng.standard_normal((E, dim)).astype(np.float32)
    corr = rng.standard_normal((E, corr_dim)).astype(np.float32)

    # neighbors computed once in numpy (spec from ba.cpp:104-149)
    from tests.test_ops import naive_neighbors
    ixn, jxn = naive_neighbors(kk, jj, np.ones(E, bool))

    with torch.no_grad():
        tw = tupd(torch.from_numpy(net0), torch.from_numpy(ctx),
                  torch.from_numpy(corr), torch.from_numpy(kk),
                  torch.from_numpy(jj), ixn, jxn)
        want_net, want_d, want_w = [t.numpy() for t in tw]

    from devo_tpu.nets.update import Update

    upd = Update(dim=dim, corr_dim=corr_dim)
    # dense segment ids equivalent to torch.unique(..., return_inverse)
    _, kk_seg = np.unique(kk, return_inverse=True)
    _, ij_seg = np.unique(kk * 12345 + jj, return_inverse=True)
    got_net, got_d, got_w = upd.apply(
        {"params": params}, jnp.asarray(net0), jnp.asarray(ctx), jnp.asarray(corr),
        jnp.asarray(ixn, jnp.int32), jnp.asarray(jxn, jnp.int32),
        jnp.asarray(kk_seg, jnp.int32), int(kk_seg.max()) + 1,
        jnp.asarray(ij_seg, jnp.int32), int(ij_seg.max()) + 1,
        jnp.ones(E, bool))

    np.testing.assert_allclose(np.asarray(got_net), want_net, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_w), want_w, atol=2e-4, rtol=2e-4)
