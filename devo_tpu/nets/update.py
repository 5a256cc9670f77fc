"""Recurrent update operator.

Flax counterpart of /root/reference/devo/enet.py:32-99 (`Update`): injects
context + correlation features into the per-edge hidden state, passes
temporal messages along each patch's edge chain (the reference's
fastba.neighbors CPU round-trip becomes an on-device sort, ops/graph.py),
aggregates over patch groups and frame-pair groups with SoftAgg, runs the
gated-residual "GRU", and emits the 2D flow correction + confidence weights.

All edge arrays are fixed-capacity with a validity mask; parameter names
mirror the torch Sequential indices for checkpoint import.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import GatedResidual, SoftAgg, gradient_clip


class Update(nn.Module):
    dim: int = 384          # dim_inet
    corr_dim: int = 882     # 2 * 49 * P*P

    @nn.compact
    def __call__(
        self,
        net,         # (E, dim) hidden state
        ctx,         # (E, dim) context features imap[kk]
        corr_feat,   # (E, corr_dim)
        ix,          # (E,) predecessor edge index (-1 if none)
        jx,          # (E,) successor edge index (-1 if none)
        kk_seg,      # (E,) dense patch-group ids
        nseg_kk: int,
        ij_seg,      # (E,) dense frame-pair-group ids
        nseg_ij: int,
        mask,        # (E,) bool edge validity
    ):
        m = mask[:, None].astype(net.dtype)

        # corr MLP (enet.py:59-66); Sequential indices 0,2,3(LN),5
        c = nn.Dense(self.dim, name="corr_0")(corr_feat)
        c = nn.relu(c)
        c = nn.Dense(self.dim, name="corr_2")(c)
        c = nn.LayerNorm(epsilon=1e-3, name="corr_3")(c)
        c = nn.relu(c)
        c = nn.Dense(self.dim, name="corr_5")(c)

        net = net + ctx + c
        net = nn.LayerNorm(epsilon=1e-3, name="norm")(net)
        net = net * m  # keep padded edges at exactly zero state

        # temporal message passing (enet.py:86-91). NB: the reference gathers
        # net[jx] AFTER the c1 residual has updated net — sequential, not
        # parallel, message passing.
        mask_ix = ((ix >= 0) & mask)[:, None].astype(net.dtype)
        mask_jx = ((jx >= 0) & mask)[:, None].astype(net.dtype)

        prev = net[jnp.clip(ix, 0, None)] * mask_ix
        h1 = nn.Dense(self.dim, name="c1_0")(prev)
        h1 = nn.relu(h1)
        net = net + nn.Dense(self.dim, name="c1_2")(h1)

        nxt = net[jnp.clip(jx, 0, None)] * mask_jx
        h2 = nn.Dense(self.dim, name="c2_0")(nxt)
        h2 = nn.relu(h2)
        net = net + nn.Dense(self.dim, name="c2_2")(h2)

        # soft aggregation over patch id and frame pair (enet.py:93-94)
        net = net + SoftAgg(self.dim, name="agg_kk")(net, kk_seg, nseg_kk, mask)
        net = net + SoftAgg(self.dim, name="agg_ij")(net, ij_seg, nseg_ij, mask)

        # "GRU": 2x (LayerNorm + GatedResidual) (enet.py:52-57)
        net = nn.LayerNorm(epsilon=1e-3, name="gru_0")(net)
        net = GatedResidual(self.dim, name="gru_1")(net)
        net = nn.LayerNorm(epsilon=1e-3, name="gru_2")(net)
        net = GatedResidual(self.dim, name="gru_3")(net)
        net = net * m

        # output heads (enet.py:68-77)
        delta = nn.Dense(2, name="d_1")(nn.relu(net))
        delta = gradient_clip(delta)
        weight = nn.Dense(2, name="w_1")(nn.relu(net))
        weight = nn.sigmoid(gradient_clip(weight))

        return net, delta, weight
