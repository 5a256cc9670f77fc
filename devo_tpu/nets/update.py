"""Recurrent update operator.

Flax counterpart of /root/reference/devo/enet.py:32-99 (`Update`): injects
context + correlation features into the per-edge hidden state, passes
temporal messages along each patch's edge chain (sequentially, matching the
reference's in-place semantics at enet.py:90-91), aggregates over patch
groups and frame-pair groups with SoftAgg, runs the gated-residual "GRU",
and emits the 2D flow correction + confidence weights.

All edge arrays are fixed-capacity with a validity mask; when the table is
sorted by patch id (`kk_sorted=True`, the engine's invariant), neighbor
lookups come in precomputed and the patch-group aggregation uses the
cumsum-boundary path. Dense layers run in `dtype` (bf16 under mixed
precision, devo.py:311); LayerNorms stay f32 like torch autocast.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import GatedResidual, SoftAgg, gradient_clip


class Update(nn.Module):
    dim: int = 384          # dim_inet
    corr_dim: int = 882     # 2 * 49 * P*P
    dtype: jnp.dtype = jnp.float32

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
        kk_sorted: bool = False,
    ):
        dt = self.dtype
        m = mask[:, None].astype(jnp.float32)

        # corr MLP (enet.py:59-66); Sequential indices 0,2,3(LN),5
        c = nn.Dense(self.dim, name="corr_0", dtype=dt)(corr_feat.astype(dt))
        c = nn.relu(c)
        c = nn.Dense(self.dim, name="corr_2", dtype=dt)(c)
        c = nn.LayerNorm(epsilon=1e-3, name="corr_3")(c.astype(jnp.float32))
        c = nn.relu(c)
        c = nn.Dense(self.dim, name="corr_5", dtype=dt)(c)

        net = net + ctx + c.astype(jnp.float32)
        net = nn.LayerNorm(epsilon=1e-3, name="norm")(net)
        net = net * m  # keep padded edges at exactly zero state

        # temporal message passing (enet.py:86-91). NB: the reference gathers
        # net[jx] AFTER the c1 residual has updated net — sequential, not
        # parallel, message passing.
        mask_ix = ((ix >= 0) & mask)[:, None].astype(jnp.float32)
        mask_jx = ((jx >= 0) & mask)[:, None].astype(jnp.float32)

        def take(h, idx, shift):
            # on the sorted table neighbors are the adjacent rows, so the
            # lookup is a static shift — an E-row gather lowers to a serial
            # per-row loop on TPU
            if kk_sorted:
                z = jnp.zeros((1, h.shape[1]), h.dtype)
                return (jnp.concatenate([z, h[:-1]], 0) if shift > 0
                        else jnp.concatenate([h[1:], z], 0))
            return h[jnp.clip(idx, 0, None)]

        prev = take(net, ix, +1) * mask_ix
        h1 = nn.Dense(self.dim, name="c1_0", dtype=dt)(prev)
        h1 = nn.relu(h1)
        net = net + nn.Dense(self.dim, name="c1_2", dtype=dt)(h1).astype(jnp.float32)

        nxt = take(net, jx, -1) * mask_jx
        h2 = nn.Dense(self.dim, name="c2_0", dtype=dt)(nxt)
        h2 = nn.relu(h2)
        net = net + nn.Dense(self.dim, name="c2_2", dtype=dt)(h2).astype(jnp.float32)

        # soft aggregation over patch id and frame pair (enet.py:93-94)
        net = net + SoftAgg(self.dim, name="agg_kk", dtype=dt)(
            net, kk_seg, nseg_kk, mask, sorted_ids=kk_sorted).astype(jnp.float32)
        net = net + SoftAgg(self.dim, name="agg_ij", dtype=dt)(
            net, ij_seg, nseg_ij, mask).astype(jnp.float32)

        # "GRU": 2x (LayerNorm + GatedResidual) (enet.py:52-57)
        net = nn.LayerNorm(epsilon=1e-3, name="gru_0")(net)
        net = GatedResidual(self.dim, name="gru_1", dtype=dt)(net)
        net = nn.LayerNorm(epsilon=1e-3, name="gru_2")(net.astype(jnp.float32))
        net = GatedResidual(self.dim, name="gru_3", dtype=dt)(net)
        net = net.astype(jnp.float32) * m

        # output heads (enet.py:68-77)
        delta = nn.Dense(2, name="d_1")(nn.relu(net))
        delta = gradient_clip(delta)
        weight = nn.Dense(2, name="w_1")(nn.relu(net))
        weight = nn.sigmoid(gradient_clip(weight))

        return net, delta, weight
