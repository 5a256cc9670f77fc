"""Network building blocks.

Flax counterparts of /root/reference/devo/blocks.py: GatedResidual, SoftAgg
(scatter-softmax attention pooling over patch-graph groups — torch_scatter
replaced by deterministic segment ops), and the gradient clip/zero autograd
tricks as custom_vjp identities. LayerNorm eps matches the reference (1e-3
inside the update operator).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from devo_tpu.ops.graph import fast_segment_softmax_sum


@jax.custom_vjp
def gradient_clip(x):
    """Identity with clamped backward (devo/blocks.py:74-89): NaN -> 0,
    grad clamped to [-0.01, 0.01]."""
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


@jax.custom_vjp
def gradient_zero(x):
    """Identity; backward zeroes NaNs and grads with |g| > 0.1
    (devo/blocks.py:91-100)."""
    return x


def _gz_fwd(x):
    return x, None


def _gz_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    g = jnp.where(jnp.abs(g) > 0.1, 0.0, g)
    return (g,)


gradient_zero.defvjp(_gz_fwd, _gz_bwd)


class GatedResidual(nn.Module):
    """x + sigmoid(W_g x) * MLP(x) (devo/blocks.py:15-29)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Dense(self.dim, name="gate_0", dtype=self.dtype)(x))
        res = nn.Dense(self.dim, name="res_0", dtype=self.dtype)(x)
        res = nn.relu(res)
        res = nn.Dense(self.dim, name="res_2", dtype=self.dtype)(res)
        return x + gate * res


class SoftAgg(nn.Module):
    """Softmax attention pooling over graph groups (devo/blocks.py:31-48).

    y_seg = sum_e softmax_seg(g(x))_e * f(x)_e ; output h(y)[seg(e)].
    Segment ids must be dense in [0, num_segments); masked edges are inert.
    With sorted_ids=True the reduction uses cumsum boundaries (the ids must
    be ascending with masked rows carrying id == num_segments); otherwise a
    one-hot MXU matmul — never an XLA scatter.
    """
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, segment_ids, num_segments: int, mask,
                 sorted_ids: bool = False):
        f = nn.Dense(self.dim, name="f", dtype=self.dtype)(x)
        g = nn.Dense(self.dim, name="g", dtype=self.dtype)(x)
        prec = (jax.lax.Precision.DEFAULT if self.dtype == jnp.bfloat16
                else None)
        _, agg_e = fast_segment_softmax_sum(
            f.astype(jnp.float32), g.astype(jnp.float32), segment_ids,
            num_segments, mask, sorted_ids=sorted_ids, precision=prec)
        # h(y)[seg(e)] == h(y[seg(e)]): apply the row-wise Dense to the
        # per-edge back-projection (a one-hot matmul) instead of gathering
        # h's output rows — an E-row gather is a serial loop on TPU
        return nn.Dense(self.dim, name="h", dtype=self.dtype)(agg_e)


class LayerNorm1e3(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-3, name="ln")(x)
