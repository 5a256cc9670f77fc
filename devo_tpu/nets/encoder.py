"""Feature encoders for event voxel grids, NHWC.

Flax counterpart of /root/reference/devo/extractor.py — `BasicEncoder4Evs`
(conv7x7/s2 on 5 voxel bins -> residual stage s1 -> residual stage s2 ->
1x1 output conv; total stride 4) plus the generic ResidualBlock with
instance / group / none normalization. Instance norm follows torch's
InstanceNorm2d defaults (per-sample spatial stats, no affine, eps 1e-5),
which behave identically in train and eval.

Module/parameter naming intentionally mirrors the torch attribute path so
checkpoint import is a mechanical transpose (utils/torch_import.py).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def make_norm(norm_fn: str, channels: int, name: str):
    if norm_fn == "instance":
        return nn.GroupNorm(num_groups=channels, epsilon=1e-5,
                            use_bias=False, use_scale=False, name=name)
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=channels // 8, epsilon=1e-5, name=name)
    if norm_fn == "none":
        return None
    raise NotImplementedError(f"norm_fn={norm_fn} (batch norm is unused by the "
                              f"event model; reference ships no RGB weights)")


class ResidualBlock(nn.Module):
    """Two 3x3 convs + optional strided 1x1 downsample (extractor.py:6-55)."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, name="conv1", dtype=self.dtype)(x)
        n1 = make_norm(self.norm_fn, self.planes, "norm1")
        if n1 is not None:
            y = n1(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2", dtype=self.dtype)(y)
        n2 = make_norm(self.norm_fn, self.planes, "norm2")
        if n2 is not None:
            y = n2(y)
        y = nn.relu(y)

        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        name="downsample", dtype=self.dtype)(x)
            n3 = make_norm(self.norm_fn, self.planes, "norm3")
            if n3 is not None:
                x = n3(x)
        return nn.relu(x + y)


class BasicEncoder4Evs(nn.Module):
    """Stride-4 event-voxel encoder (extractor.py:269-335).

    Input (N, H, W, bins); output (N, H//4, W//4, output_dim).
    """
    output_dim: int = 128
    dim: int = 32
    norm_fn: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (7, 7), strides=(2, 2), padding=3, name="conv1",
                    dtype=self.dtype)(x)
        n1 = make_norm(self.norm_fn, self.dim, "norm1")
        if n1 is not None:
            x = n1(x)
        x = nn.relu(x)

        x = ResidualBlock(self.dim, self.norm_fn, 1, name="layer1_0", dtype=self.dtype)(x)
        x = ResidualBlock(self.dim, self.norm_fn, 1, name="layer1_1", dtype=self.dtype)(x)
        x = ResidualBlock(2 * self.dim, self.norm_fn, 2, name="layer2_0", dtype=self.dtype)(x)
        x = ResidualBlock(2 * self.dim, self.norm_fn, 1, name="layer2_1", dtype=self.dtype)(x)

        return nn.Conv(self.output_dim, (1, 1), name="conv2", dtype=self.dtype)(x)


class Scorer(nn.Module):
    """Patch-selector scoring CNN (devo/selector.py:19-47).

    Four VALID-padded 3x3 convs (bins->8->16->32->1) + 4x4 max pool; output
    resolution is ((H-8)//4, (W-8)//4), one score per 4x4 cell at 1/4 res.
    Input (N, H, W, bins) -> (N, h2, w2).

    `dtype` is the compute dtype (params stay f32): the tiny channel counts
    (5->8->16->32->1) pad to 128 lanes in every full-resolution intermediate
    on TPU, so the stack is bandwidth-bound on padded bytes — bf16 halves
    them (profile r03: 1.6 ms/frame of the engine step at f32). Scores only
    feed sigmoid -> multinomial sampling, far below bf16 noise.
    """
    bins: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(8, (3, 3), padding="VALID", name="scorer_0",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(16, (3, 3), padding="VALID", name="scorer_2",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID", name="scorer_4",
                            dtype=self.dtype)(x))
        x = nn.Conv(1, (3, 3), padding="VALID", name="scorer_6",
                    dtype=self.dtype)(x)
        x = nn.max_pool(x, (4, 4), strides=(4, 4))
        return x[..., 0].astype(jnp.float32)
