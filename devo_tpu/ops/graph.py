"""Patch-graph index operations, on device.

Replaces the reference's CPU-side `cuda_ba.neighbors`
(/root/reference/devo/fastba/ba.cpp:104-149) — which forced a GPU->CPU->GPU
round-trip on every update iteration — with a sort-based formulation that
stays on the TPU, plus the segment-softmax used by the SoftAgg blocks
(devo/blocks.py:31-48) with deterministic segment_sum instead of atomics.

All functions take fixed-capacity edge arrays with a validity mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID = jnp.int32(-1)


def neighbors(kk: jnp.ndarray, jj: jnp.ndarray, mask: jnp.ndarray):
    """Temporal predecessor/successor edge indices.

    For each edge e, among edges with the same patch kk, find the previous /
    next edge in ascending-jj order (ba.cpp:127-136). Invalid entries get -1.

    Args:
      kk, jj: (E,) int32; mask: (E,) bool.
    Returns:
      (ix, jx): (E,) int32 each, -1 where no neighbor / invalid edge.
    """
    E = kk.shape[0]
    big = jnp.int32(0x3FFFFFFF)
    kk_key = jnp.where(mask, kk, big)
    jj_key = jnp.where(mask, jj, big)

    # lexicographic (kk, jj) via two stable sorts
    perm1 = jnp.argsort(jj_key, stable=True)
    perm2 = jnp.argsort(kk_key[perm1], stable=True)
    order = perm1[perm2]  # (E,) edge ids in (kk, jj) order

    kk_sorted = kk_key[order]
    valid_sorted = mask[order]

    prev_edge = jnp.concatenate([jnp.full((1,), -1, jnp.int32), order[:-1].astype(jnp.int32)])
    next_edge = jnp.concatenate([order[1:].astype(jnp.int32), jnp.full((1,), -1, jnp.int32)])
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), kk_sorted[1:] == kk_sorted[:-1]])
    same_next = jnp.concatenate([kk_sorted[1:] == kk_sorted[:-1], jnp.zeros((1,), bool)])

    prev_edge = jnp.where(same_prev & valid_sorted, prev_edge, -1)
    next_edge = jnp.where(same_next & valid_sorted, next_edge, -1)

    ix = jnp.zeros((E,), jnp.int32).at[order].set(prev_edge)
    jx = jnp.zeros((E,), jnp.int32).at[order].set(next_edge)
    ix = jnp.where(mask, ix, -1)
    jx = jnp.where(mask, jx, -1)
    return ix, jx


def segment_softmax_sum(
    values: jnp.ndarray,
    weights_logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray,
):
    """softmax-weighted segment aggregation (torch_scatter.scatter_softmax +
    scatter_sum as used by SoftAgg, devo/blocks.py:40-48).

    Args:
      values:         (E, C) f(x) values to aggregate.
      weights_logits: (E, C) g(x) logits (per-channel softmax, as in the
                      reference where g(x) has dim C).
      segment_ids:    (E,) int32 in [0, num_segments).
      mask:           (E,) bool; masked rows contribute nothing.

    Returns:
      (aggregated (num_segments, C), per-edge gathered (E, C)).
    """
    neg = jnp.asarray(-1e30, weights_logits.dtype)
    logits = jnp.where(mask[:, None], weights_logits, neg)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.maximum(seg_max, -1e29)  # empty segments
    ex = jnp.exp(logits - seg_max[segment_ids])
    ex = jnp.where(mask[:, None], ex, 0.0)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    w = ex / jnp.maximum(denom[segment_ids], 1e-20)
    agg = jax.ops.segment_sum(values * w, segment_ids, num_segments=num_segments)
    return agg, agg[segment_ids]
