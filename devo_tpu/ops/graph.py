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
import numpy as np

# NOTE: numpy scalar, not jnp — a module-level jnp constant would
# instantiate the device backend at import time (hanging every CLI when
# the TPU tunnel is unreachable, even CPU-forced ones)
INVALID = np.int32(-1)


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


def sorted_neighbors(kk: jnp.ndarray, mask: jnp.ndarray):
    """Temporal neighbors for an edge table already sorted by (kk, jj):
    predecessor/successor are simply the adjacent rows when they share kk
    (replaces the reference's CPU sort, ba.cpp:104-149, with O(E) selects)."""
    E = kk.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    same = (kk[1:] == kk[:-1]) & mask[1:] & mask[:-1]
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), same])
    same_next = jnp.concatenate([same, jnp.zeros((1,), bool)])
    ix = jnp.where(same_prev & mask, idx - 1, -1)
    jx = jnp.where(same_next & mask, idx + 1, -1)
    return ix, jx


def onehot_segment_sum(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Segment sum as a one-hot matmul: (S, E) @ (E, C).

    XLA scatter-adds serialize on TPU; for small-to-moderate S this MXU
    matmul is orders of magnitude faster and deterministic.
    """
    oh = (segment_ids[None, :] == jnp.arange(num_segments, dtype=segment_ids.dtype)[:, None])
    oh = oh.astype(values.dtype)
    if mask is not None:
        oh = oh * mask[None, :].astype(values.dtype)
    # HIGH = bf16x3 passes: the 3-term decomposition reconstructs the full
    # f32 mantissa of each selected value and accumulates in f32 — same
    # accuracy class as f32 scatter-add for 0/1 selectors, at HALF the MXU
    # passes of HIGHEST (bf16x6). Measured 0.27 ms/frame of BA assembly
    # dots at HIGHEST (profile r05).
    return jax.lax.dot(oh, values, precision=jax.lax.Precision.HIGH)


def sorted_segment_sum(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Segment sum for ids already sorted ascending: cumulative sum +
    boundary differences (no scatter). Masked rows must carry an id >= any
    valid id (e.g. num_segments) so they fall past the last boundary."""
    if mask is not None:
        values = jnp.where(mask[:, None], values, 0.0)
    c = jnp.cumsum(values.astype(jnp.float32), axis=0)
    zero = jnp.zeros((1,) + c.shape[1:], c.dtype)
    c = jnp.concatenate([zero, c], axis=0)  # c[i] = sum of first i rows
    bounds = jnp.searchsorted(segment_ids, jnp.arange(num_segments + 1,
                                                      dtype=segment_ids.dtype))
    return (c[bounds[1:]] - c[bounds[:-1]]).astype(values.dtype)


def fast_segment_softmax_sum(
    values: jnp.ndarray,
    weights_logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray,
    sorted_ids: bool = False,
    precision=None,
):
    """Scatter-free segment softmax aggregation.

    Per-segment softmax is shift-invariant, so stabilizing with the single
    GLOBAL max is mathematically exact; the only failure mode is exp
    underflow for segments whose max logit sits >~34 below the global max
    (the denominator guard below zeroes those segments — the update
    operator's logits come out of LayerNorm'd features, far inside that
    range). Sum reductions use cumsum boundaries (sorted ids) or a
    one-hot matmul — no XLA scatter, which serializes on TPU.

    For sorted_ids=True, masked rows must carry id == num_segments (so they
    sort past every boundary). NB the flag currently selects no separate
    code path: a cumsum-boundary reduction needs an S-row gather of the
    cumsum surface, which lowers to a serial per-row loop on TPU and loses
    to the one-hot matmul at every size measured.
    """
    neg = jnp.asarray(-1e30, weights_logits.dtype)
    logits = jnp.where(mask[:, None], weights_logits, neg)
    c = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), -1e29)
    ex = jnp.exp(logits - c)
    ex = jnp.where(mask[:, None], ex, 0.0)
    # one one-hot, four MXU matmuls: segment sums forward ((S,E)@(E,C)) and
    # gather-backs as the transpose ((E,S)@(S,C)). Row gathers from the
    # (S, C) aggregate lower to serial per-row loops on TPU; the matmul
    # form is ~500x faster and exact under HIGHEST precision.
    oh = (segment_ids[None, :]
          == jnp.arange(num_segments, dtype=segment_ids.dtype)[:, None]
          ).astype(ex.dtype)
    # HIGHEST (6-pass bf16 emulation of f32) is exact but ~3x the MXU time
    # of a native pass; the mixed-precision engine path passes DEFAULT
    # (the reference runs this whole block under fp16 autocast anyway,
    # devo.py:71-74)
    hp = precision if precision is not None else jax.lax.Precision.HIGHEST
    # under DEFAULT precision the dot INPUTS go bf16 too (f32 accumulate):
    # the selector rows are exact in bf16 (0/1) and the engine's mixed-
    # precision path re-rounds values the reference autocasts to fp16
    # anyway; f32-in dots at these shapes measured ~0.5 ms/frame (r05)
    bf = hp == jax.lax.Precision.DEFAULT

    def segsum(v):
        if bf:
            return jax.lax.dot(oh.astype(jnp.bfloat16),
                               v.astype(jnp.bfloat16), precision=hp,
                               preferred_element_type=jnp.float32)
        return jax.lax.dot(oh, v, precision=hp)

    def back(a):
        if bf:
            return jax.lax.dot_general(
                oh.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), precision=hp,
                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(oh, a, (((0,), (0,)), ((), ())),
                                   precision=hp)

    denom = segsum(ex)
    # guarded division: a max(denom, 1e-30) guard keeps the FORWARD finite
    # but its VJP carries 1/denom^2 = 1e60 -> inf, and inf * 0-cotangent =
    # NaN — this poisoned every update-operator gradient whenever a segment
    # was empty or its exp mass underflowed. Treat such segments as having
    # no attention mass (exactly what underflow means) on both sides.
    # Threshold choice: 1e-15 keeps 1/db^2 <= 1e30 finite in f32 while only
    # zeroing segments whose max logit sits >~34 below the GLOBAL max
    # (exp(-34) ~ 1.7e-15) — far outside the LayerNorm'd logit spread the
    # update operator produces, and ~e^11 more headroom than a 1e-10 guard.
    db = back(denom)
    ok = db > 1e-15
    w = jnp.where(ok, ex, 0.0) / jnp.where(ok, db, 1.0)
    agg = segsum(values * w)
    return agg, back(agg)


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
    # guarded division (see fast_segment_softmax_sum): 1/max(d, tiny)^2 in
    # the VJP overflows to inf for empty segments and NaNs the backward
    db = denom[segment_ids]
    ok = db > 1e-10
    w = jnp.where(ok, ex, 0.0) / jnp.where(ok, db, 1.0)
    agg = jax.ops.segment_sum(values * w, segment_ids, num_segments=num_segments)
    return agg, agg[segment_ids]
