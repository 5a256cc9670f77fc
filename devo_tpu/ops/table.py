"""Exact one-hot MXU row "gathers" for the packed edge table.

XLA lowers an E-row fancy-index gather to a sequential per-row loop on TPU
(~0.5-0.9 us/row; a 10240-row 4-array pack measured 4.5 ms — as expensive
as the whole correlation kernel, scripts/bench_table_ops.py). The packed
edge table is rebuilt by such a gather in the per-frame append merge
(runtime/engine.py). This module replaces it with one-hot matmuls on the
MXU, exploiting the merge's structure:

  * the source map is MONOTONE with a hard displacement band: row p of the
    merged table reads old row src[p] with src[p] - p >= -(#inserts) and
    <= #drops. Inserts per merge are bounded by the forward-edge block
    (M * (PATCH_LIFETIME - 1)); drops are typically a few hundred (purge +
    a deferred keyframe cull). The banded path therefore runs a
    block-diagonal (T, S) x (S, D) batched matmul with S = T + blo + bhi
    — ~8x fewer FLOPs and bytes than the full (E, E) one-hot;
  * a traced band-violation check falls back to the full (E, E) one-hot
    (jax.lax.cond), so pathological merges stay correct, just slower.

Exactness (no tolerance anywhere):
  * the one-hot is 0/1, exact in bf16; each output row receives exactly
    one product 1.0 * v with f32 accumulation;
  * i32 columns ride as base-256 digits (each digit < 256 is exact bf16);
  * f32 columns ride as the 3-term bf16 decomposition v = b0 + b1 + b2
    (r0 = v - bf16(v) and r1 = r0 - bf16(r0) are exactly representable
    f32 remainders carrying the next 8 mantissa bits each; 3 x 8 >= 24
    covers the full f32 mantissa) and are re-summed in f32.

Verified bit-exact against fancy-index gathers in tests/test_table.py.
Exactness domain: finite f32 with |v| in {0} u [2^-100, 2^127]. Below
2^-100 the third residual term falls under the bf16 subnormal floor and the
absolute error is bounded by ~1e-38 (harmless for a GRU hidden state);
infinities become NaN (inf - inf in the residual).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_T = 1024          # banded output tile rows (every bucket is a multiple)


def _digits(v: jnp.ndarray) -> jnp.ndarray:
    """(E,) i32 (non-negative, < 2^24) -> (E, 3) bf16 base-256 digits."""
    return jnp.stack([(v // 65536) % 256, (v // 256) % 256, v % 256],
                     axis=-1).astype(jnp.bfloat16)


def _undigits(d: jnp.ndarray) -> jnp.ndarray:
    """(E, 3) f32 digit planes -> (E,) i32."""
    d = d.astype(jnp.int32)
    return d[:, 0] * 65536 + d[:, 1] * 256 + d[:, 2]


def _split3(v: jnp.ndarray):
    """f32 -> three bf16 planes summing exactly back to v."""
    b0 = v.astype(jnp.bfloat16)
    r0 = v - b0.astype(jnp.float32)
    b1 = r0.astype(jnp.bfloat16)
    b2 = (r0 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    return b0, b1, b2


def _unpack(out: jnp.ndarray, Di: int, nsplit: int):
    ii = _undigits(out[:, 0:3])
    jj = _undigits(out[:, 3:6])
    kk = _undigits(out[:, 6:9])
    enet = out[:, 9:9 + Di]
    for s in range(1, nsplit):
        enet = enet + out[:, 9 + s * Di:9 + (s + 1) * Di]
    if nsplit == 1:
        enet = enet.astype(jnp.bfloat16)
    return ii, jj, kk, enet


def take_rows(src: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray,
              kk: jnp.ndarray, enet: jnp.ndarray,
              band: Optional[Tuple[int, int]] = None,
              valid_count=None):
    """(ii[src], jj[src], kk[src], enet[src]) via one-hot matmuls.

    src: (E,) i32 row indices in [0, E). All four gathers share one
    materialized one-hot and one MXU pass over a concatenated
    (*, 9 + 3*Di) bf16 right-hand side.

    band=(blo, bhi): hard displacement bounds src[p] - p in [-blo, bhi]
    for all p < valid_count; enables the block-banded fast path. Rows
    p >= valid_count may violate the band — the banded path returns zeros
    for them (callers overwrite/mask such rows). If a row < valid_count
    violates the band, the call transparently falls back to the full
    (E, E) one-hot inside jax.lax.cond.
    """
    E = src.shape[0]
    Di = enet.shape[1]
    # a bf16 payload rides exactly in ONE plane (one-hot row selection is
    # 1.0 * v with f32 accumulation); f32 needs the 3-term decomposition.
    # Cuts the per-frame merge matmul's columns 3x (profile r03: the banded
    # merge dot was 0.67 ms/frame at D=1161 with an f32 hidden state).
    parts = ([enet] if enet.dtype == jnp.bfloat16 else list(_split3(enet)))
    nsplit = len(parts)
    rhs = jnp.concatenate(
        [_digits(ii), _digits(jj), _digits(kk)] + parts, axis=-1)
    D = rhs.shape[1]

    def full(src):
        oh = (src[:, None] == jnp.arange(E, dtype=src.dtype)[None, :]
              ).astype(jnp.bfloat16)
        return jax.lax.dot(oh, rhs, preferred_element_type=jnp.float32)

    if band is None or E % _T != 0:
        return _unpack(full(src), Di, nsplit)

    blo, bhi = band
    S = -(-(_T + blo + bhi) // 128) * 128
    if S >= E:
        return _unpack(full(src), Di, nsplit)
    nT = E // _T

    def banded(src):
        # tile t covers padded rhs rows [t*T, t*T + S) where padded row
        # r corresponds to original row r - blo
        rhs_p = jnp.pad(rhs, ((blo, S), (0, 0)))
        tiles = jnp.stack([
            jax.lax.slice(rhs_p, (t * _T, 0), (t * _T + S, D))
            for t in range(nT)])                       # (nT, S, D)
        rel = (src.reshape(nT, _T) + blo
               - (jnp.arange(nT, dtype=src.dtype) * _T)[:, None])
        oh = (rel[:, :, None]
              == jnp.arange(S, dtype=src.dtype)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, tiles, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (nT, T, D)
        return out.reshape(E, D)

    p = jnp.arange(E, dtype=src.dtype)
    d = src - p
    care = p < (E if valid_count is None else valid_count)
    viol = jnp.any(((d > bhi) | (d < -blo)) & care)
    out = jax.lax.cond(viol, full, banded, src)
    return _unpack(out, Di, nsplit)
