"""One-hot MXU lookups: the TPU-native replacement for per-edge row gathers.

Measured on v5e (PERF_NOTES.md): XLA lowers an E-row gather into a serial
while loop at ~0.3-20 us/row — 15360 rows of a (2496, 384) table cost
~254 ms. The same lookup as a one-hot matmul costs 0.51 ms: build the
(E, T) one-hot with an iota compare (fused, no materialized gather), feed
the MXU. Exactness: each output row is 1.0 * one table row; bf16 operands
select bf16 values exactly, and f32 tables use HIGH precision (the bf16x3
decomposition reconstructs all 24 mantissa bits — bit-exact for a 0/1
selector, at half HIGHEST's passes), verified bit-exact in
tests/test_lookup.py.

Use for every edge-indexed lookup from a bounded live table (poses,
intrinsics, patches, imap/gmap rings, segment gather-backs). NOT for
E-sized tables (the one-hot becomes (E, E)) — those need a different
structure (sorted adjacency, Pallas, or algorithmic removal).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def onehot(idx: jnp.ndarray, size: int, base=0,
           dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """(E, size) one-hot of (idx - base); out-of-range rows are all-zero."""
    rel = idx - base
    return (rel[:, None] == jnp.arange(size, dtype=idx.dtype)[None, :]
            ).astype(dtype)


def lookup(table: jnp.ndarray, idx: jnp.ndarray, base=0,
           size: Optional[int] = None) -> jnp.ndarray:
    """table[idx] as a one-hot matmul over the live window
    [base, base + size) of axis 0. Out-of-window idx yields zeros.

    base may be traced (dynamic live-window start); size must be static.
    """
    T = table.shape[0]
    if size is None:
        size = T
    whole = size == T and isinstance(base, int) and base == 0
    if not whole:
        base = jnp.clip(base, 0, T - size)
    sub = table if whole else jax.lax.dynamic_slice_in_dim(table, base, size, 0)
    flat = sub.reshape(size, -1)
    if flat.dtype in (jnp.bfloat16, jnp.float16):
        oh = onehot(idx, size, base, flat.dtype)
        out = jax.lax.dot(oh, flat)
    else:
        oh = onehot(idx, size, base, jnp.float32)
        out = jax.lax.dot(oh, flat.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGH)
        out = out.astype(flat.dtype) if flat.dtype != jnp.float32 else out
    return out.reshape((idx.shape[0],) + sub.shape[1:])
