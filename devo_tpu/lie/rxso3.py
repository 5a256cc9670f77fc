"""R x SO(3) (rotation + isotropic scale) in pure JAX.

Replacement for /root/reference/devo/lietorch/include/rxso3.h.
Group element: trailing 5-vector [qx, qy, qz, qw, s] with unit quaternion q
and positive scale s. Tangent: trailing 4-vector [phi(3), sigma].
"""
from __future__ import annotations

import jax.numpy as jnp

from . import so3
from .quaternion import qconj, qmul, qnormalize, qrot

__all__ = ["exp", "log", "inv", "mul", "act", "matrix", "identity", "retr", "adj", "adjT", "act4"]


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.zeros(tuple(shape) + (5,), dtype=dtype)
    return g.at[..., 3].set(1.0).at[..., 4].set(1.0)


def exp(x: jnp.ndarray) -> jnp.ndarray:
    phi, sigma = x[..., :3], x[..., 3:4]
    q = so3.exp(phi)
    return jnp.concatenate([q, jnp.exp(sigma)], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    q, s = g[..., :4], g[..., 4:5]
    return jnp.concatenate([so3.log(q), jnp.log(s)], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    q, s = g[..., :4], g[..., 4:5]
    return jnp.concatenate([qconj(q), 1.0 / s], axis=-1)


def mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    q1, s1 = g1[..., :4], g1[..., 4:5]
    q2, s2 = g2[..., :4], g2[..., 4:5]
    return jnp.concatenate([qmul(q1, q2), s1 * s2], axis=-1)


def act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    q, s = g[..., :4], g[..., 4:5]
    return s * qrot(q, p)


def act4(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Action on a homogeneous 4-vector: sR on xyz, w unchanged
    (include/rxso3.h:65-68)."""
    return jnp.concatenate([act(g, p[..., :3]), p[..., 3:4]], axis=-1)


def matrix(g: jnp.ndarray) -> jnp.ndarray:
    q, s = g[..., :4], g[..., 4:5]
    return s[..., None] * so3.matrix(q)


def retr(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    out = mul(exp(x), g)
    return jnp.concatenate([qnormalize(out[..., :4]), out[..., 4:5]], axis=-1)


def adj(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Adjoint: rotation part rotates phi, sigma is invariant."""
    q = g[..., :4]
    return jnp.concatenate([qrot(q, a[..., :3]), a[..., 3:4]], axis=-1)


def adjT(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    q = g[..., :4]
    return jnp.concatenate([qrot(qconj(q), a[..., :3]), a[..., 3:4]], axis=-1)
