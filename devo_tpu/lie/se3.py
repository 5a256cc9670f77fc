"""SE(3) in pure JAX.

Functional replacement for the reference's lietorch SE3
(/root/reference/devo/lietorch/include/se3.h and groups.py:266-285).

Storage layout matches lietorch exactly: a trailing 7-vector
[tx, ty, tz, qx, qy, qz, qw]. Tangent vectors are trailing 6-vectors
[tau(3), phi(3)] (translation first). Conventions:

  Exp([tau, phi])  = (J_l(phi) tau, ExpSO3(phi))          (se3.h:133-141)
  Log(t, q)        = [J_l^{-1}(phi) t, phi]               (se3.h:123-131)
  retr(X, xi)      = Exp(xi) * X                          (groups.py:153-156)
  Adj              = [[R, hat(t) R], [0, R]]              (se3.h:57-67)
  act4             = [R p + t w, w]                       (se3.h:52-55)

Everything broadcasts over leading batch dims and is differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import so3
from .quaternion import qconj, qmul, qnormalize, qrot

__all__ = [
    "exp", "log", "inv", "mul", "act", "act4", "adj", "adjT", "retr",
    "matrix", "from_matrix", "identity", "translation", "rotation", "scale",
]


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return g.at[..., 6].set(1.0)


def translation(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., :3]


def rotation(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., 3:7]


def make(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([t, q], axis=-1)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3.exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3.left_jacobian(phi), tau)
    return make(t, q)


def log(g: jnp.ndarray) -> jnp.ndarray:
    t, q = g[..., :3], g[..., 3:7]
    phi = so3.log(q)
    tau = jnp.einsum("...ij,...j->...i", so3.left_jacobian_inverse(phi), t)
    return jnp.concatenate([tau, phi], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q = g[..., :3], g[..., 3:7]
    qi = qconj(q)
    return make(-qrot(qi, t), qi)


def mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    t1, q1 = g1[..., :3], g1[..., 3:7]
    t2, q2 = g2[..., :3], g2[..., 3:7]
    return make(t1 + qrot(q1, t2), qmul(q1, q2))


def act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Action on 3-points."""
    return qrot(g[..., 3:7], p) + g[..., :3]


def act4(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Action on homogeneous 4-points [X, Y, Z, W] (se3.h:52-55)."""
    xyz = qrot(g[..., 3:7], p[..., :3]) + g[..., :3] * p[..., 3:4]
    return jnp.concatenate([xyz, p[..., 3:4]], axis=-1)


def retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Retraction: Exp(xi) * g, with quaternion renormalization."""
    out = mul(exp(xi), g)
    return make(out[..., :3], qnormalize(out[..., 3:7]))


def adj(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Adjoint action on tangent vectors: Adj_g a (se3.h:57-67, 80-82)."""
    t, q = g[..., :3], g[..., 3:7]
    at, ar = a[..., :3], a[..., 3:6]
    Rar = qrot(q, ar)
    top = qrot(q, at) + jnp.cross(t, Rar)
    return jnp.concatenate([top, Rar], axis=-1)


def adjT(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Transposed adjoint: Adj_g^T a (se3.h:84-86; cf. adjSE3 ba_cuda.cu:39-54).

    Adj^T = [[R^T, 0], [ (hat(t) R)^T, R^T ]] so:
      out_t = R^T a_t
      out_r = R^T a_r + R^T (t x a_t)   (since (hat(t)R)^T a_t = R^T hat(t)^T a_t
                                          = -R^T (t x a_t) ... note hat(t)^T = -hat(t))
    """
    t, q = g[..., :3], g[..., 3:7]
    at, ar = a[..., :3], a[..., 3:6]
    qi = qconj(q)
    out_t = qrot(qi, at)
    out_r = qrot(qi, ar) - qrot(qi, jnp.cross(t, at))
    return jnp.concatenate([out_t, out_r], axis=-1)


def matrix(g: jnp.ndarray) -> jnp.ndarray:
    """7-vec -> 4x4 homogeneous transform."""
    R = so3.matrix(g[..., 3:7])
    t = g[..., :3]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    q = so3.from_matrix(T[..., :3, :3])
    return make(T[..., :3, 3], q)


def scale(g: jnp.ndarray, s) -> jnp.ndarray:
    """Scale translation (used by Sim3-style trajectory rescaling)."""
    return make(g[..., :3] * s, g[..., 3:7])
