"""Sim(3) (similarity transforms) in pure JAX.

Replacement for /root/reference/devo/lietorch/include/sim3.h (+ the calcW /
calcWInv series of rxso3.h:190-285). Group element: trailing 8-vector
[tx, ty, tz, qx, qy, qz, qw, s]. Tangent: trailing 7-vector
[tau(3), phi(3), sigma].

  Exp([tau, phi, sigma]) = ( W(phi, sigma) tau, ExpSO3(phi), e^sigma )
  Log(t, q, s)           = [ W^{-1} t, LogSO3(q), log s ]

with W the Sim3 "left Jacobian" series; branches follow the reference with
EPS = 1e-6 and are select-guarded for jit/grad safety.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import so3
from .quaternion import EPS, qconj, qmul, qnormalize, qrot

__all__ = ["exp", "log", "inv", "mul", "act", "act4", "matrix", "identity",
           "retr", "adj", "adjT"]


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.zeros(tuple(shape) + (8,), dtype=dtype)
    return g.at[..., 6].set(1.0).at[..., 7].set(1.0)


def _calcW(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """W matrix of the Sim3 exponential (rxso3.h::calcW)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    sigma = sigma[..., 0]
    scale = jnp.exp(sigma)
    Phi = so3.hat(phi)
    Phi2 = Phi @ Phi

    small_sigma = jnp.abs(sigma) < EPS
    small_theta = theta < EPS

    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    safe_theta = jnp.where(small_theta, 1.0, theta)
    safe_theta_sq = safe_theta * safe_theta

    # sigma ~ 0 branch
    A_ss = jnp.where(small_theta, 0.5,
                     (1.0 - jnp.cos(safe_theta)) / safe_theta_sq)
    B_ss = jnp.where(small_theta, 1.0 / 6.0,
                     (safe_theta - jnp.sin(safe_theta)) / (safe_theta_sq * safe_theta))
    C_ss = jnp.ones_like(sigma)

    # sigma != 0 branch
    C_s = (scale - 1.0) / safe_sigma
    A_st = ((safe_sigma - 1.0) * scale + 1.0) / (safe_sigma * safe_sigma)
    B_st = (scale * 0.5 * safe_sigma**2 + scale - 1.0 - safe_sigma * scale) / (safe_sigma**3)
    a = scale * jnp.sin(safe_theta)
    b = scale * jnp.cos(safe_theta)
    c = safe_theta_sq + safe_sigma * safe_sigma
    A_se = (a * safe_sigma + (1.0 - b) * safe_theta) / (safe_theta * c)
    B_se = (C_s - ((b - 1.0) * safe_sigma + a * safe_theta) / c) / safe_theta_sq

    A = jnp.where(small_sigma, A_ss, jnp.where(small_theta, A_st, A_se))
    B = jnp.where(small_sigma, B_ss, jnp.where(small_theta, B_st, B_se))
    C = jnp.where(small_sigma, C_ss, C_s)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return A[..., None, None] * Phi + B[..., None, None] * Phi2 + C[..., None, None] * eye


def _calcWInv(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Inverse W matrix (rxso3.h::calcWInv)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    sigma = sigma[..., 0]
    scale = jnp.exp(sigma)
    scale_sq = scale * scale
    Phi = so3.hat(phi)
    Phi2 = Phi @ Phi
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    small_sigma = sigma * sigma < EPS
    small_theta = theta_sq < EPS
    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    safe_theta = jnp.where(small_theta, 1.0, theta)
    safe_theta_sq = safe_theta * safe_theta
    safe_scale = jnp.where(small_sigma, 2.0, scale)  # avoid scale-1 == 0

    # sigma ~ 0
    c_ss = 1.0 - 0.5 * sigma
    a_ss = jnp.full_like(sigma, -0.5)
    b_ss = jnp.where(
        small_theta,
        jnp.full_like(sigma, 1.0 / 12.0),
        (safe_theta * sin_t + 2.0 * cos_t - 2.0)
        / (2.0 * safe_theta_sq * jnp.where(small_theta, 1.0, cos_t - 1.0)),
    )

    # sigma != 0
    scale_cu = scale_sq * safe_scale
    c_s = safe_sigma / (safe_scale - 1.0)
    a_st = (-safe_sigma * safe_scale + safe_scale - 1.0) / ((safe_scale - 1.0) ** 2)
    b_st = (scale_sq * safe_sigma - 2.0 * scale_sq + safe_scale * safe_sigma + 2.0 * safe_scale) / (
        2.0 * scale_cu - 6.0 * scale_sq + 6.0 * safe_scale - 2.0)
    s_sin = safe_scale * sin_t
    s_cos = safe_scale * cos_t
    a_se = (safe_theta * s_cos - safe_theta - safe_sigma * s_sin) / (
        safe_theta * (scale_sq - 2.0 * s_cos + 1.0))
    b_se = -safe_scale * (
        safe_theta * s_sin - safe_theta * sin_t + safe_sigma * s_cos
        - safe_scale * safe_sigma + safe_sigma * cos_t - safe_sigma
    ) / (safe_theta_sq * (scale_cu - 2.0 * safe_scale * s_cos - scale_sq
                          + 2.0 * s_cos + safe_scale - 1.0))

    a = jnp.where(small_sigma, a_ss, jnp.where(small_theta, a_st, a_se))
    b = jnp.where(small_sigma, b_ss, jnp.where(small_theta, b_st, b_se))
    c = jnp.where(small_sigma, c_ss, c_s)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return a[..., None, None] * Phi + b[..., None, None] * Phi2 + c[..., None, None] * eye


def exp(x: jnp.ndarray) -> jnp.ndarray:
    tau, phi, sigma = x[..., :3], x[..., 3:6], x[..., 6:7]
    q = so3.exp(phi)
    W = _calcW(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return jnp.concatenate([t, q, jnp.exp(sigma)], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    phi = so3.log(q)
    sigma = jnp.log(s)
    Winv = _calcWInv(phi, sigma)
    tau = jnp.einsum("...ij,...j->...i", Winv, t)
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qi = qconj(q)
    return jnp.concatenate([-qrot(qi, t) / s, qi, 1.0 / s], axis=-1)


def mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    t1, q1, s1 = g1[..., :3], g1[..., 3:7], g1[..., 7:8]
    t2, q2, s2 = g2[..., :3], g2[..., 3:7], g2[..., 7:8]
    return jnp.concatenate(
        [t1 + s1 * qrot(q1, t2), qmul(q1, q2), s1 * s2], axis=-1)


def act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    return s * qrot(q, p) + t


def act4(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    xyz = s * qrot(q, p[..., :3]) + t * p[..., 3:4]
    return jnp.concatenate([xyz, p[..., 3:4]], axis=-1)


def matrix(g: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    R = s[..., None] * so3.matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def retr(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    out = mul(exp(x), g)
    return jnp.concatenate(
        [out[..., :3], qnormalize(out[..., 3:7]), out[..., 7:8]], axis=-1)


def adj(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Adjoint action Adj_g a on tangent [tau, phi, sigma] (sim3.h:89-105):

      Adj = [[ sR, hat(t) R, -t ],
             [  0,        R,  0 ],
             [  0,        0,  1 ]]
    """
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    at, ap, as_ = a[..., :3], a[..., 3:6], a[..., 6:7]
    Rap = qrot(q, ap)
    out_t = s * qrot(q, at) + jnp.cross(t, Rap) - as_ * t
    return jnp.concatenate([out_t, Rap, as_], axis=-1)


def adjT(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Transposed adjoint Adj_g^T a (sim3.h:107-109):
      out_tau   = s R^T a_tau
      out_phi   = R^T (a_phi - t x a_tau)   ((hat(t)R)^T = -R^T hat(t))
      out_sigma = a_sigma - t . a_tau
    """
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    at, ap, as_ = a[..., :3], a[..., 3:6], a[..., 6:7]
    qi = qconj(q)
    out_t = s * qrot(qi, at)
    out_p = qrot(qi, ap - jnp.cross(t, at))
    out_s = as_ - jnp.sum(t * at, axis=-1, keepdims=True)
    return jnp.concatenate([out_t, out_p, out_s], axis=-1)
