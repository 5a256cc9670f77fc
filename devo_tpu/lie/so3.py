"""SO(3) in pure JAX.

Functional replacement for the reference's templated Eigen SO3 class
(/root/reference/devo/lietorch/include/so3.h): Exp/Log/Inv/Mul/Adj/act plus
the left Jacobian and its inverse with the same small-angle Taylor branches
(EPS = 1e-6, include/common.h:7). Group elements are unit quaternions stored
as trailing [x, y, z, w]; tangent vectors are trailing 3-vectors.

All branches are computed with clamped arguments so gradients are finite on
both sides of the jnp.where select.
"""
from __future__ import annotations

import jax.numpy as jnp

from .quaternion import EPS, qconj, qmul, qnormalize, qrot, quat_to_matrix, matrix_to_quat

__all__ = [
    "exp", "log", "inv", "mul", "act", "matrix", "from_matrix", "identity",
    "adj", "adjT", "act4", "hat", "left_jacobian", "left_jacobian_inverse", "retr",
]


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def _theta(phi):
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    return theta_sq, theta


def exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: axis-angle 3-vector -> unit quaternion.

    Matches so3.h::Exp / ba_cuda.cu::expSO3 (Taylor below EPS).
    """
    theta_sq, theta = _theta(phi)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < EPS
    th = jnp.where(small, 1.0, theta)   # grad-safe unselected branch
    imag_t = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_t = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    imag_e = jnp.sin(0.5 * th) / th
    real_e = jnp.cos(0.5 * th)
    imag = jnp.where(small, imag_t, imag_e)
    real = jnp.where(small, real_t, real_e)
    return jnp.concatenate([imag * phi, real], axis=-1)


def log(q: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: unit quaternion -> axis-angle 3-vector.

    Mirrors so3.h::Log: theta = 2 atan2(|qv|, qw) with a Taylor expansion of
    the 2*atan2/|qv| factor for small rotations, and sign handling through
    atan2 (returns the rotation with angle in (-pi, pi]).
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    nv = jnp.sqrt(jnp.maximum(nv_sq, 1e-24))
    small = nv_sq < EPS * EPS
    # factor = 2 * atan(nv / qw) / nv (so3.h:146 — minimal angle, sign follows
    # qw); Taylor for nv -> 0: 2/qw - 2/3 nv^2 / qw^3. Branch-free exact form:
    # 2 * sign(qw) * atan2(nv, |qw|) / nv, which also covers qw ~ 0 (+-pi).
    sign_w = jnp.where(qw < 0, -1.0, 1.0)
    # guard the UNSELECTED branch's inputs: where() masks forward values
    # but the backward of 1/qw at qw ~ 0 (rotations near pi, where the
    # exact branch is the one selected) is inf, and inf * 0-mask = NaN
    qw_t = jnp.where(small, qw, 1.0)    # small => |qw| ~ 1, division safe
    factor_t = 2.0 / qw_t - (2.0 / 3.0) * nv_sq / (qw_t * qw_t * qw_t)
    factor_e = 2.0 * sign_w * jnp.arctan2(nv, jnp.abs(qw)) / nv
    factor = jnp.where(small, factor_t, factor_e)
    return factor * qv


def inv(q: jnp.ndarray) -> jnp.ndarray:
    return qconj(q)


def mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    return qmul(q1, q2)


def act(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return qrot(q, p)


def matrix(q: jnp.ndarray) -> jnp.ndarray:
    return quat_to_matrix(q)


def from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_quat(R)


def act4(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Action on a homogeneous 4-vector: rotate xyz, keep w
    (include/so3.h:62-65)."""
    return jnp.concatenate([qrot(q, p[..., :3]), p[..., 3:4]], axis=-1)


def adj(q: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Adjoint action: Adj_q(a) = R a."""
    return qrot(q, a)


def adjT(q: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Transposed adjoint: R^T a = rotate by inverse."""
    return qrot(qconj(q), a)


def retr(q: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Retraction Exp(phi) * q (lietorch groups.py:153-156 convention)."""
    return qnormalize(qmul(exp(phi), q))


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(phi.shape[:-1] + (3, 3))


def left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(phi) (so3.h::left_jacobian)."""
    theta_sq, theta = _theta(phi)
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    small = theta_sq < EPS
    # exact-branch denominators guarded on the Taylor side: theta_sq == 0
    # there, and (1-cos)/0 is NaN whose *backward* survives the where mask
    ts = jnp.where(small, 1.0, theta_sq)
    th = jnp.where(small, 1.0, theta)
    # coef1 = (1 - cos t)/t^2, coef2 = (t - sin t)/t^3
    coef1 = jnp.where(small, 0.5 - theta_sq / 24.0,
                      (1.0 - jnp.cos(th)) / ts)
    coef2 = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                      (th - jnp.sin(th)) / (ts * th))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + coef1[..., None] * Phi + coef2[..., None] * Phi2


def left_jacobian_inverse(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the SO(3) left Jacobian (so3.h::left_jacobian_inverse)."""
    theta_sq, theta = _theta(phi)
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    small = theta_sq < EPS
    # guard the exact branch's denominators on the Taylor side (see
    # left_jacobian): 1/theta_sq and /sin produce inf/NaN whose backward
    # leaks through the where mask as NaN * 0
    ts = jnp.where(small, 1.0, theta_sq)
    th = jnp.where(small, 1.0, theta)
    half_theta = 0.5 * th
    # coef = 1/t^2 - cos(t/2)/(2 t sin(t/2)) ; Taylor: 1/12 + t^2/720
    coef_t = 1.0 / 12.0 + theta_sq / 720.0
    coef_e = 1.0 / ts - jnp.cos(half_theta) / (
        2.0 * th * jnp.sin(half_theta))
    coef = jnp.where(small, coef_t, coef_e)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye - 0.5 * Phi + coef[..., None] * Phi2
