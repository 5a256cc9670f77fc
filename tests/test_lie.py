"""Lie-group invariant + gradient tests.

JAX port of the reference's verification strategy
(/root/reference/devo/lietorch/run_tests.py): Log(Exp(x)) == x, X X^-1 == I,
the adjoint identity X Exp(a) == Exp(Adj_X a) X, act-vs-matrix consistency,
plus numeric-vs-analytic gradient checks via jax.test_util.check_grads
(replacing the vendored torch gradcheck).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from devo_tpu.lie import rxso3, se3, sim3, so3

GROUPS = {
    "so3": (so3, 3, 4),
    "rxso3": (rxso3, 4, 5),
    "se3": (se3, 6, 7),
    "sim3": (sim3, 7, 8),
}


def random_tangent(rng, dim, batch=16, scale=1.0):
    return jnp.asarray(rng.standard_normal((batch, dim)) * scale, jnp.float32)


@pytest.mark.parametrize("name", GROUPS)
def test_exp_log_roundtrip(name):
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(0)
    x = random_tangent(rng, dim, scale=0.7)
    x2 = g.log(g.exp(x))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name", GROUPS)
def test_exp_log_roundtrip_small_angle(name):
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(1)
    x = random_tangent(rng, dim, scale=1e-5)
    x2 = g.log(g.exp(x))
    # groups with a scale channel roundtrip through exp/log of s ~ 1.0, which
    # in float32 carries ~1e-6 absolute noise
    atol = 1e-5 if name in ("rxso3", "sim3") else 1e-7
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)


@pytest.mark.parametrize("name", GROUPS)
def test_inv(name):
    g, dim, edim = GROUPS[name]
    rng = np.random.default_rng(2)
    X = g.exp(random_tangent(rng, dim))
    I = g.mul(X, g.inv(X))
    I_ref = np.broadcast_to(np.asarray(g.identity()), I.shape)
    np.testing.assert_allclose(np.asarray(I), I_ref, atol=1e-5)


@pytest.mark.parametrize("name", GROUPS)
def test_adj_identity(name):
    # X * Exp(a) == Exp(Adj_X a) * X   (run_tests.py:30-41)
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(3)
    X = g.exp(random_tangent(rng, dim))
    a = random_tangent(rng, dim, scale=0.3)
    lhs = g.mul(X, g.exp(a))
    rhs = g.mul(g.exp(g.adj(X, a)), X)
    # compare group elements via log of relative transform
    rel = g.log(g.mul(g.inv(lhs), rhs))
    np.testing.assert_allclose(np.asarray(rel), 0.0, atol=1e-4)


@pytest.mark.parametrize("name", GROUPS)
def test_adjT_is_transpose_of_adj(name):
    # <Adj_X a, b> == <a, AdjT_X b>
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(4)
    X = g.exp(random_tangent(rng, dim))
    a = random_tangent(rng, dim)
    b = random_tangent(rng, dim)
    lhs = jnp.sum(g.adj(X, a) * b, axis=-1)
    rhs = jnp.sum(a * g.adjT(X, b), axis=-1)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name", GROUPS)
def test_act_matches_matrix(name):
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(5)
    X = g.exp(random_tangent(rng, dim))
    p = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    y1 = g.act(X, p)
    M = g.matrix(X)
    if M.shape[-1] == 3:
        y2 = jnp.einsum("...ij,...j->...i", M, p)
    else:
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        y2 = jnp.einsum("...ij,...j->...i", M, ph)[..., :3]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_se3_act4_homogeneous():
    rng = np.random.default_rng(6)
    X = se3.exp(random_tangent(rng, 6))
    p = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    y = se3.act4(X, p)
    M = se3.matrix(X)
    y2 = jnp.einsum("...ij,...j->...i", M, p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_sim3_act4_homogeneous():
    rng = np.random.default_rng(7)
    X = sim3.exp(random_tangent(rng, 7))
    p = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    y = sim3.act4(X, p)
    M = sim3.matrix(X)
    y2 = jnp.einsum("...ij,...j->...i", M, p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5,
                               rtol=1e-5)


def test_se3_retr_matches_exp_mul():
    rng = np.random.default_rng(7)
    X = se3.exp(random_tangent(rng, 6))
    a = random_tangent(rng, 6, scale=0.1)
    r1 = se3.retr(X, a)
    r2 = se3.mul(se3.exp(a), X)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


def test_se3_matrix_roundtrip():
    rng = np.random.default_rng(8)
    X = se3.exp(random_tangent(rng, 6))
    X2 = se3.from_matrix(se3.matrix(X))
    # quaternion sign ambiguity: compare via relative log
    rel = se3.log(se3.mul(se3.inv(X), X2))
    np.testing.assert_allclose(np.asarray(rel), 0.0, atol=1e-5)


@pytest.mark.parametrize("name", GROUPS)
def test_exp_gradcheck(name):
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(9)
    x = random_tangent(rng, dim, batch=4, scale=0.5)
    check_grads(g.exp, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("name", GROUPS)
def test_exp_gradcheck_near_zero(name):
    # the Taylor branch must be differentiable too
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(10)
    x = random_tangent(rng, dim, batch=4, scale=1e-5)
    grad = jax.jacrev(lambda v: g.exp(v).sum())(x)
    assert np.isfinite(np.asarray(grad)).all()


@pytest.mark.parametrize("name", GROUPS)
def test_log_gradcheck(name):
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(11)
    X = g.exp(random_tangent(rng, dim, batch=4, scale=0.5))
    check_grads(g.log, (X,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_se3_mul_act_gradcheck():
    rng = np.random.default_rng(12)
    X = se3.exp(random_tangent(rng, 6, batch=4))
    Y = se3.exp(random_tangent(rng, 6, batch=4))
    p = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    check_grads(se3.mul, (X, Y), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    check_grads(se3.act, (X, p), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("name", GROUPS)
def test_inv_gradcheck(name):
    # reference gradcheck suite covers inv (run_tests.py:78-95)
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(14)
    X = g.exp(random_tangent(rng, dim, batch=4, scale=0.5))
    check_grads(g.inv, (X,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("name", GROUPS)
def test_adj_adjT_gradcheck(name):
    # reference gradcheck suite covers adj/adjT (run_tests.py:97-130):
    # gradients w.r.t. BOTH the group element and the tangent argument
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(15)
    X = g.exp(random_tangent(rng, dim, batch=4, scale=0.5))
    a = random_tangent(rng, dim, batch=4, scale=0.5)
    check_grads(g.adj, (X, a), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    check_grads(g.adjT, (X, a), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("name", ["se3", "sim3"])
def test_act4_gradcheck(name):
    # reference gradcheck suite covers act4 (run_tests.py:132-148)
    g, dim, _ = GROUPS[name]
    rng = np.random.default_rng(16)
    X = g.exp(random_tangent(rng, dim, batch=4, scale=0.5))
    p = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
    check_grads(g.act4, (X, p), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_se3_exp_matches_reference_closed_form():
    """Cross-check Exp against the independent closed form used by the fastba
    CUDA kernels (ba_cuda.cu::expSE3: t = tau + a phi x tau + b phi x (phi x tau))."""
    rng = np.random.default_rng(13)
    xi = np.asarray(random_tangent(rng, 6, batch=32))
    tau, phi = xi[:, :3], xi[:, 3:]
    theta = np.linalg.norm(phi, axis=-1, keepdims=True)
    a = (1 - np.cos(theta)) / theta**2
    b = (theta - np.sin(theta)) / theta**3
    t_ref = tau + a * np.cross(phi, tau) + b * np.cross(phi, np.cross(phi, tau))
    g = se3.exp(jnp.asarray(xi))
    np.testing.assert_allclose(np.asarray(g[:, :3]), t_ref, atol=1e-5)


def test_grad_finite_at_degenerate_points():
    """Regression: the exact-branch denominators of log/left_jacobian(_inverse)
    are 0 at identity (and 1/qw is inf at pi-rotations); an unguarded where
    leaks inf*0 = NaN into the BACKWARD even though the forward is masked.
    This poisoned every training gradient upstream of a pose loss."""
    # identity and near-identity rotations
    q_id = so3.identity((3,))
    phi_small = jnp.asarray([[0.0, 0.0, 0.0], [1e-9, 0, 0], [0, 1e-4, 0]])
    # rotation by ~pi (qw ~ 0): exercises the 1/qw Taylor branch unselected
    q_pi = so3.exp(jnp.asarray([[np.pi - 1e-4, 0.0, 0.0]]))

    for fn, x in [
        (lambda q: so3.log(q).sum(), q_id),
        (lambda q: so3.log(q).sum(), q_pi),
        (lambda p: so3.exp(p).sum(), phi_small),
        (lambda p: so3.left_jacobian(p).sum(), phi_small),
        (lambda p: so3.left_jacobian_inverse(p).sum(), phi_small),
        (lambda g: se3.log(g).sum(), se3.identity()[None].repeat(2, 0)),
    ]:
        g = jax.grad(fn)(x)
        assert bool(jnp.all(jnp.isfinite(g))), fn
