"""Golden tests for projective patch geometry.

The analytic Jacobians (Ji, Jj, Jz) are validated against finite differences
of the reprojection under SE3 retraction / depth perturbation — the same
executable specification the reference encodes in devo/projective_ops.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.geom import projective as pops
from devo_tpu.lie import se3


def make_scene(seed=0, n_frames=5, n_patches=12, P=3):
    rng = np.random.default_rng(seed)
    xi = rng.standard_normal((n_frames, 6)) * 0.1
    poses = se3.exp(jnp.asarray(xi, jnp.float32))
    # patch centers in a 120x160 feature grid, inverse depths ~ U(0.5, 2)
    cx = rng.uniform(20, 140, (n_patches, 1, 1))
    cy = rng.uniform(20, 100, (n_patches, 1, 1))
    off = np.arange(P) - P // 2
    px = cx + off[None, None, :]
    py = cy + off[None, :, None]
    d = np.broadcast_to(rng.uniform(0.5, 2.0, (n_patches, 1, 1)), (n_patches, P, P))
    patches = jnp.asarray(np.stack([np.broadcast_to(px, (n_patches, P, P)),
                                    np.broadcast_to(py, (n_patches, P, P)), d], axis=1),
                          jnp.float32)
    intr = jnp.asarray(np.tile([120.0, 120.0, 80.0, 60.0], (n_frames, 1)), jnp.float32)
    ii = jnp.asarray(rng.integers(0, n_frames, n_patches), jnp.int32)
    jj = jnp.asarray(rng.integers(0, n_frames, n_patches), jnp.int32)
    kk = jnp.arange(n_patches, dtype=jnp.int32)
    return poses, patches, intr, ii, jj, kk


def test_transform_identity_is_noop():
    poses, patches, intr, ii, jj, kk = make_scene()
    coords = pops.transform(poses, patches, intr, ii, ii, kk)
    expect = jnp.stack([patches[:, 0], patches[:, 1]], axis=-1)
    np.testing.assert_allclose(np.asarray(coords), np.asarray(expect), atol=1e-3, rtol=1e-4)


def test_jacobian_jz_finite_difference():
    poses, patches, intr, ii, jj, kk = make_scene(1)
    coords, v, (Ji, Jj, Jz) = pops.transform(poses, patches, intr, ii, jj, kk, jacobian=True)
    P = patches.shape[-1]
    eps = 1e-3

    def center(patches_):
        c = pops.transform(poses, patches_, intr, ii, jj, kk)
        return c[:, P // 2, P // 2, :]

    dpatches = patches.at[:, 2].add(eps)
    fd = (center(dpatches) - center(patches)) / eps  # (E, 2)
    np.testing.assert_allclose(np.asarray(Jz[..., 0]), np.asarray(fd), atol=2e-2, rtol=2e-2)


def _fd_pose_jacobian(poses, patches, intr, ii, jj, kk, which, eps=1e-3):
    """Finite-difference d(center coords)/d(xi) for retraction on pose ii or jj."""
    P = patches.shape[-1]
    E = ii.shape[0]
    cols = []
    for d in range(6):
        xi = jnp.zeros((poses.shape[0], 6), jnp.float32)

        def perturbed(sign):
            dxi = jnp.zeros((E, 6), jnp.float32).at[:, d].set(sign * eps)
            # perturb pose per-edge: apply retr to the gathered pose
            pi = poses[ii]
            pj = poses[jj]
            if which == "i":
                pi = se3.retr(pi, dxi)
            else:
                pj = se3.retr(pj, dxi)
            Gij = se3.mul(pj, se3.inv(pi))
            X0 = pops.iproj(patches[kk], intr[ii])
            X1 = se3.act4(Gij[:, None, None, :], X0)
            c = pops.proj(X1, intr[jj])
            return c[:, P // 2, P // 2, :]

        cols.append((perturbed(+1.0) - perturbed(-1.0)) / (2 * eps))
    return jnp.stack(cols, axis=-1)  # (E, 2, 6)


def test_jacobian_ji_jj_finite_difference():
    poses, patches, intr, ii, jj, kk = make_scene(2)
    coords, v, (Ji, Jj, Jz) = pops.transform(poses, patches, intr, ii, jj, kk, jacobian=True)
    fd_j = _fd_pose_jacobian(poses, patches, intr, ii, jj, kk, "j")
    fd_i = _fd_pose_jacobian(poses, patches, intr, ii, jj, kk, "i")
    keep = np.asarray(v) > 0
    np.testing.assert_allclose(np.asarray(Jj)[keep], np.asarray(fd_j)[keep], atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(Ji)[keep], np.asarray(fd_i)[keep], atol=5e-2, rtol=5e-2)


def test_flow_mag_zero_for_identity():
    poses, patches, intr, ii, jj, kk = make_scene(3)
    fm = pops.flow_mag(poses, patches, intr, ii, ii, kk)
    np.testing.assert_allclose(np.asarray(fm), 0.0, atol=1e-3)


def test_point_cloud_roundtrip():
    poses, patches, intr, ii, jj, kk = make_scene(4)
    pc = pops.point_cloud(poses, patches, intr, ii)
    # re-project the world points into frame ii: should land on patch coords
    X = se3.act4(poses[ii][:, None, None, :], pc)
    coords = pops.proj(X, intr[ii])
    expect = jnp.stack([patches[:, 0], patches[:, 1]], axis=-1)
    np.testing.assert_allclose(np.asarray(coords), np.asarray(expect), atol=1e-3, rtol=1e-4)
