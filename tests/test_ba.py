"""Bundle-adjustment tests.

Validates the DBA layer on synthetic scenes where the exact solution is
known: targets are ground-truth reprojections, initial poses/depths are
perturbed, and Gauss-Newton must drive the reprojection error down. This is
the same convergence criterion the reference relies on implicitly
(devo/ba.py / fastba called with network-predicted targets).
"""
import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.geom import projective as pops
from devo_tpu.lie import se3
from devo_tpu.ops import ba as ba_ops


def build_scene(seed=0, n_frames=8, ppf=24, P=3, H=120, W=160):
    rng = np.random.default_rng(seed)
    # smooth forward-moving trajectory
    xi = np.cumsum(rng.standard_normal((n_frames, 6)) * 0.02, axis=0)
    xi[:, 2] += np.arange(n_frames) * 0.05
    poses_gt = se3.exp(jnp.asarray(xi, jnp.float32))

    M = n_frames * ppf
    cx = rng.uniform(20, W - 20, (M, 1, 1))
    cy = rng.uniform(20, H - 20, (M, 1, 1))
    off = np.arange(P) - P // 2
    px = np.broadcast_to(cx + off[None, None, :], (M, P, P))
    py = np.broadcast_to(cy + off[None, :, None], (M, P, P))
    d = np.broadcast_to(rng.uniform(0.5, 1.5, (M, 1, 1)), (M, P, P))
    patches_gt = jnp.asarray(np.stack([px, py, d], 1), jnp.float32)

    intr = jnp.asarray(np.tile([120.0, 120.0, W / 2, H / 2], (n_frames, 1)), jnp.float32)
    ix = np.repeat(np.arange(n_frames), ppf)

    # all-pairs edges within distance 3
    ii, jj, kk = [], [], []
    for k in range(M):
        fi = ix[k]
        for fj in range(n_frames):
            if 0 < abs(fi - fj) <= 3:
                ii.append(fi), jj.append(fj), kk.append(k)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)
    kk = jnp.asarray(kk, jnp.int32)

    coords, valid = pops.transform(poses_gt, patches_gt, intr, ii, jj, kk, valid=True)
    target = coords[:, P // 2, P // 2, :]
    mask = valid > 0
    return poses_gt, patches_gt, intr, ii, jj, kk, target, mask, rng


def reproj_error(poses, patches, intr, ii, jj, kk, target, mask):
    coords = pops.transform(poses, patches, intr, ii, jj, kk)
    P = patches.shape[-1]
    r = jnp.linalg.norm(target - coords[:, P // 2, P // 2, :], axis=-1)
    return float(jnp.sum(r * mask) / jnp.sum(mask))


def test_ba_converges_pose_only_perturbation():
    poses_gt, patches, intr, ii, jj, kk, target, mask, rng = build_scene(0)
    n = poses_gt.shape[0]
    noise = jnp.asarray(rng.standard_normal((n, 6)) * 0.01, jnp.float32)
    noise = noise.at[0].set(0.0)  # keep gauge fixed
    poses0 = se3.retr(poses_gt, noise)

    weight = jnp.ones((ii.shape[0], 2), jnp.float32)
    bounds = jnp.asarray([-64.0, -64.0, 160 + 64.0, 120 + 64.0])
    e0 = reproj_error(poses0, patches, intr, ii, jj, kk, target, mask)

    poses1, patches1 = ba_ops.run_ba(
        poses0, patches, intr, target, weight, jnp.float32(1e-4),
        ii, jj, kk, mask, t0=jnp.int32(1), t1=jnp.int32(n), kbase=jnp.int32(0),
        window=n - 1, patch_slots=patches.shape[0], bounds=bounds, iterations=4)

    e1 = reproj_error(poses1, patches1, intr, ii, jj, kk, target, mask)
    assert e1 < 0.05 * e0, (e0, e1)


def test_ba_converges_depth_perturbation():
    poses, patches_gt, intr, ii, jj, kk, target, mask, rng = build_scene(1)
    M = patches_gt.shape[0]
    d_noise = jnp.asarray(1.0 + 0.2 * rng.standard_normal((M, 1, 1)), jnp.float32)
    patches0 = patches_gt.at[:, 2].multiply(jnp.clip(d_noise, 0.3, 3.0))
    weight = jnp.ones((ii.shape[0], 2), jnp.float32)
    bounds = jnp.asarray([-64.0, -64.0, 160 + 64.0, 120 + 64.0])

    e0 = reproj_error(poses, patches0, intr, ii, jj, kk, target, mask)
    # structure-only: t1 == t0 freezes all poses (ba_cuda.cu:494-506)
    poses1, patches1 = ba_ops.run_ba(
        poses, patches0, intr, target, weight, jnp.float32(1e-4),
        ii, jj, kk, mask, t0=jnp.int32(1), t1=jnp.int32(1), kbase=jnp.int32(0),
        window=poses.shape[0] - 1, patch_slots=M, bounds=bounds, iterations=6)
    np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses), atol=1e-6)
    e1 = reproj_error(poses1, patches1, intr, ii, jj, kk, target, mask)
    assert e1 < 0.2 * e0, (e0, e1)


def test_ba_respects_fixed_poses():
    poses_gt, patches, intr, ii, jj, kk, target, mask, rng = build_scene(2)
    n = poses_gt.shape[0]
    noise = jnp.asarray(rng.standard_normal((n, 6)) * 0.01, jnp.float32)
    poses0 = se3.retr(poses_gt, noise)
    weight = jnp.ones((ii.shape[0], 2), jnp.float32)
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])
    t0 = 3
    poses1, _ = ba_ops.run_ba(
        poses0, patches, intr, target, weight, jnp.float32(1e-4),
        ii, jj, kk, mask, t0=jnp.int32(t0), t1=jnp.int32(n), kbase=jnp.int32(0),
        window=n - t0, patch_slots=patches.shape[0], bounds=bounds, iterations=2)
    np.testing.assert_allclose(np.asarray(poses1[:t0]), np.asarray(poses0[:t0]), atol=1e-7)
    assert not np.allclose(np.asarray(poses1[t0:]), np.asarray(poses0[t0:]))


def test_ba_is_differentiable():
    """Training path: gradients flow through the Schur solve to the targets
    and weights (replacing devo/ba.py's custom CholeskySolver backward)."""
    poses_gt, patches, intr, ii, jj, kk, target, mask, rng = build_scene(3, n_frames=5, ppf=8)
    n = poses_gt.shape[0]
    noise = jnp.asarray(rng.standard_normal((n, 6)) * 0.005, jnp.float32).at[0].set(0.0)
    poses0 = se3.retr(poses_gt, noise)
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])

    def loss(target_, weight_):
        p1, q1 = ba_ops.run_ba(
            poses0, patches, intr, target_, weight_, jnp.float32(1e-4),
            ii, jj, kk, mask, t0=jnp.int32(1), t1=jnp.int32(n), kbase=jnp.int32(0),
            window=n - 1, patch_slots=patches.shape[0], bounds=bounds,
            iterations=2, max_residual=250.0, ep=10.0, depth_clamp="training")
        return jnp.sum((p1 - poses_gt) ** 2)

    w0 = jnp.ones((ii.shape[0], 2), jnp.float32) * 0.7
    g_t, g_w = jax.grad(loss, argnums=(0, 1))(target, w0)
    assert np.isfinite(np.asarray(g_t)).all()
    assert np.isfinite(np.asarray(g_w)).all()
    assert float(jnp.abs(g_t).sum()) > 0
    assert float(jnp.abs(g_w).sum()) > 0


def test_ba_masked_edges_are_inert():
    poses_gt, patches, intr, ii, jj, kk, target, mask, rng = build_scene(4)
    n = poses_gt.shape[0]
    noise = jnp.asarray(rng.standard_normal((n, 6)) * 0.01, jnp.float32).at[0].set(0.0)
    poses0 = se3.retr(poses_gt, noise)
    weight = jnp.ones((ii.shape[0], 2), jnp.float32)
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])

    # corrupt half the targets but mask those edges out
    E = ii.shape[0]
    corrupt = np.zeros(E, bool)
    corrupt[::2] = True
    target_bad = jnp.where(jnp.asarray(corrupt)[:, None], target + 1e3, target)
    mask2 = mask & ~jnp.asarray(corrupt)

    kwargs = dict(t0=jnp.int32(1), t1=jnp.int32(n), kbase=jnp.int32(0),
                  window=n - 1, patch_slots=patches.shape[0], bounds=bounds,
                  iterations=2)
    p_a, q_a = ba_ops.run_ba(poses0, patches, intr, target_bad, weight,
                             jnp.float32(1e-4), ii, jj, kk, mask2, **kwargs)
    p_b, q_b = ba_ops.run_ba(poses0, patches, intr, target, weight,
                             jnp.float32(1e-4), ii, jj, kk, mask2, **kwargs)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_a), np.asarray(q_b), atol=1e-5)
