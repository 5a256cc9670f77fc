"""Training losses.

JAX counterpart of the loss block in /root/reference/train.py:176-246:
  * flow loss — min-over-patch-pixel reprojection residual on close edges
    (dij in (0, 2]), masked by GT validity (train.py:181-184);
  * pose loss — all-pairs relative-pose error after Umeyama scale alignment
    of the predicted trajectory (train.py:207-236, kabsch_umeyama :54-65);
  * scorer loss — on the final iteration: score-weighted flow error modulated
    by the BA confidence, plus a -log(score) regularizer (train.py:189-203).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.lie import se3


def _safe_norm(x, axis=-1):
    """norm with a guarded sqrt: grad at exactly 0 is 0, not NaN (masked
    edges multiply the result by 0, and NaN * 0 = NaN otherwise)."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), 1e-12))


def kabsch_umeyama_scale(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Optimal Sim3 scale aligning B to A (train.py:54-65): A = gt, B = pred."""
    EA = A.mean(0)
    EB = B.mean(0)
    VarA = jnp.mean(jnp.sum((A - EA) ** 2, axis=-1))
    H = (A - EA).T @ (B - EB) / A.shape[0]
    d = jnp.linalg.svd(H, compute_uv=False)
    return VarA / jnp.maximum(d.sum(), 1e-9)


def flow_loss_step(step: Dict[str, Any], P: int) -> jnp.ndarray:
    """Min-over-pixel flow residual on close edges (train.py:181-184)."""
    dij = np.abs(step["ii"] - step["jj"])
    close = jnp.asarray((dij > 0) & (dij <= 2))
    valid = (step["valid"] > 0.5) & close & step["emask"]
    e = _safe_norm(step["coords"] - step["coords_gt"])  # (E, P, P)
    ef = e.reshape(e.shape[0], -1).min(axis=-1)
    cnt = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(ef * valid) / cnt


def pose_loss_step(step: Dict[str, Any]) -> jnp.ndarray:
    """All-pairs relative pose error with Umeyama scale (train.py:207-236)."""
    Gs = se3.inv(step["Gs"])  # w2c -> c2w
    Ps = se3.inv(step["Ps"])
    N = Gs.shape[0]
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    k = ii.reshape(-1) != jj.reshape(-1)
    ii = jnp.asarray(ii.reshape(-1)[k])
    jj = jnp.asarray(jj.reshape(-1)[k])

    t1 = Gs[:, :3]
    t2 = Ps[:, :3]
    s = jax.lax.stop_gradient(jnp.clip(kabsch_umeyama_scale(t2, t1), None, 10.0))
    Gs_scaled = se3.scale(Gs, s)

    dP = se3.mul(se3.inv(Gs_scaled[ii]), Gs_scaled[jj])
    dG = se3.mul(se3.inv(Ps[ii]), Ps[jj])
    e1 = se3.log(se3.mul(dP, se3.inv(dG)))
    tr = _safe_norm(e1[:, :3])
    ro = _safe_norm(e1[:, 3:6])
    return tr.mean() + ro.mean()


def scorer_loss_step(step: Dict[str, Any], P: int) -> jnp.ndarray:
    """Score supervision on the last step (train.py:189-203)."""
    dij = np.abs(step["ii"] - step["jj"])
    k16 = jnp.asarray((dij > 0) & (dij <= 16))
    valid = (step["valid"] > 0.5) & k16 & step["emask"]

    e = _safe_norm(step["coords"] - step["coords_gt"])
    ef = e.reshape(e.shape[0], -1).min(axis=-1)
    scores_flat = step["scores"].reshape(-1)           # (n*ppi,)
    sc = scores_flat[jnp.asarray(step["kk"])]
    w_ba = jax.lax.stop_gradient(step["weight"].mean(axis=-1))
    mod = -0.5 * jnp.log(jnp.maximum(w_ba, 1e-12)) + 1.0
    cnt = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(mod * sc * jax.lax.stop_gradient(ef) * valid) / cnt

    reg = -jnp.log(jnp.maximum(step["scores"], 1e-6)).mean()
    return loss + reg


def total_loss(
    traj: List[Dict[str, Any]],
    P: int = 3,
    flow_weight: float = 0.1,
    pose_weight: float = 10.0,
    scores_weight: float = 0.05,
    structure_only: bool = False,
    use_scorer: bool = True,
) -> Dict[str, jnp.ndarray]:
    loss = 0.0
    flow_l = pose_l = scores_l = 0.0
    for i, step in enumerate(traj):
        fl = flow_loss_step(step, P)
        loss = loss + flow_weight * fl
        flow_l = fl
        pl = pose_loss_step(step)
        pose_l = pl
        if not structure_only and i >= 2:
            loss = loss + pose_weight * pl
        if use_scorer and i == len(traj) - 1:
            sl = scorer_loss_step(step, P)
            loss = loss + scores_weight * sl
            scores_l = sl
    return {"loss": loss, "flow": flow_l, "pose": pose_l, "scores": scores_l}
