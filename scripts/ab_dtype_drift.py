"""Off-hardware A/B: pose drift of the r03 numerics defaults (VERDICT r03
item 3).

Round 3 switched on three numerics-affecting engine defaults — bf16 scorer
compute (MIXED_PRECISION), bf16 recurrent edge state (ENET_BF16), and int8
corr rings (CORR_RING_I8). Module goldens bound each op's error but nothing
bounded the *trajectory-level* divergence. This script runs the SAME
synthetic stream through the engine with each knob toggled against an
all-f32 baseline (N >= 50 frames, CPU backend) and reports per-frame pose
divergence (translation / rotation of relative poses), plus whether the
stochastic patch selection ever flipped (a discrete multinomial flip from
a tiny score perturbation is a different-sample event, not numeric drift —
divergence is only meaningful over the matching prefix, which the report
separates).

SCOPE CAVEAT (ADVICE r04): the variants below toggle ENET_BF16 and
MIXED_PRECISION only. The CPU A/B runs CORR_IMPL="window", which
structurally has no int8 rings — CORR_RING_I8, arguably the largest dtype
change, is NOT bounded by this artifact. Its trajectory-level bound comes
indirectly from the engine-banded oracle test (tests/test_engine_banded.py
runs the i8 banded kernel in interpret mode against the exact-window
engine and asserts the pose atol) and, on real data, from the
MIGRATION.md step-3b CORR_RING_I8 eval row.

Output: one JSON line per config pair -> /tmp/ab_dtype_drift.json and a
summary table on stdout. The measured bound feeds
tests/test_engine_banded.py's pose atol and MIGRATION.md's ATE-neutrality
runbook rows.
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def rel_pose_err(pa, pb):
    """Max translation / rotation divergence between two (N, 7) pose buffers
    (xyzw quats, reference devo.py pose layout)."""
    from scipy.spatial.transform import Rotation as R
    n = min(len(pa), len(pb))
    dt = np.linalg.norm(pa[:n, :3] - pb[:n, :3], axis=1)
    qa, qb = pa[:n, 3:7], pb[:n, 3:7]
    dr = (R.from_quat(qa) * R.from_quat(qb).inv()).magnitude()
    return float(dt.max()), float(np.degrees(dr).max())


def run(cfg, frames, intr, params, ht, wd):
    import jax

    from devo_tpu.runtime.engine import DEVO

    slam = DEVO(cfg, params, ht=ht, wd=wd, seed=0)
    poses, tables = [], []
    for i, v in enumerate(frames):
        slam(i / 30.0, v, intr)
        st = slam.state
        ne = int(st.n_edges)
        live = ~np.asarray(st.pending_drop[:ne])
        tables.append(frozenset(
            zip(np.asarray(st.kk[:ne])[live].tolist(),
                np.asarray(st.jj[:ne])[live].tolist())))
        poses.append(np.asarray(st.poses[:max(int(st.n), 1)]).copy())
    return poses, tables


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_engine_golden import make_frames, make_params, CFG, HT, WD

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    base_cfg = CFG.replace(
        CORR_IMPL="window",          # exact f32 corr on the CPU backend:
                                     # isolates the dtype knobs under test
                                     # from the (interpret-mode-only) banded
                                     # kernels, which have their own goldens
        MIXED_PRECISION=False, ENET_BF16=False, CORR_RING_I8=False,
        PATCH_LIFETIME=13, REMOVAL_WINDOW=16, OPTIMIZATION_WINDOW=10,
        MEM=24, BUFFER_SIZE=96,
    )
    params = make_params(base_cfg)
    frames = make_frames(n_frames)
    intr = np.asarray([80.0, 80.0, WD / 2, HT / 2], np.float32)

    print(f"running f32 baseline ({n_frames} frames, {HT}x{WD})", flush=True)
    ref_poses, ref_tables = run(base_cfg, frames, intr, params, HT, WD)

    variants = {
        # CONTROL: all-f32 with a one-part-in-1e6 intrinsics perturbation.
        # The engine is a closed loop (poses -> reprojection -> corr ->
        # update -> BA -> poses); if an epsilon input perturbation diverges
        # as much as the dtype toggles, the observed drift is chaotic
        # AMPLIFICATION of rounding, not a systematic dtype bias — and the
        # meaningful bound is "within the system's Lyapunov noise floor".
        "control_eps": dict(),
        "enet_bf16": dict(ENET_BF16=True),
        "mixed_precision": dict(MIXED_PRECISION=True),
        "shipping_both": dict(ENET_BF16=True, MIXED_PRECISION=True),
    }
    results = {}
    for name, kw in variants.items():
        print(f"running {name}", flush=True)
        intr_v = intr * (1 + 1e-6) if name == "control_eps" else intr
        poses, tables = run(base_cfg.replace(**kw), frames, intr_v,
                            params, HT, WD)
        # divergence is only numeric drift while the discrete decisions
        # (patch tables) still match; find that prefix
        pre = n_frames
        for i, (ta, tb) in enumerate(zip(ref_tables, tables)):
            if ta != tb:
                pre = i
                break
        per_frame = [rel_pose_err(pa, pb)
                     for pa, pb in zip(ref_poses[:pre], poses[:pre])]
        dt = max((x for x, _ in per_frame), default=0.0)
        dr = max((x for _, x in per_frame), default=0.0)
        results[name] = dict(
            matching_prefix_frames=pre, n_frames=n_frames,
            max_trans_div=dt, max_rot_div_deg=dr,
            drift_curve_trans=[round(x, 6) for x, _ in per_frame],
        )
        print(f"  prefix {pre}/{n_frames} frames  "
              f"max |dt| {dt:.3e}  max |dR| {dr:.3e} deg", flush=True)

    with open("/tmp/ab_dtype_drift.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "drift_curve_trans"}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
