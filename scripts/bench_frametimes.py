"""Per-frame wall-time trace of the bench loop: spots mid-run recompiles
(new edge-bucket executables) and steady-state jitter that the aggregate
FPS number hides."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.runtime.config import VOConfig
    from devo_tpu.runtime.engine import DEVO

    HT, WD = 480, 640
    cfg = VOConfig(MOTION_PROBE_THRESH=-1.0)
    net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                 dim=cfg.DIM, patch_selector=cfg.PATCH_SELECTOR)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, HT, WD, 5)), jax.random.PRNGKey(1))["params"]
    rng = np.random.default_rng(0)
    base = rng.standard_normal((HT, WD * 2, 5)).astype(np.float32)
    base *= (rng.random((HT, WD * 2, 5)) < 0.1)
    intr = np.asarray([320.0, 320.0, WD / 2, HT / 2], np.float32)
    slam = DEVO(cfg, params, ht=HT, wd=WD, seed=0)

    import os
    step_px = int(os.environ.get("BENCH_SHIFT", "3"))

    def frame(i):
        sh = (step_px * i) % WD
        return base[:, sh:sh + WD]

    import sys
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 130
    t_prev = time.perf_counter()
    for i in range(n_frames):
        slam(i / 30.0, frame(i), intr)
        jax.block_until_ready(slam.state.poses)
        t = time.perf_counter()
        print(f"frame {i:3d}  {1e3 * (t - t_prev):9.1f} ms  "
              f"bucket {slam.state.ii.shape[0]:6d}  "
              f"edges {int(slam.state.n_edges):6d}  n {int(slam.state.n):3d}",
              flush=True)
        t_prev = t


if __name__ == "__main__":
    main()
