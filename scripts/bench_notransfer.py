"""Probe: tracking FPS with ALL voxels pre-uploaded to device.

Isolates the host->device voxel transfer + upload-thread contention from
the compute pipeline: bench.py interleaves ~1.5 MB/frame of i8 wire with
execution through the ~130 MB/s axon tunnel (PERF_NOTES.md). If this probe
runs much faster than bench.py, wire bytes (not device compute) gate FPS.

Each pre-uploaded voxel is a distinct array and the engine state evolves,
so the axon dispatch-elision hazard (identical executable+args) does not
apply.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.runtime.config import VOConfig
    from devo_tpu.runtime.engine import DEVO

    HT, WD = 480, 640
    N_WARM, N_BENCH = 48, 96

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

    def frame(i):
        sh = (3 * i) % WD
        return base[:, sh:sh + WD]

    # pre-upload every frame (distinct device arrays)
    vox = [slam.upload(frame(i)) for i in range(N_WARM + N_BENCH)]
    jax.block_until_ready(vox[-1][0])

    for i in range(N_WARM):
        slam(i / 30.0, vox[i], intr)
    jax.block_until_ready(slam.state.poses)
    slam.wait_buckets()

    t0 = time.perf_counter()
    for i in range(N_WARM, N_WARM + N_BENCH):
        slam(i / 30.0, vox[i], intr)
    jax.block_until_ready(slam.state.poses)
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "fps_no_transfer", "value": round(N_BENCH / dt, 2),
                      "ms_per_frame": round(1e3 * dt / N_BENCH, 2)}))


if __name__ == "__main__":
    main()
