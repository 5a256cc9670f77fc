"""bench.py with phase timestamps and chunked timing to localize where the
timed window loses time."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.runtime.config import VOConfig
    from devo_tpu.runtime.engine import DEVO

    HT, WD = 480, 640
    N_WARM, N_BENCH = 48, 72
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

    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def uploader():
        for i in range(N_WARM + N_BENCH):
            q.put((i, slam.upload(frame(i))))

    threading.Thread(target=uploader, daemon=True).start()

    t = time.perf_counter()
    for _ in range(N_WARM):
        i, vox = q.get()
        slam(i / 30.0, vox, intr)
    jax.block_until_ready(slam.state.poses)
    print(f"warm done {time.perf_counter() - t:.1f}s "
          f"bucket {slam.state.ii.shape[0]}", flush=True)

    t = time.perf_counter()
    slam.wait_buckets()
    print(f"wait_buckets {time.perf_counter() - t:.1f}s", flush=True)

    for c in range(N_BENCH // 12):
        t0 = time.perf_counter()
        for _ in range(12):
            i, vox = q.get()
            slam(i / 30.0, vox, intr)
        jax.block_until_ready(slam.state.poses)
        dt = time.perf_counter() - t0
        print(f"chunk {c}: {dt / 12 * 1e3:7.1f} ms/frame  "
              f"bucket {slam.state.ii.shape[0]:6d}  "
              f"edges {int(slam.state.n_edges):6d}  n {int(slam.state.n):3d}",
              flush=True)


if __name__ == "__main__":
    main()
