"""Pure pipelined step-rate probe: voxels pre-uploaded, no sampler, no
uploader thread, no host syncs in the timed span — measures the achievable
dispatch-pipelined frame rate at a pinned bucket (the wall-device gap that
remains is irreducible dispatch cost)."""
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
    # no background reads AND no fallback sync inside _rebucket (a None
    # sample triggers a blocking int() = ~31 ms every check)
    slam._sampler.submit = lambda *a: None
    slam._sampler.read = lambda: (10_000, 6144)

    def frame(i):
        sh = (3 * i) % WD
        return base[:, sh:sh + WD]

    for i in range(48):
        slam(i / 30.0, frame(i), intr)
    jax.block_until_ready(slam.state.poses)
    slam.wait_buckets()

    NB = 36
    pre = [slam.upload(frame(48 + i)) for i in range(NB)]
    jax.block_until_ready([v for v, s in pre])
    print(f"bucket {slam.state.ii.shape[0]} edges {int(slam.state.n_edges)} "
          f"n {int(slam.state.n)}", flush=True)

    t0 = time.perf_counter()
    for i in range(NB):
        slam((48 + i) / 30.0, pre[i], intr)
    jax.block_until_ready(slam.state.poses)
    dt = (time.perf_counter() - t0) / NB * 1e3
    print(f"pipelined: {dt:.1f} ms/frame  bucket {slam.state.ii.shape[0]} "
          f"edges {int(slam.state.n_edges)} n {int(slam.state.n)}")


if __name__ == "__main__":
    main()
