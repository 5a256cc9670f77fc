"""Eval-path FPS on TPU (VERDICT r03 item 2).

bench.py measures the engine with a fully pre-uploaded synthetic stream;
real runs go through eval/harness.run_voxel's pipelined uploader
(host-side iterator -> background upload thread -> engine). This script
drives the SAME synthetic 480x640 stream through run_voxel and reports
eval FPS to compare against the bench number. Done criterion: within ~10%
of bench FPS, or the gap attributed.

Method notes: one warm run populates the engine cache (bucket executables
+ the first-dispatch cost bench.py also absorbs before timing), then the
timed run reuses the cached engine via `engine_cache`. The FPS printed by
run_voxel covers first-frame-to-last (including 12 final refinement
updates) — slightly stricter than bench.py's post-warm windows.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 160

    import jax

    from devo_tpu.eval.harness import run_voxel
    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.runtime.config import VOConfig
    from devo_tpu.utils.timing import enable_compilation_cache

    enable_compilation_cache()

    HT, WD = 480, 640
    kern = os.environ.get("BENCH_CORR_KERNEL", "") or VOConfig.CORR_KERNEL
    cfg = VOConfig(MOTION_PROBE_THRESH=-1.0, CORR_KERNEL=kern)
    net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                 dim=cfg.DIM, patch_selector=cfg.PATCH_SELECTOR)
    import jax.numpy as jnp
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, HT, WD, 5)),
                      jax.random.PRNGKey(1))["params"]

    rng = np.random.default_rng(0)
    base = rng.standard_normal((HT, WD * 2, 5)).astype(np.float32)
    base *= (rng.random((HT, WD * 2, 5)) < 0.1)
    intr = np.asarray([320.0, 320.0, WD / 2, HT / 2], np.float32)

    def stream(n, offset=0):
        # same sliding texture as bench.py; (5, H, W) like benchmark
        # loaders yield (data/benchmarks.py iterator contract)
        for i in range(n):
            sh = (3 * (i + offset)) % WD
            yield (np.transpose(base[:, sh:sh + WD], (2, 0, 1)),
                   intr, (i + offset) / 30.0)

    cache = {}
    t0 = time.time()
    print("warm run (compiles buckets + absorbs first-dispatch cost)...",
          file=sys.stderr, flush=True)
    run_voxel(cfg, params, stream(72), HT, WD, seed=0, final_updates=0,
              engine_cache=cache)
    print(f"warm run done in {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)

    if os.environ.get("EVAL_PATH_INSTRUMENT"):
        # phase attribution: replicate run_voxel's loop with timers around
        # the upload-queue wait, the slam dispatch, and the final updates
        from devo_tpu.eval.harness import _pipelined_uploads
        slam = cache[next(iter(cache))]
        slam.reset(seed=0, params=params)
        it = iter(stream(n_frames))
        v0, i0, t0s = next(it)
        t0 = time.perf_counter()
        slam(t0s, np.transpose(v0, (1, 2, 0)), i0)
        t_get = t_call = 0.0
        n = 1
        gen = _pipelined_uploads(slam, it)
        while True:
            g0 = time.perf_counter()
            try:
                uv, intr_f, ts = next(gen)
            except StopIteration:
                break
            g1 = time.perf_counter()
            slam(ts, uv, intr_f)
            g2 = time.perf_counter()
            t_get += g1 - g0
            t_call += g2 - g1
            n += 1
        f0 = time.perf_counter()
        for _ in range(12):
            slam.update()
        import jax as _jax
        _jax.block_until_ready(slam.state.poses)
        f1 = time.perf_counter()
        tot = f1 - t0
        print(json.dumps({
            "metric": "eval_path_phase_ms_per_frame", "n_frames": n,
            "total_s": round(tot, 2), "fps": round(n / tot, 2),
            "queue_wait_ms": round(t_get / n * 1e3, 2),
            "dispatch_ms": round(t_call / n * 1e3, 2),
            "final_updates_s": round(f1 - f0, 2)}))
        return

    poses, tss, fps = run_voxel(cfg, params, stream(n_frames), HT, WD,
                                seed=0, final_updates=12,
                                engine_cache=cache, timing=True)
    out = {"metric": "eval_path_fps", "value": round(fps, 2),
           "unit": "frames/s", "n_frames": n_frames,
           "corr_kernel": kern,
           "note": "run_voxel pipelined uploader, synthetic 480x640 "
                   "stream, incl. 12 final updates"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
