"""Capture a jax.profiler trace of the steady-state engine step and print
the top device ops by total time."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.runtime.config import VOConfig
    from devo_tpu.runtime.engine import DEVO
    from devo_tpu.utils.timing import enable_compilation_cache

    # without this every profile run pays cold 3-8 min remote compiles per
    # bucket executable that bench/train runs already cached
    enable_compilation_cache()

    HT, WD = 480, 640
    kern = os.environ.get("BENCH_CORR_KERNEL", "") or VOConfig.CORR_KERNEL
    wr1 = int(os.environ.get("BENCH_CORR_WR1", "0")) or VOConfig.CORR_WIN_L1

    def _b(name, default):
        v = os.environ.get(name, "").strip().lower()
        return default if v == "" else v in ("1", "true", "yes")

    cfg = VOConfig(MOTION_PROBE_THRESH=-1.0, CORR_KERNEL=kern,
                   CORR_WIN_L1=wr1,
                   SCORER_S2D=_b("BENCH_SCORER_S2D", VOConfig.SCORER_S2D),
                   ENCODER_S2D=_b("BENCH_ENCODER_S2D", VOConfig.ENCODER_S2D))
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

    n_warm = next((int(a) for a in sys.argv[1:] if a.isdigit()), 40)
    for i in range(n_warm):
        slam(i / 30.0, frame(i), intr)
    jax.block_until_ready(slam.state.poses)
    slam.wait_buckets()
    print(f"profiling after {n_warm} frames: bucket {slam.state.ii.shape[0]} "
          f"edges {int(slam.state.n_edges)} n {int(slam.state.n)}", flush=True)

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(n_warm, n_warm + 6):
        slam(i / 30.0, frame(i), intr)
    jax.block_until_ready(slam.state.poses)
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if not files:
        return
    ev_tot = defaultdict(float)
    ev_cnt = defaultdict(int)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        lanes = defaultdict(list)
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            pname = pid_names.get(e.get("pid"), "")
            if "TPU" not in pname and "Device" not in pname and "/device" not in pname.lower():
                continue
            lanes[(e.get("pid"), e.get("tid"))].append(e)
        # self time = dur - (time covered by nested events on the same lane)
        for evs in lanes.values():
            evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
            stack = []
            child_cover = defaultdict(float)
            for e in evs:
                ts, dur = e["ts"], e.get("dur", 0)
                while stack and ts >= stack[-1]["ts"] + stack[-1].get("dur", 0):
                    stack.pop()
                if stack:
                    child_cover[id(stack[-1])] += dur
                stack.append(e)
            for e in evs:
                name = e.get("name", "?")
                self_t = e.get("dur", 0) - child_cover.get(id(e), 0)
                if self_t > 0:
                    ev_tot[name] += self_t
                    ev_cnt[name] += 1
    print(f"{'op':60s} {'self ms':>10s} {'count':>7s}")
    for name, tot in sorted(ev_tot.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{name[:60]:60s} {tot / 1e3 / 6:10.3f} {ev_cnt[name]:7d}")
    print("(self ms is per-frame average over 6 traced frames)")

    if "--hlo" in sys.argv:
        # AOT-compile the same step and dump optimized HLO with source
        # locations, to map the hot fusion/copy names above to engine code
        st = slam.state
        shp = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (slam.params, st,
             jnp.zeros((HT, WD, 5), jnp.int8), np.float32(1.0),
             jnp.zeros((4,), jnp.float32)))
        txt = slam.step_fn.lower(*shp).compile().as_text()
        with open("/tmp/step_hlo.txt", "w") as fh:
            fh.write(txt)
        print("wrote /tmp/step_hlo.txt", len(txt))


if __name__ == "__main__":
    main()
