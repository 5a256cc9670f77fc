"""Profile 4 dependent corr_level_banded calls: find the fixed ~100 ms/call
cost the tune bench exposed (constant in LIVE)."""
import glob
import gzip
import json
import os
from collections import defaultdict

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from devo_tpu.ops import corr_pallas

    E, LIVE = 10240, 6912
    H, W, C = 120, 160, 128
    MEM, MR = 32, 32 * 96
    rng = np.random.default_rng(0)
    fmap = [jnp.asarray(rng.standard_normal((H, W, C)) * 0.1, jnp.bfloat16)
            for _ in range(MEM)]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    hp = corr_pallas.banded_shape(H, W)[1]
    gmap = jnp.asarray(rng.standard_normal((MR, 3, 3, C)) * 0.1, jnp.bfloat16)
    kk = jnp.asarray(np.sort(rng.integers(0, MR, E)), jnp.int32)
    jj = jnp.asarray(np.arange(E) % 13, jnp.int32)
    cx = rng.uniform(8, W - 8, (E, 1, 1))
    cy = rng.uniform(8, H - 8, (E, 1, 1))
    gx, gy = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="xy")
    coords0 = np.stack([cx + gx, cy + gy], -1).astype(np.float32)
    mask = jnp.arange(E) < LIVE

    fn = jax.jit(lambda c, g, fb, kk, jj: corr_pallas.corr_level_banded(
        g, fb, c, kk, jj, mask, n_live=LIVE, hp=hp))
    coords = jnp.asarray(coords0)
    out = fn(coords, gmap, fmap_b, kk, jj)
    jax.block_until_ready(out)

    logdir = "/tmp/jaxtrace_b"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(4):
        coords = coords + jnp.float32(i % 3 - 1) + out[0, 0] * 1e-12
        out = fn(coords, gmap, fmap_b, kk, jj)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    ev_tot = defaultdict(float)
    ev_cnt = defaultdict(int)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            pname = pid_names.get(e.get("pid"), "")
            if "TPU" not in pname and "Device" not in pname:
                continue
            ev_tot[e.get("name", "?")] += e.get("dur", 0)
            ev_cnt[e.get("name", "?")] += 1
    for name, tot in sorted(ev_tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{name[:70]:70s} {tot / 1e3 / 4:10.3f} ms {ev_cnt[name]:5d}")


if __name__ == "__main__":
    main()
