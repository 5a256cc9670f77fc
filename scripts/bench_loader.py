"""Training-loader throughput: thread vs process workers (VERDICT r03
item 5).

Synthesizes a fake TartanAir-EVS tree (the verify-skill recipe: h5 voxel
files + depth npys + pose txt) at full 480x640 resolution, then measures
batches/s and voxel-frames/s through train.data_loader in both worker
modes. The number justifies the method="process" default in
train.data_loader (reference counterpart: torch DataLoader(num_workers=4),
/root/reference/train.py:93-95).

Usage: python scripts/bench_loader.py [n_batches] [workers]
"""
import json
import os
import sys
import time


def make_tree(root, n=24, ht=480, wd=640, bins=5):
    import h5py
    import numpy as np

    scene = os.path.join(root, "Env", "Easy", "evs_left", "P001")
    h5d = os.path.join(scene, "h5")
    dd = os.path.join(root, "Env", "Easy", "depth_left", "P001", "depth_left")
    imd = os.path.join(root, "Env", "Easy", "image_left", "P001")
    for d in (h5d, dd, imd):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        v = (rng.standard_normal((bins, ht, wd)).astype(np.float16)
             * (rng.random((bins, ht, wd)) < 0.05))
        with h5py.File(os.path.join(h5d, f"{i:06d}.h5"), "w") as f:
            f.create_dataset("voxel", data=v)
    for i in range(n + 1):
        np.save(os.path.join(dd, f"{i:06d}_left_depth.npy"),
                (1.0 + rng.random((ht, wd))).astype(np.float32))
    # forward-moving poses so the co-visibility graph links frames
    t = np.arange(n + 1, dtype=np.float64)
    poses = np.stack([t * 0.1, 0 * t, 0 * t,
                      0 * t, 0 * t, 0 * t, np.ones_like(t)], 1)
    np.savetxt(os.path.join(imd, "pose_left.txt"), poses)
    return root


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from devo_tpu.data.tartan import TartanAirEVS
    from train import data_loader

    root = "/tmp/fake_tartan_bench"
    if not os.path.exists(os.path.join(root, "Env")):
        print("building fake tree...", file=sys.stderr, flush=True)
        make_tree(root)

    results = {}
    for method in ("thread", "process"):
        ds = TartanAirEVS(root, n_frames=15, aug=True, seed=0)
        it = data_loader(ds, batch_size=1, seed=0, workers=workers,
                         method=method)
        b = next(it)                       # warm: spawn + first fills
        nf = b["voxels"].shape[1]
        t0 = time.time()
        for _ in range(n_batches):
            b = next(it)
        dt = time.time() - t0
        vps = n_batches * nf / dt
        results[method] = {"batches_per_s": round(n_batches / dt, 3),
                           "voxel_frames_per_s": round(vps, 1)}
        print(f"{method}: {n_batches} batches ({nf} frames each) in "
              f"{dt:.1f}s -> {vps:.1f} voxel-frames/s", flush=True)
        del it                             # daemon workers die with us

    results["workers"] = workers
    print(json.dumps(results))


if __name__ == "__main__":
    main()
