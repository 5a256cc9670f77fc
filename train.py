"""DEVO-TPU training entry point.

Counterpart of /root/reference/train.py: TartanAir-EVS clips through the
unrolled eVONet forward with flow/pose/scorer losses, AdamW + OneCycle,
gradient clip 10, checkpoints + in-training validation every 10k steps.

Distribution is a jax.sharding data-parallel mesh over all local devices
(replacing mp.spawn + NCCL DDP, train.py:31-42); multi-host runs only need
jax.distributed.initialize() before main().

Usage:
  python train.py --name run1 --datapath <tartanair_root> \
      --steps 240000 --lr 8e-5 --iters 18 --n_frames 15
"""
from __future__ import annotations

import argparse
import os
import sys
import queue
import threading

import numpy as np


def _make_batch(dataset, idxs):
    samples = [dataset[int(i)] for i in idxs]
    return {
        "voxels": np.stack([s[0] for s in samples]).transpose(0, 1, 3, 4, 2),
        "poses": np.stack([s[1] for s in samples]),
        "disps": np.stack([s[2] for s in samples]),
        "intrinsics": np.stack([s[3][0] for s in samples]),
    }


def _proc_worker(dataset, batch_size, seed, wid, q):
    """Worker-process loop (top level so the spawn context can pickle it).
    The dataset is rebuilt from its pickle in each worker; h5 files are
    opened lazily per item (data/tartan.py), so no handles cross the
    process boundary."""
    wrng = np.random.default_rng(seed + wid + 1)
    while True:
        q.put(_make_batch(dataset, wrng.integers(0, len(dataset), batch_size)))


def data_loader(dataset, batch_size: int, seed: int, workers: int = 4,
                qsize: int = 4, method: str = "thread"):
    """Background batch producer (counterpart of DataLoader(num_workers=4),
    /root/reference/train.py:93-95).

    method="thread" (default): measured 2x the process mode's throughput
    on the full-res TartanAir fixture (2.5 vs 1.2 voxel-frames/s at 4
    workers, scripts/bench_loader.py; PERF_NOTES r04 "loader
    throughput") — the hot path (h5 decode + numpy bilinear augment)
    releases the GIL, while process mode pays ~92 MB/batch of
    multiprocessing.Queue pickling. method="process" remains for
    datasets whose per-item work is Python-bound."""
    if method == "process":
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        q = ctx.Queue(maxsize=qsize)
        for w in range(workers):
            ctx.Process(target=_proc_worker,
                        args=(dataset, batch_size, seed, w, q),
                        daemon=True).start()
        while True:
            yield q.get()
        return

    tq: "queue.Queue" = queue.Queue(maxsize=qsize)

    def worker(wid):
        wrng = np.random.default_rng(seed + wid + 1)
        while True:
            tq.put(_make_batch(dataset,
                               wrng.integers(0, len(dataset), batch_size)))

    for w in range(workers):
        threading.Thread(target=worker, args=(w,), daemon=True).start()
    while True:
        yield tq.get()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="devo_tpu")
    p.add_argument("--datapath", required=True)
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--checkpoint", default=None, help="resume path")
    p.add_argument("--loader", default="thread",
                   choices=["process", "thread"],
                   help="batch-loader workers. thread (default): measured "
                        "2x process throughput — the hot path (h5 f16 "
                        "decode + numpy bilinear augment) releases the GIL "
                        "while process mode pays ~92 MB/batch of queue "
                        "pickling (scripts/bench_loader.py, PERF_NOTES "
                        "r04). process remains for datasets whose per-item "
                        "work is Python-bound.")
    p.add_argument("--loader_workers", type=int, default=4)
    p.add_argument("--warmstart", default=None,
                   help="torch .pth to warm-start from (e.g. RGB-pretrained "
                        "DPVO): shape-mismatched keys — the 3ch conv1 pair "
                        "— are re-initialized (reference train.py:114-138)")
    p.add_argument("--steps", type=int, default=240_000)
    p.add_argument("--lr", type=float, default=8e-5)
    p.add_argument("--batch", type=int, default=1, help="per-device batch")
    p.add_argument("--iters", type=int, default=18)
    p.add_argument("--n_frames", type=int, default=15)
    p.add_argument("--patches_per_image", type=int, default=80)
    p.add_argument("--dim_inet", type=int, default=384)
    p.add_argument("--dim_fnet", type=int, default=128)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--pose_weight", type=float, default=10.0)
    p.add_argument("--flow_weight", type=float, default=0.1)
    p.add_argument("--scores_weight", type=float, default=0.05)
    p.add_argument("--ckpt_every", type=int, default=10_000)
    p.add_argument("--eval_every", type=int, default=10_000,
                   help="in-training validation cadence (ref train.py:282)")
    p.add_argument("--val_split", default="splits/tartan/tartan_val.txt",
                   help="file listing validation scenes (evs_left appended "
                        "when the entry doesn't already end in it)")
    p.add_argument("--val_datapath", default=None,
                   help="root the val_split entries are relative to "
                        "(defaults to --datapath)")
    p.add_argument("--val_max_frames", type=int, default=None,
                   help="cap frames per val sequence (smoke runs)")
    p.add_argument("--randaug", action="store_true",
                   help="enable randAug voxel augmentation (evs only)")
    p.add_argument("--crop_size", type=int, nargs=2, default=(480, 640),
                   help="augmentor crop (H W)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of a few "
                        "steady-state steps (ref train.py:143-152)")
    p.add_argument("--profile_at", type=int, default=10,
                   help="steps after start before the trace begins")
    p.add_argument("--profile_steps", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from devo_tpu.utils.timing import enable_compilation_cache
    enable_compilation_cache()

    from devo_tpu.data.tartan import TartanAirEVS
    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.train.trainer import Trainer
    from devo_tpu.utils.logger import Logger

    n_dev = jax.device_count()
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    dataset = TartanAirEVS(args.datapath, n_frames=args.n_frames,
                           crop_size=tuple(args.crop_size),
                           cache_path=os.path.join(args.datapath, "fgraph_cache.pkl"))
    print(f"dataset: {len(dataset)} clips")

    net = EVONet(dim_inet=args.dim_inet, dim_fnet=args.dim_fnet, dim=args.dim)
    tr = Trainer(net=net, lr=args.lr, total_steps=args.steps,
                 steps_unrolled=args.iters, ppi=args.patches_per_image,
                 pose_weight=args.pose_weight, flow_weight=args.flow_weight,
                 scores_weight=args.scores_weight, randaug=args.randaug)

    loader = data_loader(dataset, args.batch * n_dev, seed=0,
                         workers=args.loader_workers, method=args.loader)
    sample = next(loader)
    if args.checkpoint:
        # full resume: params + optimizer moments + schedule position
        # (reference saves/restores all of them, train.py:271-280)
        ck = tr.load_checkpoint(args.checkpoint)
        params, opt_state, start = ck["params"], ck["opt_state"], int(ck["step"])
    else:
        params, opt_state = tr.init(jax.random.PRNGKey(0),
                                    jnp.asarray(sample["voxels"][0]))
        start = 0
        if args.warmstart:
            # RGB->event migration: fresh optimizer + schedule, transferred
            # weights where shapes match (reference train.py:114-138)
            from devo_tpu.utils.torch_import import load_warmstart
            params = load_warmstart(args.warmstart, params)

    step_fn = tr.build_train_step()
    logger = Logger(args.name, total_steps=start)
    key = jax.random.PRNGKey(1234)

    # validation scene list (reference evaluates TartanAir-EVS val every
    # 10k steps and logs ATE + trajectory figures, train.py:282-294)
    val_scenes = []
    if args.eval_every and args.val_split and os.path.exists(args.val_split):
        from devo_tpu.data.tartan import evs_scene_dir
        root = args.val_datapath or args.datapath
        val_scenes = [evs_scene_dir(root, s)
                      for s in open(args.val_split).read().split()]
        val_scenes = [s for s in val_scenes if os.path.isdir(s)]
    val_engines = {}   # compiled engines persist across validation rounds

    def run_validation(step):
        if not val_scenes:
            return
        from devo_tpu.runtime.config import EVAL_CONFIGS
        from devo_tpu.train.validate import validate_tartan_evs
        # the engine must be built with the TRAINING net's dimensions, or
        # net.apply re-initializes mismatched encoder shapes
        val_cfg = EVAL_CONFIGS.get("tartanair", EVAL_CONFIGS["default"]) \
            .replace(DIM_INET=args.dim_inet, DIM_FNET=args.dim_fnet,
                     DIM=args.dim, PATCHES_PER_FRAME=args.patches_per_image)
        vm = validate_tartan_evs(
            params, val_scenes, cfg=val_cfg, engine_cache=val_engines,
            max_frames=args.val_max_frames,
            figures_dir=os.path.join("runs", args.name, "val_figs"),
            step=step)
        if vm:
            logger.write_dict(vm)
            print(f"[val @ {step}] " + "  ".join(
                f"{k.split('/')[-2] if k.count('/') > 1 else k}="
                f"{v:.2f}" for k, v in vm.items()))

    prof_dir = os.path.join("runs", args.name, "profile")
    prof_open = False
    for step in range(start, args.steps):
        if args.profile and not prof_open and step - start >= args.profile_at:
            jax.profiler.start_trace(prof_dir)
            prof_open = True
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        # structure-only warmup for the first 1k steps (train.py:160)
        structure_only = step < 1000 and args.checkpoint is None
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, batch, sub,
                                             step, structure_only)
        logger.push({k: float(v) for k, v in metrics.items()})
        if prof_open and step - start >= args.profile_at + args.profile_steps:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            prof_open = False
            print(f"profile trace written to {prof_dir}")

        if (step + 1) % args.ckpt_every == 0:
            path = os.path.abspath(
                os.path.join(args.ckpt_dir, args.name, f"{step + 1:06d}"))
            Trainer.save_checkpoint(path, params, opt_state, step + 1)
            print(f"saved {path}")
        if args.eval_every and (step + 1) % args.eval_every == 0:
            run_validation(step + 1)

    if prof_open:   # run ended inside the trace window: flush, don't corrupt
        jax.profiler.stop_trace()
        print(f"profile trace written to {prof_dir}")
    # Exit watchdog + decisive exit: after long runs the process has been
    # observed to hang in cleanup even though every step, flush, and
    # checkpoint completed (r05 refresh + both resume legs; all threads
    # futex-parked — a wedged non-daemon writer thread joined at
    # interpreter shutdown). Everything is on disk at this point: give
    # close() 60 s, then exit without interpreter teardown either way.
    wd = threading.Timer(60.0, lambda: os._exit(0))
    wd.daemon = True
    wd.start()
    logger.close()  # flush tail metrics (SummaryWriter flushes every 120 s)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
