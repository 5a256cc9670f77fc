"""Measure the FULL-SCALE train-step memory envelope (VERDICT r04 item 6).

Compiles (never runs) the complete train step at the reference's training
scale — 480x640 voxels, 15-frame clips, 18 unrolled iterations, 80
patches/image, dim_inet 384, batch 1 (reference train.py:358-380) — on the
attached TPU via the remote compiler, and prints XLA's memory analysis for
remat on (jax.checkpoint around each unrolled step, train/forward.py) and
off. This is the number the train/forward.py docstring's remat claim rests
on; results recorded in PERF_NOTES r05.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_train_memory.py [--remat {on,off,both}]
"""
import argparse
import json
import sys
import time


def measure(remat: bool, args):
    import jax
    import jax.numpy as jnp

    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.train.trainer import Trainer

    net = EVONet(dim_inet=args.dim_inet, dim_fnet=args.dim_fnet,
                 dim=args.dim)
    tr = Trainer(net=net, total_steps=240_000, steps_unrolled=args.iters,
                 ppi=args.ppi, remat=remat)

    B, F, H, W = 1, args.n_frames, args.height, args.width
    specs = dict(
        voxels=jax.ShapeDtypeStruct((B, F, H, W, 5), jnp.float32),
        poses=jax.ShapeDtypeStruct((B, F, 7), jnp.float32),
        disps=jax.ShapeDtypeStruct((B, F, H, W), jnp.float32),
        intrinsics=jax.ShapeDtypeStruct((B, 4), jnp.float32),
    )
    params, opt_state = jax.eval_shape(
        lambda k: tr.init(k, jnp.zeros((F, H, W, 5))), jax.random.PRNGKey(0))
    step = tr.build_train_step(donate=False)

    t0 = time.time()
    lowered = step.lower(params, opt_state, specs, jax.random.PRNGKey(1),
                         jax.ShapeDtypeStruct((), jnp.int32), False)
    t1 = time.time()
    print(f"[remat={remat}] lowered in {t1 - t0:.0f}s; compiling...",
          flush=True)
    compiled = lowered.compile()
    t2 = time.time()
    ma = compiled.memory_analysis()
    out = dict(
        remat=remat,
        temp_bytes=int(ma.temp_size_in_bytes),
        argument_bytes=int(ma.argument_size_in_bytes),
        output_bytes=int(ma.output_size_in_bytes),
        alias_bytes=int(ma.alias_size_in_bytes),
        compile_s=round(t2 - t1, 1),
    )
    out["total_gb"] = round((out["temp_bytes"] + out["argument_bytes"]
                             + out["output_bytes"]
                             - out["alias_bytes"]) / 2**30, 3)
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--remat", default="both", choices=["on", "off", "both"])
    p.add_argument("--iters", type=int, default=18)
    p.add_argument("--n_frames", type=int, default=15)
    p.add_argument("--ppi", type=int, default=80)
    p.add_argument("--dim_inet", type=int, default=384)
    p.add_argument("--dim_fnet", type=int, default=128)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    args = p.parse_args()

    from devo_tpu.utils.timing import enable_compilation_cache
    enable_compilation_cache()

    results = []
    modes = {"on": [True], "off": [False], "both": [True, False]}[args.remat]
    for remat in modes:
        try:
            results.append(measure(remat, args))
        except Exception as e:  # OOM-at-compile is itself a result
            print(json.dumps({"remat": remat, "error": repr(e)[:500]}),
                  flush=True)
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
