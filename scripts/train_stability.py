"""Training-stability evidence run.

Drives train-step optimization for N steps on the synthetic TartanAir-EVS
fixture and prints per-step loss + grad_nonfinite, then a PASS/FAIL
verdict:

  PASS iff grad_nonfinite == 0 on every step AND the mean loss over the
  last 10% of steps is below the mean over the first 10%.

This is the demonstration the round-1 verdict asked for (VERDICT.md item 8)
that the NaN-gradient fixes (guarded segment-softmax division + Lie
Taylor-branch guards, commit ff32e10) hold over hundreds of real optimizer
steps, not just one. Counterpart behavior: /root/reference/train.py:230-260
(the reference trains 240k steps without NaN hygiene because torch's
scatter_softmax never divides by ~0; our scatter-free segment softmax
needed the guards).

Usage:
  JAX_PLATFORMS=cpu python scripts/train_stability.py \
      --datapath /tmp/fake_tartan --steps 400
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--n_frames", type=int, default=10)
    p.add_argument("--ppi", type=int, default=8)
    p.add_argument("--dim_inet", type=int, default=64)
    p.add_argument("--dim_fnet", type=int, default=32)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--crop", type=int, nargs=2, default=(64, 64))
    p.add_argument("--lr", type=float, default=8e-5)
    p.add_argument("--platform", default="cpu",
                   help="jax platform; env JAX_PLATFORMS is too late here "
                        "because sitecustomize imports jax at interpreter "
                        "start (see tests/conftest.py)")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from devo_tpu.data.tartan import TartanAirEVS
    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.train.trainer import Trainer
    from train import data_loader

    dataset = TartanAirEVS(args.datapath, n_frames=args.n_frames,
                           crop_size=tuple(args.crop))
    net = EVONet(dim_inet=args.dim_inet, dim_fnet=args.dim_fnet,
                 dim=args.dim)
    # total_steps == run length so the OneCycle schedule traverses its full
    # warmup + anneal range inside the run (stability across LR extremes)
    tr = Trainer(net=net, lr=args.lr, total_steps=args.steps,
                 steps_unrolled=args.iters, ppi=args.ppi)
    loader = data_loader(dataset, jax.device_count(), seed=0)
    sample = next(loader)
    params, opt_state = tr.init(jax.random.PRNGKey(0),
                                jnp.asarray(sample["voxels"][0]))
    step_fn = tr.build_train_step()
    key = jax.random.PRNGKey(1234)

    losses, nonfinite_total = [], 0
    t0 = time.time()
    for step in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        key, sub = jax.random.split(key)
        # exercise both branches: structure-only warmup for the first 10%
        # (reference train.py:160 uses 1000 of 240k)
        so = step < max(args.steps // 10, 1)
        params, opt_state, metrics = step_fn(params, opt_state, batch, sub,
                                             step, so)
        loss = float(metrics["loss"])
        nf = int(metrics["grad_nonfinite"])
        nonfinite_total += nf
        losses.append(loss)
        print(f"step {step:4d}  loss {loss:9.4f}  grad_nonfinite {nf}  "
              f"({time.time() - t0:.0f}s)", flush=True)

    # Compare within the full-loss phase only: the first steps//10 steps run
    # structure_only=True, whose loss has a different composition (pose terms
    # excluded) — straddling that boundary made a decreasing run look like a
    # regression (measured: full-phase mean fell 11.1 -> 7.8 over 360 steps
    # while the naive head, taken in the structure-only phase, was 2.0).
    warm = max(args.steps // 10, 1)
    full = losses[warm:]
    k = max(len(full) // 10, 1)
    head = sum(full[:k]) / k
    tail = sum(full[-k:]) / k
    ok = nonfinite_total == 0 and tail < head
    print(json.dumps({
        "steps": args.steps,
        "grad_nonfinite_total": nonfinite_total,
        "fullphase_head": round(head, 4),
        "fullphase_tail": round(tail, 4),
        "wall_s": round(time.time() - t0, 1),
        "pass": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
