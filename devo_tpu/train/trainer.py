"""Training loop.

Counterpart of /root/reference/train.py: AdamW + OneCycle linear schedule
(train.py:109-111), gradient clipping at 10 (train.py:248), checkpointing
(train.py:271-280), and data parallelism.

TPU-native distribution: instead of NCCL DDP (train.py:31-42), the train
step is jit-compiled over a `jax.sharding.Mesh` with the batch sharded on
the 'dp' axis and parameters replicated; XLA inserts the gradient
all-reduce (psum) automatically. Multi-host scaling uses the same code via
jax.distributed.initialize.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from devo_tpu.nets.evonet import EVONet

from .forward import evonet_forward
from .loss import total_loss


def one_cycle_linear(lr: float, total_steps: int, pct_start: float = 0.01):
    """OneCycleLR(anneal_strategy='linear') as used at train.py:110-111."""
    warmup = max(int(total_steps * pct_start), 1)
    return optax.join_schedules(
        [optax.linear_schedule(lr / 25.0, lr, warmup),
         optax.linear_schedule(lr, lr / 1e4, total_steps - warmup)],
        [warmup])


def make_optimizer(lr: float = 8e-5, total_steps: int = 240_000,
                   weight_decay: float = 1e-5, clip: float = 10.0):
    sched = one_cycle_linear(lr, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(sched, weight_decay=weight_decay, eps=1e-8),
    ), sched


class Trainer:
    def __init__(
        self,
        net: Optional[EVONet] = None,
        lr: float = 8e-5,
        total_steps: int = 240_000,
        steps_unrolled: int = 18,
        ppi: int = 80,
        pose_weight: float = 10.0,
        flow_weight: float = 0.1,
        scores_weight: float = 0.05,
        mesh: Optional[Mesh] = None,
        randaug: bool = False,
        grow_after: int = 8,
        corr_dropout: float = 0.2,   # backward keeps this edge fraction
                                     # (reference enet.py:204)
        remat: bool = True,          # jax.checkpoint each unrolled step
    ):
        self.net = net or EVONet()
        self.tx, self.sched = make_optimizer(lr, total_steps)
        self.steps_unrolled = steps_unrolled
        self.ppi = ppi
        self.randaug = randaug
        self.grow_after = grow_after
        self.corr_dropout = corr_dropout
        self.remat = remat
        self.weights = dict(pose_weight=pose_weight, flow_weight=flow_weight,
                            scores_weight=scores_weight)
        if mesh is None:
            devs = np.asarray(jax.devices())
            mesh = Mesh(devs.reshape(-1), ("dp",))
        self.mesh = mesh
        self._train_step = None

    def init(self, key, sample_voxels):
        params = self.net.init(key, jnp.asarray(sample_voxels[:1]),
                               jax.random.PRNGKey(0))["params"]
        opt_state = self.tx.init(params)
        return params, opt_state

    def loss_fn(self, params, batch, key, step_count, structure_only=False):
        """batch: dict of (B, ...) arrays; per-sample forward vmapped."""

        def single(voxels, poses, disps, intr, k):
            traj = evonet_forward(
                self.net, params, voxels, poses, disps, intr, k,
                steps=self.steps_unrolled, ppi=self.ppi,
                structure_only=structure_only, randaug=self.randaug,
                grow_after=self.grow_after,
                corr_dropout=self.corr_dropout, remat=self.remat)
            out = total_loss(traj, P=self.net.P,
                             structure_only=structure_only,
                             # gradient/random selectors emit no score maps
                             # (reference trains the scorer loss only under
                             # SelectionMethod.SCORER, enet.py:193-195)
                             use_scorer=self.net.patch_selector == "scorer",
                             **{k2: v for k2, v in self.weights.items()})
            return out

        B = batch["voxels"].shape[0]
        keys = jax.random.split(key, B)
        outs = jax.vmap(single)(batch["voxels"], batch["poses"],
                                batch["disps"], batch["intrinsics"], keys)
        return jnp.mean(outs["loss"]), {k: jnp.mean(v) for k, v in outs.items()}

    def build_train_step(self, donate: bool = True):
        mesh = self.mesh

        def train_step(params, opt_state, batch, key, step_count,
                       structure_only=False):
            (loss, metrics), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(params, batch, key, step_count,
                                            structure_only)
            # zero non-finite gradient entries (the reference relies on the
            # same behavior via GradZero/GradientClip, devo/blocks.py:74-107,
            # and clip-NaN swallowing in torch's DDP path); track how often
            nan_cnt = jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda g: jnp.sum(~jnp.isfinite(g)), grads))
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            nan = ~jnp.isfinite(loss)
            grads = jax.tree.map(lambda g: jnp.where(nan, 0.0, g), grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics, grad_nonfinite=nan_cnt)
            return params, opt_state, metrics

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        batch_sharding = dict(voxels=data, poses=data, disps=data, intrinsics=data)
        self._train_step = jax.jit(
            train_step,
            in_shardings=(repl, repl, batch_sharding, repl, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1) if donate else (),
            static_argnums=(5,),
        )
        return self._train_step

    # ---------------------------------------------------------- checkpoints
    # The reference saves model + optimizer + scheduler + steps
    # (/root/reference/train.py:271-280); dropping any of them makes a
    # crash-resume diverge from the uninterrupted run (fresh AdamW moments,
    # restarted OneCycle). The schedule position is implicit in `step`
    # (optax keeps its count inside opt_state as well).
    @staticmethod
    def save_checkpoint(path: str, params, opt_state, step: int):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": params, "opt_state": opt_state,
                          "step": np.int64(step)}, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str):
        """Restore {params, opt_state, step}. Needs `self` for the opt_state
        pytree structure (orbax restores against an abstract target).
        Tolerates legacy round-1 checkpoints without opt_state (re-inits the
        optimizer and warns)."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path)
        if "opt_state" in restored:
            # re-restore structured: opt_state round-trips as raw pytrees
            # (lists/dicts); rebuild the optax NamedTuple structure
            abstract_opt = jax.tree.map(
                ocp.utils.to_shape_dtype_struct,
                self.tx.init(restored["params"]))
            restored = ckptr.restore(
                path, {"params": jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                              restored["params"]),
                       "opt_state": abstract_opt,
                       # a bare np.int64 scalar is rejected as an abstract
                       # target; a 0-d array restores fine
                       "step": np.asarray(0, np.int64)})
        else:
            import warnings
            warnings.warn(f"checkpoint {path} has no opt_state "
                          "(legacy format): optimizer moments re-initialized")
            restored = dict(restored,
                            opt_state=self.tx.init(restored["params"]))
        return restored
