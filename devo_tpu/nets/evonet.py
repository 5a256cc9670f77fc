"""The event-VO network: Patchifier + Update operator.

Flax counterpart of /root/reference/devo/enet.py (`Patchifier`, `eVONet`).
The module tree mirrors the torch attribute paths (patchify.fnet / .inet /
.scorer, update.*) so DEVO checkpoints import mechanically.

The Patchifier runs the matching encoder (instance norm), the context
encoder (no norm) — both scaled by 1/4 (enet.py:124-125) — and the scorer,
selects patch locations, and gathers per-patch context (imap), matching
features (gmap) and (x, y, depth) grids. The training forward
(unrolled DBA iterations) lives in train/forward.py; the inference engine in
runtime/engine.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from devo_tpu.ops.patchify import coords_grid_with_index, extract_patches

from . import selector as sel
from .encoder import BasicEncoder4Evs, Scorer
from .update import Update


class Patchifier(nn.Module):
    patch_size: int = 3
    dim_inet: int = 384
    dim_fnet: int = 128
    dim: int = 32
    patch_selector: str = "scorer"
    dtype: jnp.dtype = jnp.float32
    bins: int = 5
    fused_encoders: bool = False   # evaluate fnet+inet as ONE block-diagonal
                                   # network (nets/fused_encoder.py): exact,
                                   # halves the lane-padded stage-1 traffic
                                   # on TPU. Params/init are unchanged.
    scorer_s2d: bool = False       # evaluate the scorer in space-to-depth
                                   # layout (nets/scorer_s2d.py): exact,
                                   # removes the 128-lane padding of the
                                   # full-res 8/16/32-channel intermediates.
    encoder_s2d: bool = False      # stage 1 of the fused encoders in
                                   # space-to-depth(2) layout (exact;
                                   # fused_encoder.fused_encode_s2d).
                                   # Requires fused_encoders.

    def setup(self):
        self.fnet = BasicEncoder4Evs(output_dim=self.dim_fnet, dim=self.dim,
                                     norm_fn="instance", name="fnet",
                                     dtype=self.dtype)
        self.inet = BasicEncoder4Evs(output_dim=self.dim_inet, dim=self.dim,
                                     norm_fn="none", name="inet",
                                     dtype=self.dtype)
        if self.patch_selector == "scorer":
            self.scorer = Scorer(bins=self.bins, name="scorer",
                                 dtype=self.dtype)

    def __call__(
        self,
        voxels: jnp.ndarray,       # (n, H, W, bins)
        key: jax.Array,
        patches_per_image: int = 80,
        disps: Optional[jnp.ndarray] = None,  # (n, H/4, W/4)
        training: bool = False,
        scorer_eval_mode: str = "multi",
        scorer_eval_use_grid: bool = True,
    ) -> Dict[str, Any]:
        n, H, W, _ = voxels.shape
        P = self.patch_size
        if self.fused_encoders and not self.is_initializing():
            from .fused_encoder import fused_encode, fused_encode_s2d
            enc = fused_encode_s2d if self.encoder_s2d else fused_encode
            fmap, imap = enc(self.variables["params"]["fnet"],
                             self.variables["params"]["inet"],
                             voxels, dtype=self.dtype)
            fmap = (fmap / 4.0).astype(jnp.float32)
            imap = (imap / 4.0).astype(jnp.float32)
        else:
            fmap = (self.fnet(voxels) / 4.0).astype(jnp.float32)   # (n, h, w, dim_fnet)
            imap = (self.inet(voxels) / 4.0).astype(jnp.float32)   # (n, h, w, dim_inet)
        h, w = fmap.shape[1:3]

        scores_sel = None
        if self.patch_selector == "scorer":
            if self.scorer_s2d and not self.is_initializing():
                from .scorer_s2d import scorer_s2d_forward
                raw = scorer_s2d_forward(
                    self.variables["params"]["scorer"], voxels,
                    dtype=self.dtype)          # (n, h2, w2)
            else:
                raw = self.scorer(voxels)      # (n, h2, w2)
            scores = jax.nn.sigmoid(raw)
            if training:
                x, y, scores_sel = sel.select_training_scorer(
                    key, scores, patches_per_image)
            else:
                if scorer_eval_mode == "multi":
                    x, y = sel.select_multi(key, scores, patches_per_image,
                                            use_grid=scorer_eval_use_grid)
                elif scorer_eval_mode == "topk":
                    x, y = sel.select_topk(scores, patches_per_image,
                                           use_grid=scorer_eval_use_grid)
                elif scorer_eval_mode == "nms":
                    x, y = sel.select_nms(scores, patches_per_image,
                                          use_grid=scorer_eval_use_grid)
                else:
                    raise NotImplementedError(scorer_eval_mode)
                scores_sel = sel.gather_scores(scores, x, y)
                x = x + 1
                y = y + 1
        elif self.patch_selector == "gradient":
            # bias selection toward high event-gradient regions
            # (enet.py:130-141): the pooled finite-difference magnitude maps
            # replaces the learned score map; training uses 3x-random
            # (enet.py:135-137), eval the configured sampler; coords are
            # CLAMPED into [1, w-2] x [1, h-2] instead of +1-shifted
            g = sel.event_gradient(voxels)              # (n, gh, gw)
            if training:
                x, y = sel.select_3xrandom(key, g, patches_per_image)
            elif scorer_eval_mode == "multi":
                x, y = sel.select_multi(key, g, patches_per_image,
                                        use_grid=scorer_eval_use_grid)
            elif scorer_eval_mode == "topk":
                x, y = sel.select_topk(g, patches_per_image,
                                       use_grid=scorer_eval_use_grid)
            elif scorer_eval_mode == "nms":
                x, y = sel.select_nms(g, patches_per_image,
                                      use_grid=scorer_eval_use_grid)
            else:
                raise NotImplementedError(scorer_eval_mode)
            x = jnp.clip(x, 1, w - 2)
            y = jnp.clip(y, 1, h - 2)
        elif self.patch_selector == "random":
            x, y = sel.select_random(key, n, h, w, patches_per_image)
        else:
            raise NotImplementedError(self.patch_selector)

        coords = jnp.stack([x, y], axis=-1).astype(jnp.float32)  # (n, ppi, 2)

        imap_p = extract_patches(imap, coords, 0)[:, :, 0, 0, :]        # (n, ppi, dim_inet)
        gmap_p = extract_patches(fmap, coords, P // 2)                  # (n, ppi, P, P, dim_fnet)

        if disps is None:
            disps = jnp.ones((n, h, w), fmap.dtype)
        grid = coords_grid_with_index(disps)                            # (n, h, w, 3)
        patches = extract_patches(grid, coords, P // 2)                 # (n, ppi, P, P, 3)
        patches = patches.transpose(0, 1, 4, 2, 3)                      # (n, ppi, 3, P, P)

        # event "color" for visualization: |voxel| summed over bins at 4x coords
        mag = jnp.abs(voxels).sum(-1, keepdims=True)                    # (n, H, W, 1)
        clr = extract_patches(mag, 4.0 * (coords + 0.5), 0)[:, :, 0, 0, 0]
        clr = jnp.clip(clr, 0, 255)

        index = jnp.repeat(jnp.arange(n), patches_per_image)

        return {
            "fmap": fmap, "imap": imap_p, "gmap": gmap_p,
            "patches": patches, "index": index, "scores": scores_sel,
            "clr": clr, "coords": coords,
        }


class EVONet(nn.Module):
    """Container matching eVONet's parameter tree (enet.py:219-232)."""
    P: int = 3
    dim_inet: int = 384
    dim_fnet: int = 128
    dim: int = 32
    patch_selector: str = "scorer"
    dtype: jnp.dtype = jnp.float32   # bf16 under mixed precision (devo.py:71-74)
    bins: int = 5                    # 5 voxel bins; 3 for RGB frames (VONet)
    fused_encoders: bool = False     # see Patchifier.fused_encoders
    scorer_s2d: bool = False         # see Patchifier.scorer_s2d
    encoder_s2d: bool = False        # see Patchifier.encoder_s2d

    def setup(self):
        self.patchify = Patchifier(
            patch_size=self.P, dim_inet=self.dim_inet, dim_fnet=self.dim_fnet,
            dim=self.dim, patch_selector=self.patch_selector, name="patchify",
            dtype=self.dtype, bins=self.bins,
            fused_encoders=self.fused_encoders, scorer_s2d=self.scorer_s2d,
            encoder_s2d=self.encoder_s2d)
        self.update = Update(dim=self.dim_inet,
                             corr_dim=2 * 49 * self.P * self.P, name="update",
                             dtype=self.dtype)

    def __call__(self, voxels, key):
        """Parameter-initialization path only; real entry points are the
        `patchify` / `update` methods via nn.apply(..., method=...)."""
        out = self.patchify(voxels, key, patches_per_image=4)
        E = out["imap"].shape[0] * out["imap"].shape[1]
        dummy = jnp.zeros((E, 2 * 49 * self.P * self.P))
        net = jnp.zeros((E, self.dim_inet))
        ctx = out["imap"].reshape(E, self.dim_inet)
        ix = jnp.full((E,), -1, jnp.int32)
        seg = jnp.zeros((E,), jnp.int32)
        mask = jnp.ones((E,), bool)
        return self.update(net, ctx, dummy, ix, ix, seg, E, seg, E, mask)

    def run_patchify(self, voxels, key, **kw):
        return self.patchify(voxels, key, **kw)

    def run_update(self, *args, **kw):
        return self.update(*args, **kw)
