"""Torch checkpoint importer.

Converts a DEVO/DPVO torch state_dict (e.g. DEVO.pth, ~40 MB,
/root/reference/README.md:100) into the flax parameter tree of
devo_tpu.nets.EVONet, reproducing the reference's legacy handling
(devo/devo.py:111-120: strip 'module.' prefixes, drop 'update.lmbda').

Layout conversions:
  conv weight   (O, I, kh, kw) -> (kh, kw, I, O)
  linear weight (O, I)         -> (I, O)
  norm scale/bias              -> as-is

The mapping below is explicit so a missing/renamed key fails loudly.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _lin(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _arr(w):
    return np.asarray(w)


def _encoder_entries(prefix: str, norm_fn: str):
    """Parameter map for one BasicEncoder4Evs (extractor.py:269-335)."""
    fprefix = prefix.replace(".", "/")
    out = {
        f"{prefix}.conv1": (f"{fprefix}/conv1", "conv"),
        f"{prefix}.conv2": (f"{fprefix}/conv2", "conv"),
    }
    for li, blocks in (("layer1", 2), ("layer2", 2)):
        for b in range(blocks):
            t = f"{prefix}.{li}.{b}"
            f = f"{fprefix}/{li}_{b}"
            out[f"{t}.conv1"] = (f"{f}/conv1", "conv")
            out[f"{t}.conv2"] = (f"{f}/conv2", "conv")
            # strided blocks carry a 1x1 downsample conv (Sequential index 0)
            out[f"{t}.downsample.0"] = (f"{f}/downsample", "conv")
    return out


def _update_entries():
    m = {}
    for i in (0, 2, 5):
        m[f"update.corr.{i}"] = (f"update/corr_{i}", "linear")
    m["update.corr.3"] = ("update/corr_3", "norm")
    m["update.norm"] = ("update/norm", "norm")
    for c in ("c1", "c2"):
        m[f"update.{c}.0"] = (f"update/{c}_0", "linear")
        m[f"update.{c}.2"] = (f"update/{c}_2", "linear")
    for agg in ("agg_kk", "agg_ij"):
        for p in ("f", "g", "h"):
            m[f"update.{agg}.{p}"] = (f"update/{agg}/{p}", "linear")
    m["update.gru.0"] = ("update/gru_0", "norm")
    m["update.gru.2"] = ("update/gru_2", "norm")
    for g in (1, 3):
        m[f"update.gru.{g}.gate.0"] = (f"update/gru_{g}/gate_0", "linear")
        m[f"update.gru.{g}.res.0"] = (f"update/gru_{g}/res_0", "linear")
        m[f"update.gru.{g}.res.2"] = (f"update/gru_{g}/res_2", "linear")
    m["update.d.1"] = ("update/d_1", "linear")
    m["update.w.1"] = ("update/w_1", "linear")
    return m


def build_mapping():
    m = {}
    m.update(_encoder_entries("patchify.fnet", "instance"))
    m.update(_encoder_entries("patchify.inet", "none"))
    for i in (0, 2, 4, 6):
        m[f"patchify.scorer.scorer.{i}"] = (f"patchify/scorer/scorer_{i}", "conv")
    m.update(_update_entries())
    return m


def _set_nested(tree: Dict, path: str, leaf: str, value):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf] = value


def convert_state_dict(state_dict, strict: bool = False) -> Dict:
    """torch state_dict (tensors or numpy) -> flax params dict.

    strict=True (the full-checkpoint path, load_checkpoint) raises when any
    mapped weight other than the optional downsample convs is absent — a
    truncated/mismatched DEVO.pth must fail at import time, not as an opaque
    flax merge error later. strict=False converts partial dicts (module-
    level parity tests)."""
    sd = {}
    for k, v in state_dict.items():
        if "update.lmbda" in k:
            continue  # dropped by the reference loader (devo.py:118)
        k = k.replace("module.", "")
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    mapping = build_mapping()
    params: Dict = {}
    used = set()
    missing = []
    for tkey, (fpath, kind) in mapping.items():
        wk, bk = tkey + ".weight", tkey + ".bias"
        if wk not in sd:
            # only the downsample convs are legitimately absent (they exist
            # solely on strided residual blocks); any other mapped weight
            # missing means a truncated/mismatched checkpoint — fail loudly
            # here, not as an opaque flax merge error later
            if "downsample" not in tkey:
                missing.append(wk)
            continue
        used.add(wk)
        if kind == "conv":
            _set_nested(params, fpath, "kernel", _conv(sd[wk]))
        elif kind == "linear":
            _set_nested(params, fpath, "kernel", _lin(sd[wk]))
        elif kind == "norm":
            _set_nested(params, fpath, "scale", _arr(sd[wk]))
        if bk in sd:
            used.add(bk)
            _set_nested(params, fpath, "bias", _arr(sd[bk]))

    if missing and strict:
        raise ValueError(f"checkpoint is missing mapped weights: "
                         f"{missing[:10]}"
                         f"{'...' if len(missing) > 10 else ''}")
    leftover = [k for k in sd if k not in used]
    if leftover:
        raise ValueError(f"unmapped torch keys: {leftover[:10]}"
                         f"{'...' if len(leftover) > 10 else ''}")
    return params


def load_checkpoint(path: str) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return convert_state_dict(ckpt, strict=True)


def _to_plain(tree):
    """Nested (Frozen)Dict of arrays -> plain dict of numpy copies."""
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.array(tree)


def _merge_matching(dst: Dict, src: Dict, dropped, path=""):
    for k, v in src.items():
        if k not in dst:
            dropped.append(f"{path}{k} (not in target model)")
            continue
        if isinstance(v, dict):
            _merge_matching(dst[k], v, dropped, path + k + "/")
        elif tuple(np.shape(v)) == tuple(np.shape(dst[k])):
            dst[k] = np.asarray(v)
        else:
            dropped.append(f"{path}{k} {tuple(np.shape(v))} != "
                           f"{tuple(np.shape(dst[k]))}")


def warm_start(state_dict, init_params, verbose: bool = True):
    """RGB->event warm-start migration (/root/reference/train.py:114-138).

    The reference warm-starts the 5-channel event model from an
    RGB-pretrained DPVO checkpoint by keeping only weights whose SHAPE
    matches the target model and silently re-initializing the rest — in
    practice exactly the two 3-channel input convs
    ('patchify.{fnet,inet}.conv1.weight', (32, 3, 7, 7) vs (32, 5, 7, 7));
    their biases match and transfer. Returns (params, dropped_paths):
    `init_params` with every shape-matched torch weight copied in.
    """
    src = convert_state_dict(state_dict, strict=False)
    dst = _to_plain(init_params)
    dropped = []
    _merge_matching(dst, src, dropped)
    if verbose and dropped:
        print(f"warm_start: re-initializing {len(dropped)} mismatched "
              f"weights: {dropped}")
    return dst, dropped


def load_warmstart(path: str, init_params) -> Dict:
    """CLI entry: torch checkpoint -> shape-matched merge over fresh init
    (train.py --warmstart)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    params, _ = warm_start(ckpt, init_params)
    return params
