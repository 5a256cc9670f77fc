"""RGB->event warm-start migration (VERDICT r02 missing #4).

The reference warm-starts the 5-channel event model from an RGB-pretrained
DPVO checkpoint by keeping only shape-matched weights and re-initializing
the rest — exactly the two 3-channel input convs
(/root/reference/train.py:114-138, "keys with different shape:
['patchify.fnet.conv1.weight', 'patchify.inet.conv1.weight']").
"""
import numpy as np

import jax
import jax.numpy as jnp

from devo_tpu.nets.evonet import EVONet
from devo_tpu.utils.torch_import import warm_start

DIM, DIM_FNET, DIM_INET = 8, 16, 32


def _init_params():
    net = EVONet(P=3, dim_inet=DIM_INET, dim_fnet=DIM_FNET, dim=DIM,
                 bins=5)
    return net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
                    jax.random.PRNGKey(1))["params"]


def test_warm_start_drops_3ch_conv1_keeps_rest():
    rng = np.random.default_rng(0)
    # a partial RGB-DPVO-style state dict: 3-channel conv1s (mismatched
    # kernel, matching bias) + one matching linear head
    sd = {
        "patchify.fnet.conv1.weight": rng.standard_normal(
            (DIM, 3, 7, 7)).astype(np.float32),
        "patchify.fnet.conv1.bias": rng.standard_normal(
            (DIM,)).astype(np.float32),
        "patchify.inet.conv1.weight": rng.standard_normal(
            (DIM, 3, 7, 7)).astype(np.float32),
        "patchify.inet.conv1.bias": rng.standard_normal(
            (DIM,)).astype(np.float32),
        "update.d.1.weight": rng.standard_normal(
            (2, DIM_INET)).astype(np.float32),
        "update.d.1.bias": rng.standard_normal((2,)).astype(np.float32),
    }
    init = _init_params()
    merged, dropped = warm_start(sd, init, verbose=False)

    # the two 3ch kernels are the ONLY drops (reference prints exactly
    # these two keys); biases and the linear transfer
    assert len(dropped) == 2 and all("conv1/kernel" in d for d in dropped), \
        dropped
    np.testing.assert_array_equal(
        merged["patchify"]["fnet"]["conv1"]["kernel"],
        np.asarray(init["patchify"]["fnet"]["conv1"]["kernel"]))  # kept init
    np.testing.assert_array_equal(
        merged["patchify"]["fnet"]["conv1"]["bias"],
        sd["patchify.fnet.conv1.bias"])                           # transferred
    np.testing.assert_array_equal(
        merged["update"]["d_1"]["kernel"],
        sd["update.d.1.weight"].T)                                # (O,I)->(I,O)

    # untouched subtrees keep their init values
    np.testing.assert_array_equal(
        merged["patchify"]["fnet"]["conv2"]["kernel"],
        np.asarray(init["patchify"]["fnet"]["conv2"]["kernel"]))

    # the merged tree must still apply cleanly (same treedef as init)
    ls_a = jax.tree_util.tree_structure(init)
    ls_b = jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.asarray,
                                                               merged))
    assert ls_a == ls_b


def test_warm_start_exact_match_transfers_everything():
    """A same-shape dict (event->event) must transfer with zero drops."""
    rng = np.random.default_rng(1)
    sd = {
        "patchify.fnet.conv1.weight": rng.standard_normal(
            (DIM, 5, 7, 7)).astype(np.float32),
        "patchify.fnet.conv1.bias": rng.standard_normal(
            (DIM,)).astype(np.float32),
    }
    init = _init_params()
    merged, dropped = warm_start(sd, init, verbose=False)
    assert dropped == []
    np.testing.assert_array_equal(
        merged["patchify"]["fnet"]["conv1"]["kernel"],
        sd["patchify.fnet.conv1.weight"].transpose(2, 3, 1, 0))
