"""torch→flax weight import bridge.

The reference ecosystem ships weights as torch state dicts
(``best_weights.pt``, CycleGAN generator .pth — reference train.py:73-75,
sim2real_convert.py:90); this module maps them onto our flax parameter
trees so reference-trained checkpoints keep working.

Layout conversions: conv OIHW→HWIO, conv-transpose IOHW→HWIO (flipped
spatially per lax.conv_transpose convention), linear out,in→in,out; BN
weight/bias→scale/bias plus running stats into batch_stats.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items()}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d IOHW -> flax ConvTranspose HWIO.

    lax.conv_transpose with transpose_kernel=False (flax default) computes
    a fractionally-strided *forward* conv, so the torch kernel must be
    spatially flipped and in/out swapped.
    """
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def import_cyclegan_state_dict(path: str, params_template: Any):
    """Map the reference GeneratorResNet state dict onto our flax tree.

    The torch model is one nn.Sequential named ``model`` with conv layers
    at known indices; our flax module names convs ``Conv_0..Conv_n`` in
    the same construction order, so matching order-by-order is exact.
    """
    import jax

    sd = _load_state_dict(path)
    conv_weights = [(k, v) for k, v in sd.items() if k.endswith(".weight") and v.ndim == 4]
    conv_biases = {k[:-len(".weight")] + ".bias": sd.get(k[:-len(".weight")] + ".bias")
                   for k, _ in conv_weights}

    # flatten our template's conv params in creation order
    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    kernels = [(path_k, leaf) for path_k, leaf in flat
               if str(path_k[-1]) == "['kernel']" or getattr(path_k[-1], 'key', '') == 'kernel']

    new = jax.tree_util.tree_map(lambda x: x, params_template)  # copy
    # Build an ordered list of (module_path, kernel_shape)
    # and assign torch convs in order.
    def set_in(tree, path_keys, value):
        node = tree
        for k in path_keys[:-1]:
            node = node[k]
        node[path_keys[-1]] = value

    # Convert template to mutable dicts
    import flax
    new = flax.core.unfreeze(new) if hasattr(flax.core, "unfreeze") else new

    ti = 0
    for path_k, leaf in kernels:
        keys = [getattr(k, "key", str(k)) for k in path_k]
        tk, tw = conv_weights[ti]
        w = conv_kernel(tw)
        if w.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {keys}: torch {w.shape} vs flax {leaf.shape} ({tk})")
        set_in(new, keys, w)
        bias_key = tk[:-len(".weight")] + ".bias"
        b = conv_biases.get(bias_key)
        if b is not None:
            set_in(new, keys[:-1] + ["bias"], b)
        ti += 1
    if ti != len(conv_weights):
        raise ValueError(f"used {ti} of {len(conv_weights)} torch convs")
    return new
