"""Checkpointing: orbax for full train state, msgpack for bare weights.

Capability parity with the reference's two formats (ModelCheckpoint .ckpt
on best val_iou, train.py:39-44; bare ``best_weights.pt`` state dict,
train.py:73-75) plus a torch→flax import bridge for reference-trained
weights (models/torch_import.py).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
from flax import serialization


def _state_dict(state) -> dict:
    d = {"params": state.params, "batch_stats": state.batch_stats}
    for extra in ("opt_state", "opt_state_g", "opt_state_f"):
        if hasattr(state, extra):
            d[extra] = getattr(state, extra)
    return d


def save_checkpoint(ckpt_dir: str, state, epoch: int, *,
                    metrics: dict | None = None,
                    hparams: dict | None = None) -> str:
    """Save a full training checkpoint (msgpack tree + JSON metadata)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "best.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(_state_dict(state))))
    meta = {"epoch": epoch, "metrics": metrics or {}, "hparams": hparams or {}}
    with open(os.path.join(ckpt_dir, "best.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_checkpoint(ckpt_dir_or_file: str, template_state) -> tuple[Any, dict]:
    """Restore into the structure of ``template_state``; returns (state, meta)."""
    path = ckpt_dir_or_file
    if os.path.isdir(path):
        path = os.path.join(path, "best.msgpack")
    with open(path, "rb") as f:
        restored = serialization.from_bytes(
            jax.device_get(_state_dict(template_state)), f.read())
    meta = {}
    meta_path = os.path.join(os.path.dirname(path), "best.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    state = template_state.replace(
        **{k: restored[k] for k in restored
           if hasattr(template_state, k)})
    return state, meta


def save_weights(path: str, state) -> None:
    """Bare weights (params + batch_stats), the best_weights.pt analog."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats})))


def load_weights(path: str, state):
    with open(path, "rb") as f:
        restored = serialization.from_bytes(
            jax.device_get({"params": state.params,
                            "batch_stats": state.batch_stats}), f.read())
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"])
