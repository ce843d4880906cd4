"""Checkpointing: orbax CheckpointManager for train state, msgpack for
bare weights.

Capability parity with the reference's two formats (ModelCheckpoint .ckpt
on best val_iou, train.py:39-44; bare ``best_weights.pt`` state dict,
train.py:73-75) plus a torch→flax import bridge for reference-trained
weights (models/torch_import.py).

``TrainCheckpointManager`` wraps ``orbax.checkpoint.CheckpointManager``
with async writes, retention (``max_to_keep``) and monitor-max-``val_iou``
best-step tracking.  ``load_checkpoint`` also still reads the legacy
round-1 msgpack layout (``best.msgpack`` + ``best.json``) so older runs
stay resumable.
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


class TrainCheckpointManager:
    """Async orbax manager keyed on epoch, keeping the best-``monitor`` k."""

    def __init__(self, ckpt_dir: str, *, max_to_keep: int = 1,
                 monitor: str = "val_iou", mode: str = "max",
                 use_async: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.monitor = monitor
        kw = {}
        if jax.process_count() > 1:
            # saved trees are device_get'd numpy of fully-REPLICATED state,
            # so every rank holds the complete checkpoint and saves LOCALLY:
            # active_processes={this rank} scopes orbax's async-commit
            # barrier to one participant (instant), and the per-(rank, dir)
            # key prefix keeps the barrier names of the several live
            # managers from colliding ("Barrier _async_write_complete.0 is
            # already ongoing" otherwise).  cli/train.py gives each
            # non-zero rank a scratch out_dir; rank 0's is canonical.
            import hashlib
            prefix = "p%d_%s" % (
                jax.process_index(),
                hashlib.md5(os.path.abspath(ckpt_dir).encode())
                .hexdigest()[:8])
            kw["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
                primary_host=None,
                active_processes={jax.process_index()},
                barrier_sync_key_prefix=prefix)
            # orbax refuses create=True with active_processes set
            os.makedirs(os.path.abspath(ckpt_dir), exist_ok=True)
            kw["create"] = False
            # Async saves are UNSAFE in this per-rank-directory design:
            # orbax's handler-awaitable signals (futures/synchronization.py)
            # key on a process-LOCAL OperationIdGenerator counter that is
            # NOT scoped by barrier_sync_key_prefix, and all ranks share
            # one JAX coordination KV store — so rank A's
            # ITEM_DIRECTORY_CREATION signal for ITS operation N releases
            # rank B's async writer for B's unrelated operation N before
            # B's mkdir ran (observed: FileNotFoundError on
            # `metrics.orbax-checkpoint-tmp/metrics` whenever ranks drift
            # out of save lockstep).  The synchronous path orders mkdir
            # before handler writes within one thread, so foreign signals
            # are harmless there.
            use_async = False
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get(monitor, float("-inf")),
            best_mode=mode,
            enable_async_checkpointing=use_async, **kw)
        self._mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir),
                                          options=opts)

    def save(self, epoch: int, state, *, metrics: dict | None = None,
             hparams: dict | None = None) -> None:
        ocp = self._ocp
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        meta = {"epoch": int(epoch), "metrics": metrics,
                "hparams": hparams or {}}
        self._mgr.save(
            int(epoch),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(jax.device_get(_state_dict(state))),
                meta=ocp.args.JsonSave(meta)),
            metrics=metrics)

    def restore(self, template_state, step: int | None = None):
        ocp = self._ocp
        if step is None:
            step = self._mgr.best_step()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoints in manager directory")
        restored = self._mgr.restore(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(
                    jax.device_get(_state_dict(template_state))),
                meta=ocp.args.JsonRestore()))
        state = template_state.replace(
            **{k: restored["state"][k] for k in restored["state"]
               if hasattr(template_state, k)})
        return state, dict(restored["meta"] or {})

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _is_orbax_dir(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    return any(name.isdigit() for name in os.listdir(path))


def save_checkpoint(ckpt_dir: str, state, epoch: int, *,
                    metrics: dict | None = None,
                    hparams: dict | None = None) -> str:
    """One-shot save through a fresh manager (sync); returns the dir."""
    with TrainCheckpointManager(ckpt_dir, use_async=False) as mgr:
        mgr.save(epoch, state, metrics=metrics, hparams=hparams)
    return ckpt_dir


def load_checkpoint(ckpt_dir_or_file: str, template_state) -> tuple[Any, dict]:
    """Restore into the structure of ``template_state``.

    Accepts an orbax manager directory (best step restored), a legacy
    round-1 msgpack directory, or a bare msgpack file.
    """
    path = ckpt_dir_or_file
    if _is_orbax_dir(path):
        with TrainCheckpointManager(path, use_async=False) as mgr:
            return mgr.restore(template_state)
    # legacy layout: <dir>/best.msgpack + best.json
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


def _remap_legacy_flat(file_tree: dict, target: dict) -> dict | None:
    """Map a pre-split flat module layout onto the featureExtractor/
    classifier split.

    Early LaneNetLite weights (artifacts/lanenet_lite_sim.msgpack) were
    saved from a flat module (ConvBN_*/ResBlock_*/head at top level);
    the model has since been split into featureExtractor + classifier
    submodules so the MME grad-reverse seam works on it.  Returns the
    re-nested tree, or None if the layouts don't correspond.
    """
    for coll in ("params", "batch_stats"):
        t = target.get(coll, {})
        if set(t) - {"featureExtractor", "classifier"}:
            return None
        cls_keys = set(t.get("classifier", {}))
        fe_keys = set(t.get("featureExtractor", {}))
        have = set(file_tree.get(coll, {}))
        if have != fe_keys | cls_keys or fe_keys & cls_keys:
            return None
    out = {}
    for coll in ("params", "batch_stats"):
        src, t = file_tree.get(coll, {}), target.get(coll, {})
        nested = {}
        for sub in ("featureExtractor", "classifier"):
            if sub in t:
                nested[sub] = {k: src[k] for k in t[sub]}
        out[coll] = nested
    return out


def load_weights(path: str, state):
    target = jax.device_get({"params": state.params,
                             "batch_stats": state.batch_stats})
    with open(path, "rb") as f:
        blob = f.read()
    try:
        restored = serialization.from_bytes(target, blob)
    except ValueError:
        remapped = _remap_legacy_flat(serialization.msgpack_restore(blob),
                                      target)
        if remapped is None:
            raise
        restored = serialization.from_state_dict(target, remapped)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"])
