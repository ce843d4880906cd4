"""Fit/validate/test loop with best-checkpoint tracking.

Mirrors the reference driver semantics (train.py:39-75): per-epoch
validation on val_loss/acc/dice/iou, checkpoint the single best model on
max ``val_iou``, run the test pass at the end, and save final weights.
Checkpointing uses an async orbax CheckpointManager (retention k=1,
monitor-max-val_iou — checkpoint.TrainCheckpointManager); metrics go to
stdout + an optional tensorboardX writer + a JSONL history file.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Iterable

import jax
import numpy as np

from ..data.prefetch import background_batches
from ..ops.metrics import summarize_weighted
from .checkpoint import TrainCheckpointManager, save_weights

log = logging.getLogger(__name__)


class MetricLogger:
    def __init__(self, out_dir: str, use_tensorboard: bool = True):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.history_path = os.path.join(out_dir, "metrics.jsonl")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, scalars: dict):
        scalars = {k: float(v) for k, v in scalars.items()}
        with open(self.history_path, "a") as f:
            f.write(json.dumps({"step": step, **scalars}) + "\n")
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)


def run_eval(eval_step: Callable, state, batches: Iterable) -> dict:
    outs = [jax.device_get(eval_step(state, x, y)) for x, y in batches]
    if not outs:
        return {"loss": 0.0, "acc": 0.0, "dice": 0.0, "iou": 0.0}
    return summarize_weighted(outs)


def fit(trainer, state, data, *, max_epochs: int, out_dir: str,
        model_name: str = "baseline", seed: int = 42,
        train_step_fn: Callable | None = None,
        log_every: int = 50, start_epoch: int = 0,
        resume: bool = False) -> tuple:
    """Train with per-epoch validation and best-val_iou checkpointing.

    ``trainer`` is a SupervisedTrainer/MMETrainer; ``data`` a data module.
    ``train_step_fn(state, batch, key, epoch) -> (state, logs)`` lets MME
    reuse this loop; default is the supervised step.
    ``resume=True`` restarts from the run's own checkpoint dirs when they
    exist (a crashed run continues at saved-epoch + 1 with the saved opt
    state and best-val_iou watermark); a fresh dir trains normally.  Two
    checkpoint channels are kept: ``checkpoints`` holds the best-val_iou
    state (reference ModelCheckpoint save_top_k=1 semantics) and
    ``checkpoints_latest`` the end-of-epoch state, so resume loses at
    most one epoch even when the best epoch is long past.
    Returns (best_state, best_iou, logger).
    """
    logger = MetricLogger(out_dir)
    key = jax.random.key(seed)
    best_iou, best_state = -1.0, state
    global_step = 0
    ckpt_mgr = TrainCheckpointManager(os.path.join(out_dir, "checkpoints"))
    # monitor="epoch" makes best==latest under the same manager machinery
    latest_mgr = TrainCheckpointManager(
        os.path.join(out_dir, "checkpoints_latest"), monitor="epoch")
    if resume:
        state, best_iou, best_state, start_epoch, global_step = \
            _restore_for_resume(ckpt_mgr, latest_mgr, out_dir, state,
                                best_iou, best_state, start_epoch)

    # the scanned-epoch fast path only replicates the trainer's DEFAULT
    # step semantics; explicit custom step fns (distill, CLI overrides)
    # use the per-batch loop
    scan_ok = train_step_fn is None and hasattr(trainer, "run_scan_chunk")
    if train_step_fn is None:
        train_step_fn = trainer.default_step_fn

    try:
        best_iou, best_state, global_step = _fit_epochs(
            trainer, state, data, logger, ckpt_mgr, latest_mgr, key,
            best_iou, best_state, global_step, start_epoch, max_epochs,
            train_step_fn, log_every, scan_ok)
    finally:
        # async saves must be finalized even if a train step raised, or
        # the best checkpoint of the run is left half-written
        ckpt_mgr.close()
        latest_mgr.close()

    test = run_eval(trainer.eval_step, best_state, data.test_batches())
    logger.log(global_step, {f"test/{k}": v for k, v in test.items()})
    log.info("test: %s", test)

    # reference train.py:73-75 saves best_weights.pt alongside the ckpt
    save_weights(os.path.join(out_dir, "best_weights.msgpack"), best_state)
    return best_state, best_iou, logger


def _restore_for_resume(ckpt_mgr, latest_mgr, out_dir, state, best_iou,
                        best_state, start_epoch):
    """Continue a crashed run from its saved checkpoints.

    The best channel restores the best-val_iou watermark + best_state;
    the latest channel (written every epoch) restores the state actually
    trained furthest.  Also reads the legacy round-1 ``best.msgpack``
    layout.  Returns (state, best_iou, best_state, start_epoch,
    global_step) — global_step is reconstructed from metrics.jsonl so
    resumed logging continues the step axis instead of restarting at 0.
    """
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    meta = None
    try:
        b_state, meta = ckpt_mgr.restore(state)
    except FileNotFoundError:
        if os.path.exists(os.path.join(ckpt_dir, "best.msgpack")):
            from .checkpoint import load_checkpoint
            b_state, meta = load_checkpoint(ckpt_dir, state)
    if meta is not None:
        state = b_state
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_iou = float(meta.get("metrics", {}).get("val_iou", -1.0))
        best_state = jax.device_get(state)

    try:
        l_state, l_meta = latest_mgr.restore(state)
        l_epoch = int(l_meta.get("epoch", -1))
        if l_epoch + 1 > start_epoch:
            state, start_epoch = l_state, l_epoch + 1
    except FileNotFoundError:
        pass
    if meta is None and start_epoch == 0:
        return state, best_iou, best_state, start_epoch, 0

    global_step = _last_logged_step(os.path.join(out_dir, "metrics.jsonl"))
    log.info("resumed %s at epoch %d (best val_iou %.3f, step %d)",
             out_dir, start_epoch, best_iou, global_step)
    return state, best_iou, best_state, start_epoch, global_step


def _last_logged_step(history_path: str) -> int:
    try:
        with open(history_path) as f:
            steps = [json.loads(line).get("step", 0) for line in f if line.strip()]
        return max(steps, default=0)
    except OSError:
        return 0


# Backend error codes worth retrying: the chip is a shared device and
# pressure spikes (RESOURCE_EXHAUSTED) or relay hiccups (UNAVAILABLE,
# DEADLINE_EXCEEDED, ABORTED) are transient — observed killing multi-hour
# studies at otherwise-innocent ops.  Sleep doubles per attempt.
_TRANSIENT_MARKERS = ("RESOURCE_EXHAUSTED", "UNAVAILABLE",
                      "DEADLINE_EXCEEDED", "ABORTED")
_RETRY_SLEEP_S = 30.0
_MAX_EPOCH_RETRIES = 4


def _is_transient_backend_error(e: BaseException) -> bool:
    return any(m in str(e) for m in _TRANSIENT_MARKERS)


# scan-dispatch chunk: steps fused into one device dispatch.  Bounds the
# retry/compile unit; epochs shorter than this are one dispatch total.
_SCAN_CHUNK = 32


def _run_train_epoch(trainer, state, data, logger, key, global_step,
                     epoch, train_step_fn, log_every, scan_state=None):
    """One epoch of train steps + the validation pass (the retry unit)."""
    if scan_state is not None and scan_state["ok"]:
        scan = getattr(data, "train_scan_inputs", lambda e: None)(epoch)
        if scan is not None:
            scan_state["used"] = True
            return _run_train_epoch_scanned(
                trainer, state, scan, data, logger, key, global_step,
                epoch, log_every)
    if scan_state is not None:
        scan_state["used"] = False
    n_steps = 0
    # disk reads/stacking overlap device compute on a reader thread
    for batch in background_batches(lambda e=epoch: data.train_batches(e)):
        key, k_step = jax.random.split(key)
        state, logs = train_step_fn(state, batch, k_step, epoch)
        n_steps += 1
        global_step += 1
        if global_step % log_every == 0:
            logger.log(global_step, {f"train/{k}": v
                                     for k, v in jax.device_get(logs).items()})
    val = run_eval(trainer.eval_step, state, data.val_batches())
    return state, global_step, n_steps, val


def _run_train_epoch_scanned(trainer, state, scan, data, logger, key,
                             global_step, epoch, log_every):
    """Epoch as K-step scan dispatches over the device-resident split.

    Semantics identical to the per-batch path — same batches (the module's
    epoch index matrix), same per-step key chain (train_steps_scan splits
    the carried key exactly like the loop above), same logging values and
    cadence — but one dispatch per _SCAN_CHUNK steps instead of one per
    step, hiding the per-dispatch relay latency that is visible next to
    small-model step times (ROADMAP round-5 item).  ``scan`` is the
    module's (device arrays, index matrix [n_steps, ...]) pair; the
    trainer's run_scan_chunk interprets both (supervised: [K, B] over
    (images, labels); MME: [K, 2, B] over (lab_img, lab_lab, unl_img))."""
    arrays, idx = scan
    n_steps = 0
    for i in range(0, len(idx), _SCAN_CHUNK):
        chunk = idx[i:i + _SCAN_CHUNK]
        state, key, logs = trainer.run_scan_chunk(
            state, arrays, chunk, key, epoch)
        logged_rows = [j for j in range(len(chunk))
                       if (global_step + j + 1) % log_every == 0]
        if logged_rows:
            logs = jax.device_get(logs)
            for j in logged_rows:
                logger.log(global_step + j + 1,
                           {f"train/{k}": v[j] for k, v in logs.items()})
        n_steps += len(chunk)
        global_step += len(chunk)
    val = run_eval(trainer.eval_step, state, data.val_batches())
    return state, global_step, n_steps, val


def _fit_epochs(trainer, state, data, logger, ckpt_mgr, latest_mgr, key,
                best_iou, best_state, global_step, start_epoch, max_epochs,
                train_step_fn, log_every, scan_ok=False):
    # host snapshot: train_step donates its input state, so device aliases
    # are invalidated — and it doubles as the transient-error retry point
    snap = jax.device_get(state)
    # the scan path is an optimization with a bigger compiled graph; if
    # its dispatch fails non-transiently (observed: the remote compile
    # helper dying on the scanned MME graph), fall back to the per-batch
    # path for the rest of the run instead of crashing
    scan_state = {"ok": scan_ok, "used": False}
    for epoch in range(start_epoch, max_epochs):
        t0 = time.time()
        step0 = global_step
        # per-epoch key stream: a resumed run reproduces the exact
        # randomness of an uninterrupted one from start_epoch onward
        k_epoch = jax.random.fold_in(key, epoch)
        for attempt in range(_MAX_EPOCH_RETRIES + 1):
            try:
                state, global_step, n_steps, val = _run_train_epoch(
                    trainer, state, data, logger, k_epoch, step0,
                    epoch, train_step_fn, log_every, scan_state)
                break
            except Exception as e:
                if scan_state["used"] and scan_state["ok"] and \
                        not _is_transient_backend_error(e):
                    log.warning(
                        "scanned-epoch dispatch failed (%.160s); replaying "
                        "epoch %d with the per-batch path",
                        str(e).splitlines()[0] if str(e) else type(e), epoch)
                    scan_state["ok"] = False
                    state, global_step = snap, step0
                    continue
                if attempt >= _MAX_EPOCH_RETRIES or \
                        not _is_transient_backend_error(e):
                    raise
                wait = _RETRY_SLEEP_S * (2 ** attempt)
                log.warning(
                    "transient backend error in epoch %d (%.120s); "
                    "replaying epoch from snapshot in %.0fs (retry %d/%d)",
                    epoch, str(e).splitlines()[0] if str(e) else type(e),
                    wait, attempt + 1, _MAX_EPOCH_RETRIES)
                # HBM-pressure relief: if memory exhaustion repeats, free
                # the device-resident dataset caches before retrying — the
                # run continues on host reads instead of OOM-looping
                if attempt >= 1 and "RESOURCE_EXHAUSTED" in str(e) and \
                        getattr(data, "release_device_cache", None):
                    if data.release_device_cache():
                        log.warning("released device dataset caches to "
                                    "relieve HBM pressure; continuing "
                                    "with host reads")
                time.sleep(wait)
                state, global_step = snap, step0

        logger.log(global_step, {f"val/{k}": v for k, v in val.items()})
        log.info("epoch %d: %d steps in %.1fs, val_iou=%.3f val_acc=%.2f",
                 epoch, n_steps, time.time() - t0, val["iou"], val["acc"])

        snap = jax.device_get(state)
        # async orbax saves overlap the next epoch's compute
        latest_mgr.save(epoch, snap, metrics={"epoch": float(epoch)})
        if val["iou"] > best_iou:
            best_iou, best_state = val["iou"], snap
            ckpt_mgr.save(epoch, best_state,
                          metrics={"val_iou": val["iou"]},
                          hparams={"lr": trainer.lr, "decay": trainer.decay,
                                   "lrRatio": trainer.lr_ratio,
                                   "num_cls": trainer.num_cls})
    return best_iou, best_state, global_step
