"""HPO sweep CLI — the reference ``tune.py`` without Ray.

Same search problem (reference tune.py:57-100): tune the MME module's
``log_lr ~ U(-4,-2)``, ``log_lrRatio ~ U(-3,0)``, ``log_decay ~ U(-8,-1)``
over ``--num_samples`` trials, maximizing ``mean_iou``, with ASHA-style
early stopping (grace period 25 epochs, reduction factor 4) — the
reference paired BayesOptSearch with ASHAScheduler(grace 25).

Ray isn't available (and a TPU chip is not fractionally shareable the way
the reference packed 0.5 GPU/trial), so trials run as a native
successive-halving schedule on this host's devices; multi-host sweeps
shard trials by ``jax.process_index()``.  Per-trial checkpoint/resume
state lives under the trial directory, mirroring
TuneReportCheckpointCallback behavior.  ``--search tpe`` (default) uses
the sequential TPE proposer (train/bayesopt.py) in place of Ray's
BayesOptSearch: first-rung trials are proposed one at a time from the
observations so far; ``--search random`` reproduces plain sampling.

Notes on quirks (QUIRKS.md): the reference hardcoded NUM_CLS=3 here vs
4 everywhere else (tune.py:19) — this CLI defaults to 4 and exposes
``--num_cls``.  And the ``log_lrRatio`` dimension is a NO-OP for MME
(both here and in the reference): MME hardcodes eta_min = lr*1e-3
(train/mme.py lrs_at; reference MMETrainingModule.py:21-22) while the
sweep still samples lrRatio (reference tune.py:65).  The dimension is
kept for search-space parity and documented instead of dropped.
"""
from __future__ import annotations

import argparse
import json
import logging
import math
import os

import numpy as np

from . import common

log = logging.getLogger(__name__)


# the reference's search space (tune.py:63-67)
SEARCH_SPACE = {
    "log_lr": (-4.0, -2.0),
    "log_lrRatio": (-3.0, 0.0),
    "log_decay": (-8.0, -1.0),
}



def make_trainer(*, num_cls: int, augment: bool, arch: str = "67",
                 height: int = 120, width: int = 160):
    """ONE trainer shared by every trial of the sweep.

    All trial-varying hyperparameters (lr, lrRatio, decay) enter the
    jitted step as host values or traced operands, never as trace-time
    constants — so one trainer means one trace + one compile for the
    whole sweep.  Per-trial trainers cost a full retrace each (jit keys
    on instance identity), and a constructor-baked decay costs a full
    COLD COMPILE each (~10 min/trial through the dev tunnel): the
    round-5 session-3 sweep died exactly that death.
    """
    from ..train.mme import MMETrainer
    from .test import build_model

    return MMETrainer(num_cls=num_cls, augment=augment,
                      model=build_model(arch, num_cls),
                      height=height, width=width)


def run_trial(config: dict, data, trainer, *, epochs_from: int,
              epochs_to: int, out_dir: str, seed: int, state=None):
    """(Re)run one MME trial from epoch ``epochs_from`` to ``epochs_to``."""
    import jax
    import jax.numpy as jnp

    from ..train.loop import MetricLogger, run_eval

    # host-side hyperparams for THIS trial: lrs_at reads self.lr on the
    # host (the schedule values enter the step as operands), and decay is
    # passed to the step as a traced scalar below — mutating the shared
    # trainer is safe because the compiled program closes over neither.
    trainer.lr = 10 ** config["log_lr"]
    trainer.lr_ratio = 10 ** config["log_lrRatio"]
    trainer.decay = 10 ** config["log_decay"]
    decay = jnp.float32(trainer.decay)
    if state is None:
        state = trainer.init_state(jax.random.key(seed))

    logger = MetricLogger(out_dir, use_tensorboard=False)
    key = jax.random.key(seed + epochs_from)
    best = -1.0
    for epoch in range(epochs_from, epochs_to):
        for batch in data.train_batches(epoch):
            (x_lab, y), x_unl = batch
            key, k = jax.random.split(key)
            lr_g_fe, lr_g_cls, lr_f = trainer.lrs_at(epoch)
            state, _ = trainer.mme_train_step(state, x_lab, y, x_unl, k,
                                              lr_g_fe, lr_g_cls, lr_f, decay)
        val = run_eval(trainer.eval_step, state, data.val_batches())
        logger.log(epoch, {"loss": val["loss"], "mean_accuracy": val["acc"],
                           "mean_iou": val["iou"]})
        best = max(best, val["iou"])
    return state, best


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataPath", type=str, required=True, help="Path of database root")
    p.add_argument("--reproducible", action="store_true")
    p.add_argument("--num_samples", type=int, default=20)
    p.add_argument("--num_epochs", type=int, default=175)
    p.add_argument("--grace_period", type=int, default=25)
    p.add_argument("--reduction_factor", type=int, default=4)
    p.add_argument("--num_cls", type=int, default=4)
    p.add_argument("--arch", choices=["67", "67r", "57", "103", "tiny", "lite", "encdec"], default="67")
    p.add_argument("--out_dir", type=str, default="tune_minimax_segmenter")
    p.add_argument("--search", choices=["tpe", "random"], default="tpe",
                   help="first-rung config proposer (reference used "
                        "BayesOptSearch; tpe is the native equivalent)")
    p.add_argument("--eval_default", action="store_true",
                   help="also run the hand-tuned default config (trainer "
                        "defaults lr=1e-3, decay=1e-4) un-pruned to "
                        "num_epochs and record it in best.json as the "
                        "baseline the sweep is judged against")
    common.add_data_args(p)
    common.add_model_args(p)
    args = p.parse_args(args)
    common.setup_runtime()

    from ..data.modules import TwoDomainMMEDataModule

    seed = 42 if args.reproducible else 0

    data = TwoDomainMMEDataModule(data_path=args.dataPath,
                                  batch_size=args.batch_size, seed=seed)
    data.setup()

    import jax

    from ..train.bayesopt import make_proposer
    # fold the process index into the proposer seed: multi-host sweeps
    # shard trials, and identically-seeded proposers would otherwise make
    # every host draw the same config sequence
    proposer = make_proposer(args.search, SEARCH_SPACE,
                             seed=seed + 7919 * jax.process_index())

    # configs are proposed lazily at the first rung so TPE can condition
    # on every earlier trial's result (sequential model-based search)
    trials = [{"id": i, "config": None, "state": None,
               "epoch": 0, "best_iou": -1.0, "alive": True}
              for i in range(args.num_samples)]

    # multi-host sweeps: shard trials round-robin by process index (each
    # host runs its own ASHA over its shard; results merge via best.json)
    import jax
    pidx, pcount = jax.process_index(), jax.process_count()
    if pcount > 1:
        trials = [t for t in trials if t["id"] % pcount == pidx]
        args.out_dir = os.path.join(args.out_dir, f"host_{pidx}")
        log.info("process %d/%d runs %d trials", pidx, pcount, len(trials))

    # successive halving rungs: grace, grace*rf, ... capped at num_epochs
    rungs = []
    e = args.grace_period
    while e < args.num_epochs:
        rungs.append(e)
        e *= args.reduction_factor
    rungs.append(args.num_epochs)

    trainer = make_trainer(num_cls=args.num_cls, augment=True,
                           arch=args.arch, height=args.height,
                           width=args.width)

    os.makedirs(args.out_dir, exist_ok=True)

    def _dump_trials():
        # written after EVERY trial (not just at the end) so a partial
        # sweep killed by the wall clock still leaves a usable table —
        # the round-5 session-3 sweep died uncommitted for lack of this
        with open(os.path.join(args.out_dir, "trials.json"), "w") as f:
            json.dump([{"id": t["id"], "config": t["config"],
                        "epochs": t["epoch"], "best_iou": t["best_iou"],
                        "pruned": not t["alive"]} for t in trials
                       if t["config"] is not None], f, indent=2)

    prev_rung = 0
    for rung in rungs:
        alive = [t for t in trials if t["alive"]]
        log.info("rung %d -> %d epochs: %d trials", prev_rung, rung, len(alive))
        for t in alive:
            if t["config"] is None:
                t["config"] = proposer.propose()
            tdir = os.path.join(args.out_dir, f"trial_{t['id']:03d}")
            t["state"], best = run_trial(
                t["config"], data, trainer,
                epochs_from=t["epoch"], epochs_to=rung, out_dir=tdir,
                seed=seed + t["id"], state=t["state"])
            if t["epoch"] == 0:
                proposer.observe(t["config"], best)
            t["epoch"] = rung
            t["best_iou"] = max(t["best_iou"], best)
            log.info("trial %d @%d epochs: best mean_iou %.3f",
                     t["id"], rung, t["best_iou"])
            _dump_trials()
        if rung < args.num_epochs:
            alive.sort(key=lambda t: -t["best_iou"])
            keep = max(1, math.ceil(len(alive) / args.reduction_factor))
            for t in alive[keep:]:
                t["alive"] = False
                t["state"] = None
        prev_rung = rung

    best = max(trials, key=lambda t: t["best_iou"])
    result = {"best_config": best["config"], "best_iou": best["best_iou"],
              "trial": best["id"]}

    if args.eval_default:
        # the hand-tuned default every study/CLI ships with
        # (train/supervised.py:42-43: lr=1e-3, decay=1e-4; lrRatio is a
        # no-op for MME — QUIRKS) run to the full budget with no pruning
        default_cfg = {"log_lr": -3.0, "log_lrRatio": 0.0, "log_decay": -4.0}
        _, d_best = run_trial(
            default_cfg, data, trainer, epochs_from=0,
            epochs_to=args.num_epochs,
            out_dir=os.path.join(args.out_dir, "trial_default"),
            seed=seed)
        result["default_config"] = default_cfg
        result["default_iou"] = d_best
        log.info("default config @%d epochs: best mean_iou %.3f",
                 args.num_epochs, d_best)

    with open(os.path.join(args.out_dir, "best.json"), "w") as f:
        json.dump(result, f, indent=2)
    # full per-trial table (config, rung reached, best mean_iou) — the
    # committed sweep artifact the reference's Ray analysis.csv carried
    _dump_trials()
    print("Best hyperparameters found were: ", best["config"])
    return result


if __name__ == "__main__":
    main()
