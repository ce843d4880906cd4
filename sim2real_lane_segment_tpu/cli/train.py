"""Unified training CLI — the reference ``train.py`` rebuilt TPU-native.

Same interface (reference train.py:78-107): ``--trainType sim|st|mme``,
``--dataPath``, ``--pretrained_path`` (mme), ``--model_name``,
``--reproducible``, data/model argument groups, ``--max_epochs``.

Differences by design: training runs as jitted XLA steps with on-device
augmentation; ``--comet``/``--wandb`` are accepted but map to the local
tensorboard/JSONL logger (those services need network egress); data
parallelism works (sharded deterministic samplers) instead of being
documented-broken.
"""
from __future__ import annotations

import argparse
import logging
import os

from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trainType", choices=["sim", "st", "mme"], required=True,
                   help="Type of training method")
    p.add_argument("--dataPath", type=str, required=True, help="Path of database root")
    p.add_argument("--pretrained_path", type=str,
                   help="MME training uses pretrained weights. Use this to define path to it.")
    p.add_argument("--model_name", type=str, default="baseline",
                   help="Model identifier for logging and checkpoints.")
    p.add_argument("--reproducible", action="store_true",
                   help="Seed everything to 42 for a deterministic run.")
    p.add_argument("--comet", action="store_true",
                   help="Accepted for interface parity; logs locally (no egress).")
    p.add_argument("--wandb", action="store_true",
                   help="Accepted for interface parity; logs locally (no egress).")
    p.add_argument("--max_epochs", type=int, default=175)
    p.add_argument("--default_root_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--arch", choices=["67", "67r", "57", "103", "tiny", "lite", "encdec"], default="67",
                   help="FCDenseNet variant (reference trained 67; "
                        "'tiny' is a fast smoke-test config)")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the run's checkpoint dir if present")
    p.add_argument("--log_every", type=int, default=50,
                   help="Log train scalars every N global steps")
    p.add_argument("--fast_train", action="store_true",
                   help="segment-wise FC-DenseNet train forward (no dense "
                        "concats in fwd/bwd; same BN semantics, own dropout "
                        "key chain — models/tiramisu_fast.py)")
    p.add_argument("--pallas_train", action="store_true",
                   help="fused-Pallas custom-VJP FC-DenseNet train step "
                        "(models/tiramisu_train_pallas.py); falls back to "
                        "the standard apply when the model/resolution "
                        "doesn't fit the single-tile kernels")
    p.add_argument("--profile", action="store_true",
                   help="Capture a JAX profiler trace (xplane) of the first "
                        "epochs under <out_dir>/profile")
    p.add_argument("--dp", default="off",
                   help="data parallelism: 'off' (default), 'auto' (largest "
                        "device count dividing batch_size), or an explicit "
                        "device count.  Builds a jax.sharding.Mesh, shards "
                        "each global batch over the 'data' axis with "
                        "parameters replicated; XLA inserts the gradient "
                        "all-reduce over ICI.  Single-process semantics are "
                        "IDENTICAL to --dp off on the same --batch_size "
                        "(fixes the reference's documented-broken "
                        "distributed training, README.md:275-277).  Under "
                        "jax.distributed (multi-host) --batch_size is "
                        "per-process and each process reads its sampler "
                        "shard.")
    common.add_data_args(p)
    common.add_model_args(p)
    return p


def main(args=None) -> dict:
    common.setup_logging()
    common.setup_runtime()
    args = build_parser().parse_args(args)

    import jax

    from ..data.modules import (SimulatorDataModule, TwoDomainDataModule,
                                TwoDomainMMEDataModule)
    from ..train.loop import fit
    from ..train.mme import MMETrainer
    from ..train.supervised import SupervisedTrainer
    from ..train import checkpoint as ckpt

    seed = 42 if args.reproducible else args.seed
    out_dir = os.path.join(args.default_root_dir or "results", args.model_name)
    if jax.process_count() > 1 and jax.process_index() > 0:
        # state is replicated, so process 0's artifacts are canonical;
        # other ranks log/checkpoint to a scratch subdir to avoid races
        out_dir = os.path.join(out_dir, f"proc{jax.process_index()}")

    # data parallelism: mesh + batch sharding around the unchanged fit loop
    mesh = None
    if args.dp not in (None, "off"):
        from ..parallel.dp import resolve_dp
        from ..parallel.sharding import make_train_mesh
        n_dp = resolve_dp(args.dp, args.batch_size)
        if n_dp > 1 or jax.process_count() > 1:
            mesh = make_train_mesh(None if jax.process_count() > 1 else n_dp)
            logging.info("data parallelism: %d-device mesh (%d processes)",
                         mesh.devices.size, jax.process_count())

    kw = dict(data_path=args.dataPath, batch_size=args.batch_size,
              seed=seed, load_into_memory=args.load2memory,
              device_cache=args.device_cache)
    if jax.process_count() > 1:
        # multi-host: each process reads its deterministic sampler shard
        # (data/samplers.shard); --batch_size is per-process
        kw.update(shard_id=jax.process_index(),
                  num_shards=jax.process_count())
    from .test import build_model
    model = build_model(args.arch, 4)
    tkw = dict(num_cls=4, lr=args.learningRate, decay=args.decay,
               lr_ratio=args.lrRatio, height=args.height, width=args.width,
               gray=args.gray, augment=args.augment, model=model,
               fast_train=args.fast_train,
               pallas_train=args.pallas_train)

    # the trainer's default_step_fn handles each regime's batch structure
    # (and enables the scanned-epoch dispatch under --device_cache)
    train_step_fn = None
    if args.trainType == "sim":
        data = SimulatorDataModule(**kw)
        trainer = SupervisedTrainer(**tkw)
    elif args.trainType == "st":
        data = TwoDomainDataModule(**kw)
        trainer = SupervisedTrainer(**tkw)
    elif args.trainType == "mme":
        if not args.pretrained_path:
            raise SystemExit("--trainType=mme requires --pretrained_path")
        data = TwoDomainMMEDataModule(**kw)
        trainer = MMETrainer(**tkw)
    else:  # pragma: no cover
        raise RuntimeError(f"Not recognizable training type: {args.trainType}")

    if mesh is not None:
        from ..parallel.dp import DataParallelTrainer
        trainer = DataParallelTrainer(trainer, mesh)
        if jax.process_count() == 1:
            # row-shard the device-resident split caches over the mesh so
            # the scanned-epoch dispatch stays data-parallel
            data.cache_sharding = trainer.batch_sharding
        # multi-host: caches stay per-process (each rank caches its own
        # sampler shard on its local devices; shard_batch assembles the
        # global array per step).  The scanned dispatch gates itself off
        # under num_shards > 1 (data/modules._scan_inputs).

    data.setup()
    state = trainer.init_state(jax.random.key(seed))
    if args.trainType == "mme":
        state = ckpt.load_weights(args.pretrained_path, state)
    profiler_ctx = None
    if args.profile:
        profile_dir = os.path.join(out_dir, "profile")
        os.makedirs(profile_dir, exist_ok=True)
        jax.profiler.start_trace(profile_dir)
        profiler_ctx = profile_dir

    try:
        best_state, best_iou, _ = fit(
            trainer, state, data, max_epochs=args.max_epochs, out_dir=out_dir,
            model_name=args.model_name, seed=seed, train_step_fn=train_step_fn,
            log_every=args.log_every, resume=args.resume)
    finally:
        if profiler_ctx:
            jax.profiler.stop_trace()
            logging.info("profiler trace written to %s", profiler_ctx)
    logging.info("best val_iou %.4f; artifacts in %s", best_iou, out_dir)
    return {"best_iou": best_iou, "out_dir": out_dir}


if __name__ == "__main__":
    main()
