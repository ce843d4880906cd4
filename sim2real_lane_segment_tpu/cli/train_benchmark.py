"""Sustained training throughput (images/sec/chip) per architecture.

The BASELINE.json metric set names "train images/sec" alongside serving
fps; the reference never published one (its recipe line is "batch 64,
175 epochs" on a DGX Station — rightLaneNetwork/README.md:139-150,
TrainingBase.py:47-50).  This CLI measures the full augmented train
step — on-device MyTransform augmentation pipeline + forward + backward
+ AdamW update — as a ``lax.scan`` over steps (one dispatch per
measured iteration, same harness rationale as bench.py: the dev relay's
per-dispatch latency would otherwise dominate).

Prints one JSON line per architecture.
"""
from __future__ import annotations

import argparse
import json
import time

from . import common


def measure(arch: str, batch: int, steps: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train.supervised import SupervisedTrainer
    from .test import build_model

    trainer = SupervisedTrainer(num_cls=4, augment=True,
                                model=build_model(arch, 4))
    state = trainer.init_state(jax.random.key(0))

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(
        0, 255, (batch, 120, 160, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(
        0, 4, (batch, 120, 160), dtype=np.uint8))
    lr = jnp.float32(trainer.lr)

    @jax.jit
    def run(state, key):
        def body(st, k):
            st, logs = trainer.train_step(st, images, labels, k, lr)
            return st, logs["tr_loss"]
        st, losses = jax.lax.scan(body, state,
                                  jax.random.split(key, steps))
        return st, losses

    state, losses = run(state, jax.random.key(1))  # warmup/compile
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    for i in range(iters):
        state, losses = run(state, jax.random.key(2 + i))
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    ips = batch * steps * iters / dt
    return {"metric": f"train_images_per_sec_{arch}",
            "value": round(ips, 1), "unit": "images/sec/chip",
            "batch": batch,
            "step_ms": round(dt / (steps * iters) * 1e3, 3),
            "final_loss": round(float(losses[-1]), 4)}


def main(args=None) -> None:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--archs", nargs="+", default=["67", "lite"])
    p.add_argument("-b", "--batch_size", type=int, default=64)
    p.add_argument("--steps", type=int, default=20,
                   help="train steps per dispatch (scan length)")
    p.add_argument("--iters", type=int, default=3,
                   help="measured dispatches")
    args = p.parse_args(args)
    common.setup_runtime()

    for arch in args.archs:
        print(json.dumps(measure(arch, args.batch_size, args.steps,
                                 args.iters)))


if __name__ == "__main__":
    main()
