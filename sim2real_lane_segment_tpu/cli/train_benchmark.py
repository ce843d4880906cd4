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


def measure(arch: str, batch: int, steps: int, iters: int,
            fast_train: bool = False, pallas_train: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train.supervised import SupervisedTrainer
    from .test import build_model

    trainer = SupervisedTrainer(num_cls=4, augment=True,
                                model=build_model(arch, 4),
                                fast_train=fast_train,
                                pallas_train=pallas_train)
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
    name = f"train_images_per_sec_{arch}" + ("_fast" if fast_train else "") \
        + ("_pallas" if pallas_train else "")
    return {"metric": name,
            "value": round(ips, 1), "unit": "images/sec/chip",
            "batch": batch,
            "step_ms": round(dt / (steps * iters) * 1e3, 3),
            "final_loss": round(float(losses[-1]), 4)}


def measure_stages(arch: str, batch: int, steps: int, iters: int) -> dict:
    """Per-stage step-time breakdown of the full train step.

    Each stage runs alone in the same ``lax.scan`` harness as
    :func:`measure`; every stage folds a scalar of its output into the
    scan carry so XLA cannot dead-code-eliminate the work.  Stage times
    do not sum exactly to the full step (fusion across stage boundaries
    is the point of the single-program design) — the breakdown locates
    the dominant cost, it is not an exact decomposition.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops import augment as aug
    from ..train.supervised import SupervisedTrainer
    from .test import build_model

    trainer = SupervisedTrainer(num_cls=4, augment=True,
                                model=build_model(arch, 4))
    state = trainer.init_state(jax.random.key(0))
    cfg = trainer.cfg

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(
        0, 255, (batch, 120, 160, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(
        0, 4, (batch, 120, 160), dtype=np.uint8))

    # fixed post-augment inputs for the model/optimizer stages
    x0, y0 = aug.augment_batch(jax.random.key(3), images, labels, cfg)
    x0, y0 = jax.block_until_ready((x0, y0))

    def fwd_loss(params, bs, k):
        out, mut = trainer.model.apply(
            {"params": params, "batch_stats": bs}, x0, train=True,
            rngs={"dropout": k}, mutable=["batch_stats"])
        from ..train.losses import weighted_cross_entropy
        return weighted_cross_entropy(out, y0, trainer.num_cls)

    grads0 = jax.grad(fwd_loss)(state.params, state.batch_stats,
                                jax.random.key(4))
    grads0 = jax.block_until_ready(grads0)
    lr = jnp.float32(trainer.lr)

    def stage_augment(c, k):
        x, y = aug.augment_batch(k, images, labels, cfg)
        return c + jnp.mean(x) + jnp.sum(y).astype(jnp.float32)

    def stage_hsv(c, k):
        from ..ops.colorspace import shift_hsv
        sh = jax.random.uniform(k, (batch, 3), minval=-1.0, maxval=1.0)
        x = jax.vmap(lambda i, s: shift_hsv(
            i, s[0] * cfg.hue_limit, s[1] * cfg.sat_limit,
            s[2] * cfg.val_limit, cfg.channel_order))(images, sh)
        return c + jnp.mean(x)

    def stage_crop(c, k):
        keys = jax.random.split(k, batch)
        x, y = jax.vmap(lambda kk, i, l: aug._random_sized_crop(
            kk, i.astype(jnp.float32), l, cfg))(keys, images, labels)
        return c + jnp.mean(x) + jnp.sum(y).astype(jnp.float32)

    def stage_oneof(c, k):
        keys = jax.random.split(k, batch)

        def one(kk, img):
            k_which, k_mb, k_noise = jax.random.split(kk, 3)
            k_sig, k_g = jax.random.split(k_noise)
            kern = aug.MOTION_BLUR_BANK[jax.random.randint(
                k_mb, (), 0, aug.MOTION_BLUR_BANK.shape[0])]
            blurred = aug.motion_blur(img, kern)
            sigma = jnp.sqrt(jax.random.uniform(
                k_sig, (), minval=cfg.noise_var_min,
                maxval=cfg.noise_var_max))
            noisy = img + sigma * jax.random.normal(k_g, img.shape)
            return jnp.where(jax.random.bernoulli(k_which, 0.5),
                             blurred, noisy)

        x = jax.vmap(one)(keys, x0)
        return c + jnp.mean(x)

    def stage_forward(c, k):
        return c + fwd_loss(state.params, state.batch_stats, k)

    def stage_fwd_bwd(c, k):
        loss, grads = jax.value_and_grad(fwd_loss)(
            state.params, state.batch_stats, k)
        return c + loss + jnp.mean(jax.tree_util.tree_leaves(grads)[0])

    def stage_optimizer(c, k):
        from ..train import optim
        updates, _ = trainer.tx.update(grads0, state.opt_state, state.params)
        new_params = optim.apply_updates(state.params, updates, lr)
        return c + jnp.mean(jax.tree_util.tree_leaves(new_params)[0])

    def stage_full(c, k):
        st, logs = trainer.train_step(state, images, labels, k, lr)
        return c + logs["tr_loss"]

    stages = {"augment": stage_augment, "aug/hsv": stage_hsv,
              "aug/crop": stage_crop, "aug/oneof": stage_oneof,
              "forward": stage_forward, "fwd+bwd": stage_fwd_bwd,
              "optimizer": stage_optimizer, "full_step": stage_full}

    out = {"metric": f"train_stage_ms_{arch}", "batch": batch,
           "unit": "ms/step"}
    for name, fn in stages.items():
        @jax.jit
        def run(c0, key, fn=fn):
            def body(c, k):
                return fn(c, k), ()
            c, _ = jax.lax.scan(body, c0, jax.random.split(key, steps))
            return c

        c = jax.block_until_ready(run(jnp.float32(0), jax.random.key(1)))
        t0 = time.perf_counter()
        for i in range(iters):
            c = run(jnp.float32(0), jax.random.key(2 + i))
        jax.block_until_ready(c)
        out[name] = round((time.perf_counter() - t0) / (steps * iters) * 1e3,
                          3)
    return out


def main(args=None) -> None:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--archs", nargs="+", default=["67", "lite"])
    p.add_argument("-b", "--batch_size", type=int, default=64)
    p.add_argument("--steps", type=int, default=20,
                   help="train steps per dispatch (scan length)")
    p.add_argument("--iters", type=int, default=3,
                   help="measured dispatches")
    p.add_argument("--stages", action="store_true",
                   help="per-stage breakdown (augment substages, forward, "
                        "fwd+bwd, optimizer) instead of the headline number")
    p.add_argument("--fast_train", action="store_true",
                   help="measure the segment-wise FC-DenseNet train forward "
                        "(models/tiramisu_fast.fast_apply_train)")
    p.add_argument("--pallas_train", action="store_true",
                   help="measure the fused-Pallas custom-VJP train step "
                        "(models/tiramisu_train_pallas.pallas_apply_train)")
    args = p.parse_args(args)
    common.setup_runtime()

    for arch in args.archs:
        if args.stages:
            print(json.dumps(measure_stages(arch, args.batch_size,
                                            args.steps, args.iters)))
        else:
            print(json.dumps(measure(arch, args.batch_size, args.steps,
                                     args.iters, args.fast_train,
                                     args.pallas_train)))


if __name__ == "__main__":
    main()
